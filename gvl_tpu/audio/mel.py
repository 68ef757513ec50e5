"""Log-mel spectrogram frontend in JAX (Whisper-compatible).

Replaces librosa/ffmpeg mel extraction
(`/root/reference/src/audio/qwen_audio_processor.py:266-285`): the
filterbank is built once on host (slaney scale + norm, librosa-compatible,
which is what Whisper's reference filters use), and framing + rFFT + mel
projection + Whisper log-normalization run as one XLA program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
N_MELS = 80


def _hz_to_mel(f: np.ndarray | float) -> np.ndarray:
    """Slaney mel scale (linear below 1 kHz, log above)."""
    f = np.asarray(f, dtype=np.float64)
    mel = f / (200.0 / 3)
    log_region = f >= 1000.0
    mel = np.where(
        log_region,
        15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / (np.log(6.4) / 27.0),
        mel,
    )
    return mel


def _mel_to_hz(mel: np.ndarray) -> np.ndarray:
    mel = np.asarray(mel, dtype=np.float64)
    f = mel * (200.0 / 3)
    log_region = mel >= 15.0
    f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (mel - 15.0)), f)
    return f


def mel_filterbank(
    sample_rate: int = SAMPLE_RATE,
    n_fft: int = N_FFT,
    n_mels: int = N_MELS,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """[n_mels, n_fft//2 + 1] slaney-normalized triangular filters."""
    fmax = fmax if fmax is not None else sample_rate / 2
    fft_freqs = np.linspace(0, sample_rate / 2, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    # slaney norm: each filter integrates to ~constant energy
    enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@partial(jax.jit, static_argnames=("n_fft", "hop"))
def _stft_power(wav: jax.Array, window: jax.Array, n_fft: int, hop: int):
    """Centered STFT power spectrum [frames, n_fft//2+1] (reflect pad)."""
    pad = n_fft // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[-1] - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = x[:, idx] * window[None, None, :]
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.abs(spec) ** 2


def log_mel_spectrogram(
    wav: np.ndarray | jax.Array,
    sample_rate: int = SAMPLE_RATE,
    n_mels: int = N_MELS,
    filters: np.ndarray | None = None,
) -> jax.Array:
    """Whisper-style log-mel: [B, frames, n_mels] (or [frames, n_mels]).

    Matches openai/whisper's normalization: log10, clamp to (max - 8),
    then (x + 4) / 4.  The final frame is dropped, as Whisper does.
    """
    wav = jnp.asarray(wav, jnp.float32)
    squeeze = wav.ndim == 1
    if squeeze:
        wav = wav[None]
    window = jnp.hanning(N_FFT + 1)[:-1].astype(jnp.float32)
    power = _stft_power(wav, window, N_FFT, HOP_LENGTH)[:, :-1]
    mel_mat = jnp.asarray(
        filters if filters is not None else mel_filterbank(sample_rate, N_FFT, n_mels)
    )
    mel = power @ mel_mat.T
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(
        log_spec, log_spec.max(axis=(1, 2), keepdims=True) - 8.0
    )
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec[0] if squeeze else log_spec


def log_mel_numpy(
    wav: np.ndarray,
    sample_rate: int = SAMPLE_RATE,
    n_mels: int = N_MELS,
    filters: np.ndarray | None = None,
) -> np.ndarray:
    """Host-side (numpy) twin of :func:`log_mel_spectrogram`.

    Used by training data producers on tunnel-attached hosts, where
    shipping fp16 mel (rather than f32 waveforms) cuts the per-step
    host→device payload 4× — the upload link, not compute, bounds the
    ASR train step.  Parity with the JAX path is tested.
    """
    wav = np.asarray(wav, np.float32)
    squeeze = wav.ndim == 1
    if squeeze:
        wav = wav[None]
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    pad = N_FFT // 2
    x = np.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[-1] - N_FFT) // HOP_LENGTH
    idx = (np.arange(n_frames)[:, None] * HOP_LENGTH
           + np.arange(N_FFT)[None, :])
    frames = x[:, idx] * window[None, None, :]
    power = np.abs(np.fft.rfft(frames, n=N_FFT, axis=-1)) ** 2
    power = power[:, :-1]
    mel_mat = (filters if filters is not None
               else mel_filterbank(sample_rate, N_FFT, n_mels))
    mel = power @ mel_mat.T
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(
        log_spec, log_spec.max(axis=(1, 2), keepdims=True) - 8.0)
    log_spec = ((log_spec + 4.0) / 4.0).astype(np.float32)
    return log_spec[0] if squeeze else log_spec
