"""Audio stack: decode, mel frontend, ASR, non-speech event detection."""

from gvl_tpu.audio.processor import (
    AudioAnalysisResult,
    AudioConfig,
    AudioEvent,
    AudioEventParser,
    AudioEventType,
    AudioPreprocessor,
    AudioProcessor,
    DeterministicFakeASR,
    HashAudioEmbedder,
    TranscriptionSegment,
    Wav2Vec2JaxEmbedder,
    build_audio_stack,
    create_audio_processor,
)
from gvl_tpu.audio.event_model import (
    AudioEventNet,
    EventModelConfig,
    JaxAudioEventDetector,
    evaluate_event_model,
    train_event_model,
)
from gvl_tpu.audio.mel import log_mel_spectrogram, mel_filterbank

__all__ = [
    "AudioEventNet",
    "EventModelConfig",
    "JaxAudioEventDetector",
    "train_event_model",
    "evaluate_event_model",
    "AudioEventType",
    "TranscriptionSegment",
    "AudioEvent",
    "AudioAnalysisResult",
    "AudioConfig",
    "AudioPreprocessor",
    "AudioEventParser",
    "AudioProcessor",
    "DeterministicFakeASR",
    "HashAudioEmbedder",
    "Wav2Vec2JaxEmbedder",
    "build_audio_stack",
    "create_audio_processor",
    "mel_filterbank",
    "log_mel_spectrogram",
]
