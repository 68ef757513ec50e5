"""Trained audio event classifier: synthesis, training, detector wiring.

Reference parity surface: model-driven event detection
(`/root/reference/src/audio/qwen_audio_processor.py:474-548`) — here a
trained JAX classifier over log-mel windows instead of a prompted audio
LLM, with the spectral heuristic as the no-checkpoint fallback rung.
"""

import numpy as np
import pytest

from gvl_tpu.audio.event_model import (
    EVENT_CLASSES,
    AudioEventNet,
    EventModelConfig,
    JaxAudioEventDetector,
    evaluate_event_model,
    load_event_params,
    make_event_batch,
    save_event_params,
    synth_event,
    train_event_model,
)
from gvl_tpu.audio.processor import (
    AudioEventType,
    AudioProcessor,
    create_audio_processor,
)

CFG = EventModelConfig()


@pytest.fixture(scope="module")
def trained():
    # micro budget: enough to separate the acoustically distinct classes
    return train_event_model(CFG, steps=250, batch_size=32, pool_size=600,
                             seed=0)


class TestSynthesis:
    def test_every_class_synthesizes(self):
        rng = np.random.default_rng(0)
        for cls in EVENT_CLASSES:
            wav = synth_event(rng, cls, CFG)
            assert wav.shape == (CFG.window_samples,)
            assert wav.dtype == np.float32
            assert np.isfinite(wav).all()

    def test_silence_is_quiet_impact_is_loud(self):
        rng = np.random.default_rng(1)
        sil = np.sqrt((synth_event(rng, "silence", CFG) ** 2).mean())
        imp = np.sqrt((synth_event(rng, "impact", CFG) ** 2).mean())
        assert sil < 1e-3 < imp

    def test_batch_balanced_labels(self):
        rng = np.random.default_rng(2)
        _, labels = make_event_batch(rng, CFG, 120)
        counts = np.bincount(labels, minlength=len(EVENT_CLASSES))
        assert (counts > 0).all()


class TestModel:
    def test_forward_shape(self):
        import jax
        import jax.numpy as jnp

        model = AudioEventNet(CFG)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((2, CFG.n_frames, CFG.n_mels)),
                            jnp.zeros((2,)))
        out = model.apply(params, jnp.zeros((2, CFG.n_frames, CFG.n_mels)),
                          jnp.zeros((2,)))
        assert out.shape == (2, CFG.n_classes)

    def test_micro_training_beats_chance(self, trained):
        metrics = evaluate_event_model(trained, CFG, n_samples=180)
        # 6 classes → chance ≈ 0.17; the classes are acoustically far
        # apart, so even a micro budget should separate most
        assert metrics["accuracy"] > 0.6

    def test_save_load_roundtrip(self, trained, tmp_path):
        import jax

        path = tmp_path / "ev.npz"
        save_event_params(trained, path)
        loaded = load_event_params(path)
        a, b = jax.tree.leaves(trained), jax.tree.leaves(loaded)
        assert all(np.allclose(x, y) for x, y in zip(a, b))


class TestDetectorWiring:
    def test_detector_classifies_windows(self, trained):
        det = JaxAudioEventDetector(trained, CFG)
        rng = np.random.default_rng(3)
        clip = np.concatenate([synth_event(rng, "music", CFG),
                               synth_event(rng, "impact", CFG)])
        labels = det(clip, CFG.sample_rate)
        assert len(labels) == 2
        assert all(cls in EVENT_CLASSES for cls, _ in labels)
        assert all(0.0 <= conf <= 1.0 for _, conf in labels)

    def test_processor_uses_model_backend(self, trained):
        proc = AudioProcessor(
            event_backend=JaxAudioEventDetector(trained, CFG))
        rng = np.random.default_rng(4)
        clip = np.concatenate([synth_event(rng, "impact", CFG)] * 2
                              + [synth_event(rng, "silence", CFG)])
        events = proc.detect_audio_events(clip, CFG.sample_rate)
        # adjacent same-type windows merge into one span; silence emits
        # nothing
        assert all(ev.end_time <= 3.0 for ev in events)
        assert all(ev.event_type is not AudioEventType.SILENCE
                   for ev in events)

    def test_resample_path(self, trained):
        det = JaxAudioEventDetector(trained, CFG)
        rng = np.random.default_rng(5)
        wav = synth_event(rng, "music", CFG)
        # pretend it is 8 kHz audio of 2 s
        labels = det(wav, 8000)
        assert len(labels) == 2

    def test_factory_ladder(self, trained, tmp_path):
        path = tmp_path / "events.npz"
        save_event_params(trained, path)
        proc = create_audio_processor(event_checkpoint=str(path))
        assert isinstance(proc.event_backend, JaxAudioEventDetector)
        none = create_audio_processor(
            event_checkpoint=str(tmp_path / "missing.npz"))
        assert none.event_backend is None

    def test_heuristic_fallback_still_works(self):
        proc = AudioProcessor()  # no backend
        rng = np.random.default_rng(6)
        loud = np.zeros(3 * 16000, np.float32)
        loud[16000:17600] = rng.normal(0, 0.5, 1600)
        events = proc.detect_audio_events(loud, 16000)
        assert any(ev.event_type is AudioEventType.EFFECT for ev in events)
