"""ProjectorBank: shapes, bucketing, torch/.npz weight interchange."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvl_tpu.agent.config import ReasoningCoreConfig
from gvl_tpu.models.projector import (
    MODALITY_DIMS,
    ProjectorBank,
    create_projector_bank,
)


@pytest.fixture(scope="module")
def bank():
    return ProjectorBank(ReasoningCoreConfig()).init(jax.random.PRNGKey(0))


class TestProjection:
    def test_all_modalities_project_to_llm_dim(self, bank):
        cfg = bank.config
        for name, dim_attr in MODALITY_DIMS.items():
            dim = getattr(cfg, dim_attr)
            out = bank.project(name, np.random.randn(5, dim).astype(np.float32))
            assert out.shape == (5, 4096)

    def test_single_vector_and_3d(self, bank):
        out = bank.project("siglip", np.random.randn(1152).astype(np.float32))
        assert out.shape == (4096,)
        out = bank.project(
            "videomae", np.random.randn(2, 3, 768).astype(np.float32))
        assert out.shape == (2, 3, 4096)

    def test_bucketing_pads_not_changes_result(self, bank):
        x = np.random.randn(5, 1152).astype(np.float32)
        full = bank.project("siglip", x)
        row = bank.project("siglip", x[2])
        np.testing.assert_allclose(np.asarray(full[2]), np.asarray(row),
                                   atol=1e-5)

    def test_unknown_modality_raises(self, bank):
        with pytest.raises(KeyError):
            bank.project("telepathy", np.zeros((1, 8)))

    def test_named_helpers(self, bank):
        assert bank.project_region(np.zeros((2, 1152), np.float32)).shape == (2, 4096)
        assert bank.project_audio(np.zeros((2, 1024), np.float32)).shape == (2, 4096)
        assert bank.project_video(np.zeros((2, 1408), np.float32)).shape == (2, 4096)
        assert bank.project_videomae(np.zeros((2, 768), np.float32)).shape == (2, 4096)


class TestWeightInterchange:
    def test_npz_roundtrip(self, bank, tmp_path):
        x = np.random.randn(3, 1152).astype(np.float32)
        before = np.asarray(bank.project("siglip", x))
        bank.save_weights(tmp_path / "proj.npz")
        other = ProjectorBank(ReasoningCoreConfig()).init(jax.random.PRNGKey(7))
        other.load_weights(tmp_path / "proj.npz")
        np.testing.assert_allclose(
            np.asarray(other.project("siglip", x)), before, atol=1e-6)

    def test_torch_pt_roundtrip(self, bank, tmp_path):
        x = np.random.randn(3, 768).astype(np.float32)
        before = np.asarray(bank.project("videomae", x))
        bank.save_weights(tmp_path / "projector_weights.pt")
        other = ProjectorBank(ReasoningCoreConfig()).init(jax.random.PRNGKey(9))
        other.load_weights(tmp_path / "projector_weights.pt")
        # .pt stores fp16 (reference-sized artifacts), so the roundtrip
        # carries half-precision quantization
        np.testing.assert_allclose(
            np.asarray(other.project("videomae", x)), before,
            rtol=5e-3, atol=2e-2)

    def test_pt_matches_reference_torch_module(self, bank, tmp_path):
        """The saved .pt must run through an actual torch Sequential
        (the reference architecture) and agree with the JAX forward."""
        import torch

        bank.save_weights(tmp_path / "w.pt")
        blob = torch.load(tmp_path / "w.pt", weights_only=False)
        net = torch.nn.Sequential(
            torch.nn.Linear(1152, 4096),
            torch.nn.GELU(),
            torch.nn.Linear(4096, 4096),
        )
        net.load_state_dict(
            {k.replace("net.", ""): v for k, v in blob["siglip"].items()})
        x = np.random.randn(2, 1152).astype(np.float32)
        with torch.no_grad():
            torch_out = net(torch.from_numpy(x)).numpy()
        jax_out = np.asarray(bank.project("siglip", x))
        np.testing.assert_allclose(jax_out, torch_out, atol=2e-3, rtol=2e-3)

    def test_factory_with_missing_weights(self, tmp_path):
        bank = create_projector_bank(weights_path=str(tmp_path / "nope.pt"))
        assert bank._initialized

    def test_load_weights_skips_mismatched_heads(self, tmp_path):
        """A checkpoint trained at a different modality width must not
        poison the bank — the mismatched head keeps its fresh init and
        projection still runs (e.g. 1152-dim siglip weights loaded while
        a trained mini-SigLIP tower emits its own width)."""
        from gvl_tpu.agent.config import ReasoningCoreConfig
        from gvl_tpu.models.projector import ProjectorBank

        bank = ProjectorBank(ReasoningCoreConfig()).init()
        bank.save_weights(tmp_path / "w.npz")

        cfg = ReasoningCoreConfig(siglip_dim=64)
        bank2 = ProjectorBank(cfg).init()
        bank2.load_weights(tmp_path / "w.npz")
        out = bank2.project("siglip", np.zeros((2, 64), np.float32))
        assert out.shape == (2, cfg.llm_hidden_dim)
        # matched heads WERE loaded (videomae dims agree across configs)
        ref = ProjectorBank(ReasoningCoreConfig())
        ref.params = {"videomae": bank.params["videomae"]}
        a = np.asarray(bank2.params["videomae"]["fc_in"]["kernel"])
        b = np.asarray(bank.params["videomae"]["fc_in"]["kernel"])
        np.testing.assert_allclose(a, b)
