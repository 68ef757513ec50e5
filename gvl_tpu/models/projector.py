"""Modality projectors: encoder embedding spaces → LLM hidden space.

One 2-layer MLP per modality (``Linear(enc→llm) → GELU → Linear(llm→llm)``)
bridging SigLIP (1152), VideoMAE (768), legacy video (1408) and audio
(1024) embeddings into the 4096-dim reasoning-core space, matching the
reference architecture (`qwen_reasoning_core.py:995-1122`) and its ``.pt``
checkpoint layout (dict of per-modality state dicts) for artifact
interchange.

TPU specifics: projections run as one jitted program per (modality,
bucket); inputs are padded to fixed bucket sizes so variable region counts
never trigger recompilation.
"""

from __future__ import annotations

import logging
from functools import partial
from pathlib import Path
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.agent.config import ReasoningCoreConfig

logger = logging.getLogger(__name__)

# modality name -> config attribute holding the encoder dim
MODALITY_DIMS = {
    "siglip": "siglip_dim",
    "videomae": "videomae_dim",
    "video": "internvideo_dim",   # legacy InternVideo path
    "audio": "audiomae_dim",
}


class MultiModalProjector(nn.Module):
    """Linear → GELU → Linear projection into the LLM hidden space."""

    llm_dim: int = 4096
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(self.llm_dim, dtype=self.dtype, name="fc_in")(x)
        # exact (erf) GELU to match torch.nn.GELU in the reference layout
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.llm_dim, dtype=self.dtype, name="fc_out")(h)


def _bucket(n: int, buckets: tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    # beyond the largest bucket: round up to its multiple
    top = buckets[-1]
    return ((n + top - 1) // top) * top


class ProjectorBank:
    """Per-modality projectors with bucketed, jitted application.

    >>> bank = ProjectorBank(ReasoningCoreConfig())
    >>> bank.init(jax.random.PRNGKey(0))
    >>> tokens = bank.project_region(np.random.randn(5, 1152))  # (5, 4096)
    """

    def __init__(
        self,
        config: Optional[ReasoningCoreConfig] = None,
        batch_buckets: tuple[int, ...] = (1, 4, 16, 64, 256),
    ):
        self.config = config or ReasoningCoreConfig()
        self.batch_buckets = batch_buckets
        self.module = MultiModalProjector(llm_dim=self.config.llm_hidden_dim)
        self.params: dict[str, dict] = {}
        self._initialized = False
        self._apply = jax.jit(self.module.apply)

    # ---------------------------------------------------------------- init

    def init(self, rng: Optional[jax.Array] = None) -> "ProjectorBank":
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        for name in MODALITY_DIMS:
            self.params[name] = self._init_head(name, rng)
        self._initialized = True
        return self

    def _init_head(self, name: str, rng: Optional[jax.Array] = None) -> dict:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        dim = int(getattr(self.config, MODALITY_DIMS[name]))
        i = list(MODALITY_DIMS).index(name)
        # jit the init: avoids eager per-op dispatch
        return jax.jit(self.module.init)(
            jax.random.fold_in(rng, i), jnp.zeros((1, dim)))["params"]

    # ------------------------------------------------------------- project

    def project(self, modality: str, embeddings) -> jax.Array:
        """Project [N, enc_dim] (or [enc_dim]) to [N, llm_dim], bucket-padded."""
        if modality not in self.params:
            raise KeyError(
                f"unknown modality {modality!r}; bank has {list(self.params)}"
            )
        x = jnp.asarray(embeddings, dtype=jnp.float32)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None]
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        n = x2.shape[0]
        padded = _bucket(n, self.batch_buckets)
        if padded != n:
            x2 = jnp.pad(x2, ((0, padded - n), (0, 0)))
        out = self._apply({"params": self.params[modality]}, x2)[:n]
        out = out.reshape(*lead, out.shape[-1])
        return out[0] if squeeze else out

    def project_region(self, embeddings) -> jax.Array:
        return self.project("siglip", embeddings)

    def project_videomae(self, embeddings) -> jax.Array:
        return self.project("videomae", embeddings)

    def project_video(self, embeddings) -> jax.Array:
        return self.project("video", embeddings)

    def project_audio(self, embeddings) -> jax.Array:
        return self.project("audio", embeddings)

    # ------------------------------------------------------------- weights

    def load_weights(self, path: str | Path) -> None:
        """Load either a native ``.npz`` or a reference-layout ``.pt``.

        Heads whose input dimension doesn't match the configured modality
        dim (e.g. a 1152-dim siglip head loaded while a trained
        mini-SigLIP tower emits its own width) are skipped with a warning
        — the freshly initialized head stays, instead of a shape error at
        the first projection."""
        path = Path(path)
        if path.suffix == ".npz":
            self._load_npz(path)
        else:
            self._load_torch(path)
        for name, dim_attr in MODALITY_DIMS.items():
            loaded = self.params.get(name)
            if loaded is None:
                continue
            want = int(getattr(self.config, dim_attr))
            got = int(loaded["fc_in"]["kernel"].shape[0])
            if got != want:
                logger.warning(
                    "projector head '%s' in %s has input dim %d but the "
                    "configured modality dim is %d — keeping the "
                    "initialized head", name, path, got, want)
                self.params[name] = self._init_head(name)
        self._initialized = True
        logger.info("loaded projector weights from %s", path)

    def save_weights(self, path: str | Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        if path.suffix == ".npz":
            self._save_npz(path)
        else:
            self._save_torch(path)
        logger.info("saved projector weights to %s", path)

    # -- native npz: flat "{modality}/{layer}/{param}" keys
    def _save_npz(self, path: Path) -> None:
        flat = {}
        for name, params in self.params.items():
            for layer in ("fc_in", "fc_out"):
                for p in ("kernel", "bias"):
                    flat[f"{name}/{layer}/{p}"] = np.asarray(params[layer][p])
        np.savez(path, **flat)

    def _load_npz(self, path: Path) -> None:
        data = np.load(path)
        for name in MODALITY_DIMS:
            prefix = f"{name}/"
            if f"{prefix}fc_in/kernel" not in data:
                continue
            self.params[name] = {
                layer: {
                    "kernel": jnp.asarray(data[f"{prefix}{layer}/kernel"]),
                    "bias": jnp.asarray(data[f"{prefix}{layer}/bias"]),
                }
                for layer in ("fc_in", "fc_out")
            }

    # -- reference-compatible torch layout:
    #    {"siglip": {"net.0.weight": [llm, enc], "net.0.bias": [llm],
    #                "net.2.weight": [llm, llm], "net.2.bias": [llm]}, ...}
    def _load_torch(self, path: Path) -> None:
        from gvl_tpu.utils.torch_io import safe_torch_load

        blob = safe_torch_load(path)
        for name in MODALITY_DIMS:
            sd = blob.get(name)
            if sd is None:
                continue
            self.params[name] = {
                "fc_in": {
                    "kernel": jnp.asarray(sd["net.0.weight"].float().numpy().T),
                    "bias": jnp.asarray(sd["net.0.bias"].float().numpy()),
                },
                "fc_out": {
                    "kernel": jnp.asarray(sd["net.2.weight"].float().numpy().T),
                    "bias": jnp.asarray(sd["net.2.bias"].float().numpy()),
                },
            }

    def _save_torch(self, path: Path) -> None:
        import torch

        # fp16 on disk (the reference ships ~120 MB adapters; f32 would
        # be 344 MB here) — loads cast back to f32/bf16 as needed
        blob = {}
        for name, params in self.params.items():
            blob[name] = {
                "net.0.weight": torch.from_numpy(
                    np.asarray(params["fc_in"]["kernel"]).T.copy()
                ).half(),
                "net.0.bias": torch.from_numpy(
                    np.asarray(params["fc_in"]["bias"]).copy()
                ).half(),
                "net.2.weight": torch.from_numpy(
                    np.asarray(params["fc_out"]["kernel"]).T.copy()
                ).half(),
                "net.2.bias": torch.from_numpy(
                    np.asarray(params["fc_out"]["bias"]).copy()
                ).half(),
            }
        torch.save(blob, path)


def create_projector_bank(
    config: Optional[ReasoningCoreConfig] = None,
    weights_path: Optional[str] = None,
    rng: Optional[jax.Array] = None,
) -> ProjectorBank:
    """Factory: fresh-initialized bank, optionally loading trained weights."""
    bank = ProjectorBank(config).init(rng)
    if weights_path and Path(weights_path).exists():
        bank.load_weights(weights_path)
    return bank
