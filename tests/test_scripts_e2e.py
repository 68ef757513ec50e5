"""End-to-end script drives (subprocess, CPU backend, synthetic video)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def run_script(args, cwd, timeout=600):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS_FORCE"] = "cpu"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import runpy, sys; sys.argv = %r;"
        "runpy.run_path(%r, run_name='__main__')"
        % (["x"] + args[1:], str(REPO / args[0]))
    )
    return subprocess.run(
        [sys.executable, "-c", code], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("scripts_e2e")


class TestScriptsEndToEnd:
    def test_smoke_test(self, workdir):
        result = run_script(["scripts/smoke_test.py"], workdir)
        assert "SMOKE TEST: PASS" in result.stdout, result.stdout + result.stderr

    def test_realtime_one_shot(self, workdir):
        result = run_script([
            "scripts/realtime_inference.py",
            "--video", "synthetic://e2e?duration=10&fps=2",
            "--preset", "light", "--query", "what happened at 0:03?",
        ], workdir)
        assert "**Answer:**" in result.stdout, result.stdout + result.stderr
        assert "TIMING BREAKDOWN" in result.stdout

    def test_extract_then_train_then_demo(self, workdir):
        result = run_script([
            "scripts/extract_features.py",
            "--video", "synthetic://e2e_train?duration=12&fps=2",
            "--output-dir", "features", "--preset", "light",
        ], workdir)
        assert result.returncode == 0, result.stderr
        feats = workdir / "features"
        assert (feats / "synthetic_e2e_train_embeddings.npz").exists()
        assert (feats / "synthetic_e2e_train_features.json").exists()
        context = (feats / "synthetic_e2e_train_context.txt").read_text()
        assert "## Timeline" in context

        # golden embeddings schema (COMPAT.md "Numerics": compatibility
        # is schema + tolerance; this pins the schema)
        import numpy as np

        with np.load(feats / "synthetic_e2e_train_embeddings.npz") as z:
            assert set(z.files) == {
                "siglip_ts", "siglip", "videomae_ts", "videomae",
                "wav2vec2_ts", "wav2vec2", "hico"}
            # 384 = shipped trained mini-SigLIP (the preset ladder's
            # auto-resolved rung); 1152 = so400m HF tower / hash fake
            assert z["siglip"].shape[1:] in ((384,), (1152,))
            # 256 = shipped trained clip tower; 768 = hash fake / HF base
            assert z["videomae"].shape[1:] in ((256,), (768,))
            # 128 = trained event-feature rung; 1024 = hash fake / HF
            assert z["wav2vec2"].shape[1:] in ((128,), (1024,))
            assert z["hico"].shape[1:] == (1408,)
            assert z["siglip_ts"].shape[0] == z["siglip"].shape[0]

        # reference-layout .pt written by default (torch importable here)
        # and loadable with weights_only=True, matching the npz bitwise
        import torch

        blob = torch.load(feats / "synthetic_e2e_train_embeddings.pt",
                          weights_only=True)
        with np.load(feats / "synthetic_e2e_train_embeddings.npz") as z:
            assert set(blob) == set(z.files)
            for k in blob:
                np.testing.assert_array_equal(blob[k].numpy(), z[k])

        result = run_script([
            "scripts/train_projectors.py", "--features-dir", "features",
            "--output", "outputs/proj.pt", "--epochs", "1",
            "--batch-size", "4",
        ], workdir)
        assert "done: best_loss" in result.stdout, result.stdout + result.stderr

        result = run_script([
            "scripts/demo_projector_inference.py",
            "--embeddings", "features/synthetic_e2e_train_embeddings.npz",
            "--projector-weights", "outputs/proj.pt",
        ], workdir)
        assert "**Answer:**" in result.stdout, result.stdout + result.stderr

    def test_finetune_lora_dry_run(self, workdir):
        data = [{"messages": [
            {"role": "user", "content": "q"},
            {"role": "assistant", "content": "a"},
        ]}]
        (workdir / "lora.json").write_text(json.dumps(data))
        result = run_script([
            "scripts/finetune_lora.py", "--data", "lora.json", "--dry-run",
        ], workdir)
        assert '"num_valid": 1' in result.stdout, result.stdout + result.stderr

    def test_phase1_synthetic(self, workdir):
        result = run_script([
            "benchmarks/run_phase1.py", "--synthetic", "--max-samples", "2",
            "--benchmark", "glitchbench", "--configs", "gvp_light",
        ], workdir)
        assert result.returncode == 0, result.stderr
        aggregates = json.loads(
            (workdir / "results/phase1/aggregates.json").read_text())
        assert aggregates[0]["num_samples"] == 2

    def test_pipelined_matches_sequential(self, workdir):
        """--pipelined must produce the same timeline as the default path."""
        import json as json_mod

        out = {}
        for mode, flags in (("seq", []), ("pipe", ["--pipelined"])):
            result = run_script([
                "scripts/realtime_inference.py",
                "--video", "synthetic://pipe_eq?duration=12&fps=2",
                "--preset", "standard", "--no-cache",
                "--query", "what happened at 0:03?",
            ] + flags, workdir)
            assert result.returncode == 0, result.stderr
            line = next(l for l in result.stdout.splitlines()
                        if l.startswith("Timeline:"))
            out[mode] = line
        assert out["seq"] == out["pipe"]
