"""Config presets: tiers, mesh shapes, HBM breakdown, serialization."""

import json

from gvl_tpu.config import PresetName, load_preset
from gvl_tpu.utils import StageTimer


class TestPresets:
    def test_all_presets_load(self):
        for name in ("light", "standard", "full"):
            cfg = load_preset(name)
            assert cfg.preset_name is PresetName(name)

    def test_light_is_single_chip_minimal(self):
        cfg = load_preset("light")
        assert cfg.mesh.num_devices == 1
        assert not cfg.perception.use_sam
        assert not cfg.temporal.use_hico
        assert cfg.inference.fps == 0.5

    def test_full_is_eight_chips(self):
        cfg = load_preset("full")
        assert cfg.mesh.num_devices == 8
        assert cfg.mesh.model_axis == 4
        assert cfg.perception.use_sam
        assert cfg.inference.fps == 2.0
        assert "large" in cfg.audio.whisper_model

    def test_hbm_breakdown_respects_toggles(self):
        light = load_preset("light").get_hbm_breakdown()
        full = load_preset("full").get_hbm_breakdown()
        assert "sam3" not in light and "sam3" in full
        assert light["qwen3_vl_8b"] == 16.0
        # reference-compat alias
        assert load_preset("light").get_vram_breakdown() == light

    def test_buckets_present(self):
        cfg = load_preset("standard")
        assert 16 in cfg.buckets.region_batch
        assert all(b % 128 == 0 for b in cfg.buckets.prompt_lens)

    def test_save_roundtrip(self, tmp_path):
        cfg = load_preset("standard")
        cfg.save(tmp_path / "cfg.json")
        doc = json.loads((tmp_path / "cfg.json").read_text())
        assert doc["preset_name"] == "standard"
        assert doc["reasoning"]["model_name"] == "Qwen/Qwen3-VL-8B-Instruct"
        assert doc["mesh"]["model_axis"] == 4

    def test_fresh_instances(self):
        a, b = load_preset("light"), load_preset("light")
        a.inference.fps = 99.0
        assert b.inference.fps == 0.5


class TestStageTimer:
    def test_accumulates_and_reports(self):
        timer = StageTimer()
        with timer.stage("decode"):
            pass
        with timer.stage("decode"):
            pass
        timer.record("encode", 1.5)
        assert timer.timings["encode"] == 1.5
        assert timer.timings["decode"] >= 0
        report = timer.report()
        assert "decode" in report and "TOTAL" in report
