"""Native C++ runtime: y4m decode, WAV read, prefetch ring vs Python impls."""

import wave as wave_mod

import numpy as np
import pytest

from gvl_tpu.io.video import SyntheticVideo, Y4MReader, write_y4m
from gvl_tpu.runtime import (
    NativePrefetchSource,
    NativeY4MReader,
    native_available,
    read_wav_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native runtime not built")


@pytest.fixture(scope="module")
def y4m_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("native") / "clip.y4m"
    synth = SyntheticVideo("native_test", duration=2.0, fps=4.0,
                           width=64, height=48)
    write_y4m(path, list(synth), fps=4.0)
    return path


class TestNativeY4M:
    def test_header(self, y4m_file):
        reader = NativeY4MReader(y4m_file)
        assert (reader.width, reader.height) == (64, 48)
        assert reader.fps == pytest.approx(4.0)
        reader.close()

    def test_matches_python_decoder(self, y4m_file):
        native_frames = list(NativeY4MReader(y4m_file))
        py_frames = list(Y4MReader(y4m_file))
        assert len(native_frames) == len(py_frames) == 8
        for nat, py in zip(native_frames, py_frames):
            # same BT.601 math, different rounding paths: ±2 LSB
            diff = np.abs(nat.astype(int) - py.astype(int)).max()
            assert diff <= 2

    def test_frame_count_and_eof(self, y4m_file):
        reader = NativeY4MReader(y4m_file)
        frames = list(reader)
        assert len(frames) == 8
        reader.close()


class TestNativePrefetch:
    def test_streams_all_frames_with_timestamps(self, y4m_file):
        source = NativePrefetchSource(y4m_file, capacity=3)
        items = list(source)
        assert len(items) == 8
        assert items[0][0] == pytest.approx(0.0)
        assert items[4][0] == pytest.approx(1.0)
        source.close()

    def test_stride_subsampling(self, y4m_file):
        source = NativePrefetchSource(y4m_file, capacity=3, stride=2)
        items = list(source)
        assert len(items) == 4
        assert [round(t, 2) for t, _ in items] == [0.0, 0.5, 1.0, 1.5]
        source.close()

    def test_matches_direct_reader(self, y4m_file):
        direct = list(NativeY4MReader(y4m_file))
        prefetched = [f for _, f in NativePrefetchSource(y4m_file, capacity=2)]
        for a, b in zip(direct, prefetched):
            np.testing.assert_array_equal(a, b)

    def test_early_close_no_deadlock(self, y4m_file):
        source = NativePrefetchSource(y4m_file, capacity=2)
        next(iter(source))
        source.close()  # worker blocked on full ring must exit


class TestNativeWav:
    def test_pcm16_roundtrip(self, tmp_path):
        t = np.arange(8000) / 16000
        wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        path = tmp_path / "t.wav"
        with wave_mod.open(str(path), "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes((wav * 32767).astype(np.int16).tobytes())
        data, rate = read_wav_native(path)
        assert rate == 16000
        np.testing.assert_allclose(data, wav, atol=1e-3)

    def test_stereo_mixdown(self, tmp_path):
        left = np.full(100, 0.5, np.float32)
        right = np.full(100, -0.5, np.float32)
        inter = np.empty(200, np.float32)
        inter[0::2], inter[1::2] = left, right
        path = tmp_path / "st.wav"
        with wave_mod.open(str(path), "wb") as f:
            f.setnchannels(2)
            f.setsampwidth(2)
            f.setframerate(8000)
            f.writeframes((inter * 32767).astype(np.int16).tobytes())
        data, rate = read_wav_native(path)
        assert rate == 8000
        np.testing.assert_allclose(data, 0.0, atol=1e-3)

    def test_bad_file_raises(self, tmp_path):
        path = tmp_path / "bad.wav"
        path.write_bytes(b"not a wav")
        with pytest.raises(ValueError):
            read_wav_native(path)


class TestNativeResize:
    def test_resize_down_preserves_mean(self):
        from gvl_tpu.runtime.native import resize_image

        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (480, 640, 3)).astype(np.uint8)
        out = resize_image(img, 256, 256)
        assert out.shape == (256, 256, 3) and out.dtype == np.uint8
        # area-average downscale preserves the global mean closely
        assert abs(float(out.mean()) - float(img.mean())) < 2.0

    def test_resize_up_bilinear_smooth(self):
        from gvl_tpu.runtime.native import resize_image

        ramp = np.tile(np.arange(0, 64, dtype=np.uint8)[None, :, None] * 4,
                       (16, 1, 3))
        up = resize_image(ramp, 64, 256)
        # a horizontal ramp stays monotonic when upscaled bilinearly
        rows = up[8, :, 0].astype(int)
        assert (np.diff(rows) >= -1).all()
        assert rows[-1] > rows[0]

    def test_resize_batch_matches_single(self):
        from gvl_tpu.runtime.native import resize_batch, resize_image

        rng = np.random.RandomState(1)
        batch = rng.randint(0, 255, (3, 48, 64, 3)).astype(np.uint8)
        out = resize_batch(batch, 32, 32)
        for i in range(3):
            np.testing.assert_array_equal(
                out[i], resize_image(batch[i], 32, 32))

    def test_resize_mask_roundtrip(self):
        from gvl_tpu.runtime.native import resize_mask

        mask = np.zeros((64, 64), bool)
        mask[16:48, 8:40] = True
        big = resize_mask(mask, 480, 640)
        assert big.shape == (480, 640) and big.dtype == bool
        # nearest-neighbor keeps the filled-area fraction
        assert abs(big.mean() - mask.mean()) < 0.02
        small = resize_mask(big, 64, 64)
        assert (small == mask).mean() > 0.97
