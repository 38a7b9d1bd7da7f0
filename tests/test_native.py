"""Native window-gather correctness vs numpy fallback."""

import numpy as np
import pytest

from kstar_tpu.data import native


class TestNativeGather:
    def test_builds_and_matches_numpy(self):
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (50, 8, 8, 3), dtype=np.uint8)
        idx = rng.integers(0, 50, (12, 5)).astype(np.int64)
        got = native.gather_windows_u8(frames, idx)
        np.testing.assert_array_equal(got, frames[idx])

    def test_clips_out_of_range(self):
        frames = np.arange(4 * 2 * 2 * 3, dtype=np.uint8).reshape(4, 2, 2, 3)
        idx = np.array([[-5, 0, 99]], dtype=np.int64)
        got = native.gather_windows_u8(frames, idx)
        np.testing.assert_array_equal(got[0, 0], frames[0])
        np.testing.assert_array_equal(got[0, 2], frames[3])

    def test_memmap_input(self, tmp_path):
        rng = np.random.default_rng(1)
        frames = rng.integers(0, 255, (30, 4, 4, 3), dtype=np.uint8)
        p = tmp_path / "shot.npy"
        np.save(p, frames)
        mm = np.load(p, mmap_mode="r")
        idx = rng.integers(0, 30, (8, 6)).astype(np.int64)
        got = native.gather_windows_u8(mm, idx)
        np.testing.assert_array_equal(got, frames[idx])

    def test_native_lib_available(self):
        # the build toolchain is part of the environment contract; surface
        # silent fallback as a failure so regressions are visible
        assert native.get_lib() is not None
