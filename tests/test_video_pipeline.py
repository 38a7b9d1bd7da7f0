"""Real .avi / .jpg ingestion (data/video_pipeline.py) — exercises the
actual cv2 decode paths the reference uses (src/generate_video_data.py),
including the tv01 -> tv02 fallback and the multiprocess conversion."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from kstar_tpu.data.video_pipeline import (convert_shots, decode_avi,
                                           repack_dataset, repack_jpg_folder)

H = W = 64
T = 12


def _frames(seed=0, n=T):
    rng = np.random.default_rng(seed)
    # smooth content so lossy codecs stay close
    base = rng.integers(40, 200, size=(n, 8, 8, 3), dtype=np.uint8)
    return np.stack([cv2.resize(f, (W, H), interpolation=cv2.INTER_LINEAR)
                     for f in base])


def _write_avi(path, frames, fourcc="FFV1"):
    four = cv2.VideoWriter_fourcc(*fourcc)
    wr = cv2.VideoWriter(path, four, 30, (W, H))
    if not wr.isOpened():  # codec unavailable -> fall back to MJPG
        wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (W, H))
    assert wr.isOpened()
    for f in frames:
        wr.write(f)
    wr.release()


def test_decode_avi_roundtrip(tmp_path):
    frames = _frames()
    p = str(tmp_path / "000001tv01.avi")
    _write_avi(p, frames)
    got = decode_avi(p, resize=H)
    assert got.shape == (T, H, W, 3) and got.dtype == np.uint8
    # codec is lossless (FFV1) or near-lossless on smooth content (MJPG)
    assert np.mean(np.abs(got.astype(int) - frames.astype(int))) < 4.0


def test_decode_avi_tv02_fallback(tmp_path):
    frames = _frames(1)
    p2 = str(tmp_path / "000002tv02.avi")
    _write_avi(p2, frames)
    # tv01 missing -> fallback decodes tv02 (reference :69-76)
    got = decode_avi(str(tmp_path / "000002tv01.avi"), resize=H,
                     fallback_path=p2)
    assert got.shape == (T, H, W, 3)
    with pytest.raises(FileNotFoundError):
        decode_avi(str(tmp_path / "missing.avi"), resize=H)


def test_convert_shots_serial_and_parallel(tmp_path):
    avi_dir = tmp_path / "avi"; avi_dir.mkdir()
    out1 = tmp_path / "npy1"; out2 = tmp_path / "npy2"
    shots = [3, 4]
    for s in shots:
        _write_avi(str(avi_dir / f"{s:06d}tv01.avi"), _frames(s))

    outs = convert_shots(str(avi_dir), str(out1), shots, resize=H)
    # the parallel path must produce identical files (was broken before:
    # a local closure can't cross mp.Pool's pickle boundary)
    outs_p = convert_shots(str(avi_dir), str(out2), shots, resize=H,
                           n_workers=2)
    for s in shots:
        a = np.load(outs[s]); b = np.load(outs_p[s])
        assert a.shape == (T, H, W, 3)
        np.testing.assert_array_equal(a, b)


def test_repack_jpg_tree(tmp_path):
    frames = _frames(5)
    shot_dir = tmp_path / "temp" / "7"; shot_dir.mkdir(parents=True)
    for i, f in enumerate(frames):
        cv2.imwrite(str(shot_dir / f"{i:06d}.jpg"), f,
                    [cv2.IMWRITE_JPEG_QUALITY, 100])
    arr = repack_jpg_folder(str(shot_dir))
    assert arr.shape == (T, H, W, 3)
    assert np.mean(np.abs(arr.astype(int) - frames.astype(int))) < 4.0
    outs = repack_dataset(str(tmp_path / "temp"), str(tmp_path / "npy"))
    assert 7 in outs and np.load(outs[7]).shape == (T, H, W, 3)
