"""Video ETL: .avi -> per-shot contiguous uint8 arrays (+ jpg-folder repack).

TPU-first redesign of reference src/generate_video_data.py: instead of one
jpg per frame (reference :110, which forces per-sample cv2.imread at train
time), each shot becomes a single (T, H, W, 3) uint8 .npy that memory-maps
for zero-copy window gathers. cv2 is only needed for .avi decode / jpg read
and is import-gated; the training path never touches it.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def _require_cv2():
    try:
        import cv2  # type: ignore
        return cv2
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "cv2 is required only for .avi/.jpg decoding; install opencv-python "
            "or repack shots to .npy on a machine that has it") from e


def decode_avi(path: str, resize: int = 256, fallback_path: Optional[str] = None) -> np.ndarray:
    """Decode one shot's .avi to (T, resize, resize, 3) uint8 BGR, resizing
    with INTER_CUBIC (reference src/generate_video_data.py:108); falls back
    tv01 -> tv02 like the reference (:69-76)."""
    cv2 = _require_cv2()
    cap = cv2.VideoCapture(path)
    if not cap.isOpened() and fallback_path:
        cap = cv2.VideoCapture(fallback_path)
    if not cap.isOpened():
        raise FileNotFoundError(path)
    frames: List[np.ndarray] = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.resize(frame, (resize, resize), interpolation=cv2.INTER_CUBIC))
    cap.release()
    return np.stack(frames).astype(np.uint8) if frames else np.zeros((0, resize, resize, 3), np.uint8)


def repack_jpg_folder(folder: str, resize: Optional[int] = None) -> np.ndarray:
    """Repack a reference-style frame folder (<shot>/NNNNNN.jpg) into one
    contiguous array."""
    cv2 = _require_cv2()
    import glob

    paths = sorted(glob.glob(os.path.join(folder, "*.jpg")))
    frames = []
    for p in paths:
        img = cv2.imread(p)
        if resize and img.shape[0] != resize:
            img = cv2.resize(img, (resize, resize), interpolation=cv2.INTER_CUBIC)
        frames.append(img)
    return np.stack(frames).astype(np.uint8) if frames else np.zeros((0, 0, 0, 3), np.uint8)


def _convert_one(args) -> str:
    """Worker for convert_shots — module-level so mp.Pool can pickle it."""
    shot, avi_dir, out_dir, resize = args
    p1 = os.path.join(avi_dir, f"{shot:06d}tv01.avi")
    p2 = os.path.join(avi_dir, f"{shot:06d}tv02.avi")
    arr = decode_avi(p1, resize, fallback_path=p2)
    out = os.path.join(out_dir, f"{shot}.npy")
    np.save(out, arr)
    return out


def convert_shots(
    avi_dir: str,
    out_dir: str,
    shots: Sequence[int],
    resize: int = 256,
    n_workers: int = 0,
) -> Dict[int, str]:
    """Convert shots' .avi files (avi_dir/%06dtv01.avi with tv02 fallback,
    reference naming) into out_dir/<shot>.npy. Parallelized over shots with a
    process pool like the reference (:133-151) when n_workers > 0."""
    os.makedirs(out_dir, exist_ok=True)
    work = [(s, avi_dir, out_dir, resize) for s in shots]

    if n_workers > 0:
        import multiprocessing as mp

        with mp.Pool(n_workers) as pool:
            outs = pool.map(_convert_one, work)
        return dict(zip(shots, outs))
    return {s: _convert_one(w) for s, w in zip(shots, work)}


def repack_dataset(temp_dir: str, out_dir: str, resize: Optional[int] = None) -> Dict[int, str]:
    """Repack a reference dataset/temp/<shot>/ jpg tree into per-shot .npy."""
    import glob

    os.makedirs(out_dir, exist_ok=True)
    outs = {}
    for folder in sorted(glob.glob(os.path.join(temp_dir, "*"))):
        if not os.path.isdir(folder):
            continue
        shot = int(os.path.basename(folder))
        arr = repack_jpg_folder(folder, resize)
        out = os.path.join(out_dir, f"{shot}.npy")
        np.save(out, arr)
        outs[shot] = out
    return outs
