"""Legacy clip extractor parity (data/video_pipeline.py legacy_clip_segments
/ extract_legacy_clips vs reference src/generate_video_data_fixed.py).

The reference is a script (argparse + cv2 at module level) so it cannot be
imported as an oracle; instead `_reference_writer_loop` reproduces its
`make_dataset` control flow line by line (same branch order, same quirks)
over an abstract frame counter, and the closed-form segmenter must match it
exactly across a sweep of configurations, including the edge cases the
quirks create.
"""

import numpy as np
import pytest

from kstar_tpu.data.video_pipeline import (extract_legacy_clips,
                                           legacy_clip_segments,
                                           legacy_frame_calculator)


def _reference_writer_loop(n_frames, tftsrt_s, frame_tipminf, duration,
                           distance, fps, gap):
    """Line-by-line simulation of reference
    src/generate_video_data_fixed.py:85-176 make_dataset: each cv2
    VideoWriter becomes a dict collecting the frame indices actually
    written to it."""
    tftsrt = round(tftsrt_s * fps + gap)          # :99 via frame_calculator
    dis_frame = frame_tipminf - distance          # :106
    start_frame = dis_frame % duration            # :109
    clips = []
    out = None
    save_start = True                             # :137
    disruption_bool = False                       # :136
    for frame_num in range(n_frames):             # :140-176
        if frame_num < tftsrt:                    # :146-147
            pass
        else:
            if save_start and (frame_num - start_frame) % duration == 0:
                out = {"start": frame_num, "end": frame_num + duration,
                       "label": "normal", "frames": []}      # :149-152
                clips.append(out)
                save_start = False
            else:
                if frame_num + duration == dis_frame:        # :155-159
                    out = {"start": frame_num, "end": frame_num + duration,
                           "label": "disruption", "frames": []}
                    clips.append(out)
                    disruption_bool = True
                elif ((frame_num - start_frame) % duration == 0
                      and frame_num != start_frame):         # :162-168
                    if disruption_bool:
                        break                                # :163-164
                    out = {"start": frame_num, "end": frame_num + duration,
                           "label": "normal", "frames": []}
                    clips.append(out)
                if out is not None:                          # :173-174
                    out["frames"].append(frame_num)
    return clips


def _assert_match(n_frames, tftsrt_s, frame_tipminf, duration, distance,
                  fps, gap):
    oracle = _reference_writer_loop(n_frames, tftsrt_s, frame_tipminf,
                                    duration, distance, fps, gap)
    got = legacy_clip_segments(tftsrt_s, frame_tipminf, n_frames,
                               duration, distance, fps, gap)
    assert len(got) == len(oracle), (got, oracle)
    for g, o in zip(got, oracle):
        assert g["start"] == o["start"] and g["end"] == o["end"]
        assert g["label"] == o["label"]
        w0, w1 = g["written"]
        assert list(range(w0, w1)) == o["frames"], (g, o)


def test_matches_reference_loop_basic():
    # typical: disruption clip in the middle, duration 21 at 210 fps
    _assert_match(n_frames=400, tftsrt_s=0.3, frame_tipminf=300,
                  duration=21, distance=3, fps=210, gap=20)


def test_first_boundary_frame_is_dropped():
    segs = legacy_clip_segments(0.0, 300, 400, duration=21, distance=0,
                                fps=210, gap=0)
    b0 = segs[0]["start"]
    assert segs[0]["written"] == (b0 + 1, b0 + 21)  # save_start quirk
    assert all(s["written"][0] == s["start"] for s in segs[1:])


def test_disruption_clip_and_break():
    segs = legacy_clip_segments(0.1, 250, 4000, duration=21, distance=5,
                                fps=210, gap=10)
    dis = [s for s in segs if s["label"] == "disruption"]
    assert len(dis) == 1
    assert dis[0]["end"] == 250 - 5  # [dis_frame-duration, dis_frame)
    assert segs[-1] is dis[0]        # loop breaks at the next boundary


def test_disruption_window_as_first_segment_is_mislabeled_normal():
    # tftsrt lands inside/at the disruption window: the save_start branch
    # wins, the clip is labeled normal, and the loop runs to video end
    # (reference quirk, :149 vs :155).
    frame_tipminf, duration, distance = 105, 21, 0
    dis_frame = frame_tipminf - distance
    tft_s = (dis_frame - duration) / 210.0  # tftsrt frame == dis boundary
    _assert_match(300, tft_s, frame_tipminf, duration, distance, 210, 0)
    segs = legacy_clip_segments(tft_s, frame_tipminf, 300, duration,
                                distance, 210, 0)
    assert all(s["label"] == "normal" for s in segs)
    assert segs[-1]["end"] > dis_frame  # no break: clips past disruption


def test_disruption_before_startup_never_emits():
    # whole disruption window precedes tftsrt -> no disruption clip at all
    _assert_match(500, 1.0, 100, 21, 0, 210, 0)
    segs = legacy_clip_segments(1.0, 100, 500, 21, 0, 210, 0)
    assert all(s["label"] == "normal" for s in segs)


def test_video_ends_mid_clip_keeps_name():
    segs = legacy_clip_segments(0.0, 1000, 100, duration=21, distance=0,
                                fps=210, gap=0)
    last = segs[-1]
    assert last["end"] - last["start"] == 21       # name keeps full width
    assert last["written"][1] == 100               # but frames stop at EOF


def test_sweep_matches_reference_loop():
    rng = np.random.default_rng(0)
    for _ in range(250):
        duration = int(rng.choice([4, 7, 21]))
        distance = int(rng.integers(0, 8))
        fps = int(rng.choice([100, 210]))
        gap = int(rng.integers(0, 25))
        n_frames = int(rng.integers(10, 500))
        frame_tipminf = int(rng.integers(0, 600))
        tftsrt_s = float(rng.uniform(0, 1.5))
        _assert_match(n_frames, tftsrt_s, frame_tipminf, duration,
                      distance, fps, gap)


def test_frame_calculator_parity():
    # round() (banker's) on time*fps + gap, gap added before rounding
    assert legacy_frame_calculator(0.5, 210, 0) == 105
    assert legacy_frame_calculator(0.0, 210, 20) == 20
    # banker's rounding: 0.5 fractional part rounds to even
    assert legacy_frame_calculator(1.25, 2, 0) == round(2.5) == 2


def test_extract_legacy_clips_arrays_and_layout(tmp_path):
    n = 200
    frames = np.arange(n, dtype=np.uint8)[:, None, None, None]
    frames = np.broadcast_to(frames, (n, 4, 6, 3)).copy()
    segs = extract_legacy_clips(frames, 0.05, 150, duration=21, distance=2,
                                fps=210, gap=5, save_dir=str(tmp_path),
                                shot=12345)
    assert any(s["label"] == "disruption" for s in segs)
    for s in segs:
        w0, w1 = s["written"]
        np.testing.assert_array_equal(s["clip"], frames[w0:w1])
        assert s["path"].endswith(
            f"dur21_dis2/{s['label']}/12345_{s['start']}_{s['end']}.npy")
        np.testing.assert_array_equal(np.load(s["path"]), s["clip"])


def test_extract_legacy_clips_flip_matches_tv02_rule():
    n = 60
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, size=(n, 4, 6, 3), dtype=np.uint8)
    plain = extract_legacy_clips(frames, 0.0, 50, duration=7, distance=0,
                                 fps=210, gap=0)
    flipped = extract_legacy_clips(frames, 0.0, 50, duration=7, distance=0,
                                   fps=210, gap=0, flip=True)
    for p, f in zip(plain, flipped):
        np.testing.assert_array_equal(f["clip"], p["clip"][:, :, ::-1])
