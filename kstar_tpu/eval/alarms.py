"""Shot-level alarm evaluation: sweep whole shots and score the alarms.

The reference inspects continuous predictions qualitatively (prob-curve
figures and GIFs per shot); operationally what matters is: did an alarm
fire before the disruption, how much warning time did it give, and does the
model false-alarm during flat-top? This module sweeps every shot with the
batched engine (infer/continuous.py) and aggregates:

  * detected     — alarm fired in [tftsrt + t_min, tipminf]
  * missed       — no alarm before the current quench
  * premature    — alarm before flat-top settles (within t_min of startup)
  * warning time — tipminf - t_alarm (the reference's warning-time notion,
                   utility.py:843-853), with p50/p90 across detected shots
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from ..infer.continuous import alarm_times, predict_video_shot, warning_time


def evaluate_video_alarms(
    model, params, batch_stats,
    store,                        # VideoStore
    disrupt_df: pd.DataFrame,
    shots: Sequence[int],
    seq_len: int = 21,
    dist: int = 3,
    crop_size: int = 128,
    batch_size: int = 128,
    threshold: float = 0.5,
    t_min: float = 1.0,
    compute_dtype=None,
) -> Dict:
    """Sweep each shot, score alarms. Returns {'per_shot': DataFrame,
    'summary': dict}."""
    import jax.numpy as jnp

    from ..config import FPS
    from ..infer.continuous import VideoSweeper, startup_suppression

    compute_dtype = compute_dtype or jnp.bfloat16
    shots = [s for s in shots if s in store]

    # one dispatch for the whole shot library (sweep_shots); per-shot
    # padding/suppression/alignment identical to predict_video_shot
    sweeper = VideoSweeper(model, params, batch_stats, seq_len, crop_size,
                           batch_size, compute_dtype)
    frames_list, starts_list, metas = [], [], []
    for shot in shots:
        r = disrupt_df[disrupt_df.shot == shot].iloc[0]
        frames = np.asarray(store.arrays[int(shot)])
        sub = frames[int(r.frame_startup): int(r.frame_cutoff) + int(FPS)]
        n_windows = max(len(sub) - seq_len - dist, 0)
        frames_list.append(sub)
        starts_list.append(np.arange(n_windows, dtype=np.int64))
        metas.append(r)
    probs_list = sweeper.sweep_shots(frames_list, starts_list)

    rows: List[Dict] = []
    for shot, r, raw in zip(shots, metas, probs_list):
        prob_full = np.concatenate([
            np.zeros(seq_len + int(r.frame_startup), np.float32),
            raw[1:-1] if len(raw) > 2 else raw[:0],
        ])
        probs = startup_suppression(prob_full, int(FPS * 1))
        time_x = np.arange(len(probs)) / FPS
        t_alarm = alarm_times(time_x, probs, threshold, t_min)
        t_cq = float(r.tipminf)
        w = warning_time(t_alarm, t_cq)
        detected = t_alarm is not None and t_alarm <= t_cq
        rows.append({
            "shot": int(shot),
            "t_alarm": t_alarm,
            "t_cq": t_cq,
            "warning_s": w if detected else np.nan,
            "detected": detected,
            "missed": t_alarm is None or t_alarm > t_cq,
            "max_prob": float(probs.max()) if len(probs) else 0.0,
        })

    per_shot = pd.DataFrame(rows)
    warns = per_shot.warning_s.dropna().values if len(per_shot) else np.array([])
    summary = {
        "n_shots": len(per_shot),
        "detected": int(per_shot.detected.sum()) if len(per_shot) else 0,
        "missed": int(per_shot.missed.sum()) if len(per_shot) else 0,
        "detection_rate": float(per_shot.detected.mean()) if len(per_shot) else 0.0,
        "warning_p50_s": float(np.percentile(warns, 50)) if len(warns) else None,
        "warning_p90_s": float(np.percentile(warns, 90)) if len(warns) else None,
        "warning_mean_s": float(warns.mean()) if len(warns) else None,
        "threshold": threshold,
    }
    return {"per_shot": per_shot, "summary": summary}


def threshold_sweep(
    model, params, batch_stats, store, disrupt_df, shots,
    thresholds: Sequence[float] = (0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
    **kw,
) -> pd.DataFrame:
    """Detection rate / warning time vs alarm threshold — the operational
    trade-off curve. Sweeps each shot ONCE and rescoring alarms per
    threshold (probabilities are threshold-independent)."""
    import jax.numpy as jnp

    compute_dtype = kw.pop("compute_dtype", None) or jnp.bfloat16
    seq_len = kw.pop("seq_len", 21)
    dist = kw.pop("dist", 3)
    crop_size = kw.pop("crop_size", 128)
    batch_size = kw.pop("batch_size", 128)
    t_min = kw.pop("t_min", 1.0)

    curves = []
    for shot in shots:
        if shot not in store:
            continue
        r = disrupt_df[disrupt_df.shot == shot].iloc[0]
        frames = np.asarray(store.arrays[int(shot)])
        time_x, probs = predict_video_shot(
            model, params, batch_stats, frames,
            int(r.frame_startup), int(r.frame_cutoff),
            seq_len=seq_len, dist=dist, crop_size=crop_size,
            batch_size=batch_size, compute_dtype=compute_dtype)
        curves.append((float(r.tipminf), time_x, probs))

    rows = []
    for thr in thresholds:
        det, warns = 0, []
        for t_cq, time_x, probs in curves:
            ta = alarm_times(time_x, probs, thr, t_min)
            if ta is not None and ta <= t_cq:
                det += 1
                warns.append(t_cq - ta)
        rows.append({
            "threshold": thr,
            "detection_rate": det / max(len(curves), 1),
            "warning_p50_s": float(np.percentile(warns, 50)) if warns else None,
            "n_detected": det,
        })
    return pd.DataFrame(rows)
