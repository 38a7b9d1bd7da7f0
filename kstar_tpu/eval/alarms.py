"""Shot-level alarm evaluation: sweep whole shots and score the alarms.

The reference inspects continuous predictions qualitatively (prob-curve
figures and GIFs per shot); operationally what matters is: did an alarm
fire before the disruption, how much warning time did it give, and does the
model false-alarm during flat-top? This module sweeps every shot with the
batched engine (infer/continuous.py) and aggregates:

  * detected     — alarm fired in [tftsrt + t_min, tipminf]
  * missed       — not detected (no alarm before the current quench, or
                   only a premature one)
  * premature    — alarm before tftsrt + t_min (too early to be a credible
                   precursor; a false alarm operationally — counts missed,
                   not detected, and is excluded from the warning stats)
  * warning time — tipminf - t_alarm (the reference's warning-time notion,
                   utility.py:843-853), with p50/p90 across detected shots
  * false alarm  — on a NON-disruptive shot (is_disrupt False / NaN
                   tipminf), any threshold crossing the alarm system would
                   act on, i.e. at or after t_min (the same startup blanking
                   alarm_times applies everywhere); summary reports the
                   per-shot false-alarm rate (FPR) and the mean fraction of
                   post-t_min time spent above threshold — both statistics
                   share the one t_min gate

**Latching semantics.** The headline ``detected`` figure latches on the
FIRST threshold crossing of the shot: if that crossing is premature, the
shot counts as missed even if a credible alarm also fires later inside
[tftsrt + t_min, tipminf]. This models an operational alarm that trips
(and would trigger mitigation) at its first firing. The non-latched
alternative — scan for the first crossing at or after tftsrt + t_min — is
reported alongside as ``detected_recoverable`` / ``detection_rate_recoverable``.

**Dwell rule.** Every scorer takes ``min_dwell_s``: the alarm trips only
after the curve stays above threshold for that much continuous armed time
(alarm_times, infer/continuous.py) — a hysteresis axis the reference lacks
that suppresses brief ramp-down spikes (the measured false-alarm mode) at a
1:1 cost in warning time. ``dwell_tradeoff_from_curves`` sweeps it the way
``threshold_tradeoff_from_curves`` sweeps the threshold.

Every entry point sweeps the whole shot library in ONE device dispatch
(VideoSweeper.sweep_shots) and scores alarms on the host.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from ..infer.continuous import alarm_times, warning_time


def sweep_prob_curves(
    model, params, batch_stats,
    store,                        # VideoStore
    disrupt_df: pd.DataFrame,
    shots: Sequence[int],
    seq_len: int = 21,
    dist: int = 3,
    crop_size: int = 128,
    batch_size: int = 128,
    compute_dtype=None,
    mesh=None,
) -> List[Tuple[int, object, np.ndarray, np.ndarray]]:
    """One-dispatch library sweep -> [(shot, disrupt_row, time_x, probs)].

    Padding/startup-suppression/alignment identical to predict_video_shot
    (reference generate_prob_curve, utility.py:896-977)."""
    import jax.numpy as jnp

    from ..config import FPS
    from ..infer.continuous import VideoSweeper, startup_suppression

    compute_dtype = compute_dtype or jnp.bfloat16
    have_meta = set(disrupt_df.shot)
    skipped = [s for s in shots if s in store and s not in have_meta]
    if skipped:
        print(f"[sweep_prob_curves] skipping shots without disruption "
              f"metadata: {skipped}")
    shots = [s for s in shots if s in store and s in have_meta]
    if not shots:
        return []

    sweeper = VideoSweeper(model, params, batch_stats, seq_len, crop_size,
                           batch_size, compute_dtype, mesh=mesh)
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

    curves = []
    for shot, r, raw in zip(shots, metas, probs_list):
        prob_full = np.concatenate([
            np.zeros(seq_len + int(r.frame_startup), np.float32),
            raw[1:-1] if len(raw) > 2 else raw[:0],
        ])
        probs = startup_suppression(prob_full, int(FPS * 1))
        time_x = np.arange(len(probs)) / FPS
        curves.append((int(shot), r, time_x, probs))
    return curves


def score_alarms(curves, threshold: float = 0.5, t_min: float = 1.0,
                 min_dwell_s: float = 0.0) -> Dict:
    """Score pre-swept probability curves at one threshold.

    Disruptive shots contribute to detection/warning statistics (first-alarm
    LATCHING — see module docstring — with ``detected_recoverable`` as the
    non-latched companion). Non-disruptive shots (``is_disrupt`` False or
    NaN tipminf in the shot-log row) contribute to the false-alarm
    statistics: a crossing at or after ``t_min`` is a false alarm, and
    ``alarm_time_frac`` is the fraction of post-``t_min`` samples above
    threshold — the same gate for both, so false_alarm_rate and
    false_alarm_time_frac describe one population.

    ``min_dwell_s`` requires the curve to stay above threshold for that much
    continuous armed time before the alarm trips (alarm_times dwell rule —
    suppresses brief ramp-down spikes at the cost of exactly that much
    warning time; 0 = the reference first-crossing rule).
    ``alarm_time_frac`` stays a plain duty-cycle statistic, dwell-independent
    by design."""
    rows: List[Dict] = []
    for shot, r, time_x, probs in curves:
        t_cq = float(r.tipminf)
        tftsrt = float(r.tftsrt)
        is_disrupt = bool(getattr(r, "is_disrupt", True)) and np.isfinite(t_cq)
        t_alarm = alarm_times(time_x, probs, threshold, t_min, min_dwell_s)
        if is_disrupt:
            w = warning_time(t_alarm, t_cq)
            premature = t_alarm is not None and t_alarm < tftsrt + t_min
            # detected per the module contract: a credible alarm fired inside
            # [tftsrt + t_min, tipminf] — a premature (pre-flat-top+t_min)
            # alarm is operationally a false alarm and LATCHES the shot as
            # missed, so detection_rate and the warning percentiles stay
            # honest
            detected = t_alarm is not None and t_alarm <= t_cq and not premature
            # non-latched companion: first crossing AT OR AFTER tftsrt+t_min
            t_rec = alarm_times(time_x, probs, threshold,
                                t_min=tftsrt + t_min,
                                min_dwell_s=min_dwell_s)
            detected_rec = t_rec is not None and t_rec <= t_cq
            false_alarm = False
            alarm_frac = np.nan
        else:
            detected = detected_rec = premature = False
            w = None
            # same t_min gate as t_alarm/false_alarm: one operational window
            false_alarm = t_alarm is not None
            armed = time_x >= t_min
            alarm_frac = (float((probs[armed] > threshold).mean())
                          if armed.any() else 0.0)
        rows.append({
            "shot": int(shot),
            "is_disrupt": is_disrupt,
            "t_alarm": t_alarm,
            "t_cq": t_cq,
            "warning_s": w if detected else np.nan,
            "detected": detected,
            "detected_recoverable": detected_rec,
            "missed": is_disrupt and not detected,
            "premature": premature,
            "false_alarm": false_alarm,
            "alarm_time_frac": alarm_frac,
            "max_prob": float(probs.max()) if len(probs) else 0.0,
        })

    per_shot = pd.DataFrame(rows)
    dis = per_shot[per_shot.is_disrupt] if len(per_shot) else per_shot
    nrm = per_shot[~per_shot.is_disrupt] if len(per_shot) else per_shot
    warns = dis.warning_s.dropna().values if len(dis) else np.array([])
    summary = {
        "n_shots": len(per_shot),
        "n_disrupt": len(dis),
        "n_normal": len(nrm),
        "detected": int(dis.detected.sum()) if len(dis) else 0,
        "missed": int(dis.missed.sum()) if len(dis) else 0,
        "premature": int(dis.premature.sum()) if len(dis) else 0,
        "detection_rate": float(dis.detected.mean()) if len(dis) else 0.0,
        "detection_rate_recoverable": (
            float(dis.detected_recoverable.mean()) if len(dis) else 0.0),
        "false_alarms": int(nrm.false_alarm.sum()) if len(nrm) else 0,
        "false_alarm_rate": (float(nrm.false_alarm.mean())
                             if len(nrm) else None),
        "false_alarm_time_frac": (float(nrm.alarm_time_frac.mean())
                                  if len(nrm) else None),
        "warning_p50_s": float(np.percentile(warns, 50)) if len(warns) else None,
        "warning_p90_s": float(np.percentile(warns, 90)) if len(warns) else None,
        "warning_mean_s": float(warns.mean()) if len(warns) else None,
        "threshold": threshold,
        "min_dwell_s": min_dwell_s,
    }
    return {"per_shot": per_shot, "summary": summary}


def evaluate_video_alarms(
    model, params, batch_stats,
    store,
    disrupt_df: pd.DataFrame,
    shots: Sequence[int],
    seq_len: int = 21,
    dist: int = 3,
    crop_size: int = 128,
    batch_size: int = 128,
    threshold: float = 0.5,
    t_min: float = 1.0,
    min_dwell_s: float = 0.0,
    compute_dtype=None,
    mesh=None,
) -> Dict:
    """Sweep each shot (one dispatch for the library), score alarms.
    Returns {'per_shot': DataFrame, 'summary': dict}. Pass ``mesh`` to
    shard the shot axis over its 'data' devices (VideoSweeper shard_map)."""
    curves = sweep_prob_curves(model, params, batch_stats, store, disrupt_df,
                               shots, seq_len, dist, crop_size, batch_size,
                               compute_dtype, mesh=mesh)
    return score_alarms(curves, threshold, t_min, min_dwell_s)


def sweep_multimodal_prob_curves(
    model, params, batch_stats,
    store,
    ts_df: pd.DataFrame,
    disrupt_df: pd.DataFrame,
    shots: Sequence[int],
    cols: Sequence[str],
    scaler,
    seq_len: int = 21,
    dist: int = 3,
    dt: float = 1.0 / 210.0,
    tau: int = 1,
    crop_size: int = 128,
    batch_size: int = 32,
    compute_dtype=None,
) -> List[Tuple[int, object, np.ndarray, np.ndarray]]:
    """Whole-shot multimodal sweeps -> [(shot, disrupt_row, time_x, probs)].

    Each shot runs the fused-table one-dispatch multimodal sweep
    (infer/continuous.py predict_multimodal_shot — already padded, startup-
    suppressed, and smoothed like reference utility.py:1136-1168), so the
    curves feed score_alarms directly. One MultiModalSweeper is built for
    the whole library: its compiled program is shared across shots (frame/
    row/chunk counts are bucketed) instead of retraced per shot."""
    import jax.numpy as jnp

    from ..infer.continuous import MultiModalSweeper, predict_multimodal_shot

    compute_dtype = compute_dtype or jnp.bfloat16
    sweeper = MultiModalSweeper(model, params, batch_stats, seq_len, tau,
                                crop_size, batch_size, compute_dtype)
    have_meta = set(disrupt_df.shot)
    curves = []
    for shot in shots:
        if shot not in store:
            continue
        if shot not in have_meta:
            print(f"[sweep_multimodal_prob_curves] skipping shot {shot}: "
                  f"no disruption metadata")
            continue
        r = disrupt_df[disrupt_df.shot == shot].iloc[0]
        d = ts_df[ts_df.shot == shot]
        # non-disruptive shots have no quench time: sweep to the end of the
        # 0D table instead
        t_end = (float(r.tipminf) if np.isfinite(float(r.tipminf))
                 else float(d["time"].max()))
        time_x, probs = predict_multimodal_shot(
            model, params, batch_stats,
            np.asarray(store.arrays[int(shot)]),
            d[cols].to_numpy(np.float32), d["time"].to_numpy(), scaler,
            int(r.frame_startup), int(r.frame_cutoff),
            float(r.tftsrt), t_end,
            seq_len=seq_len, dist=dist, dt=dt, tau=tau,
            crop_size=crop_size, batch_size=batch_size,
            compute_dtype=compute_dtype, sweeper=sweeper)
        if len(time_x):
            curves.append((int(shot), r, time_x, probs))
    return curves


def evaluate_multimodal_alarms(
    model, params, batch_stats, store, ts_df, disrupt_df, shots, cols, scaler,
    threshold: float = 0.5,
    t_min: float = 1.0,
    min_dwell_s: float = 0.0,
    **kw,
) -> Dict:
    """Multimodal analogue of evaluate_video_alarms: sweep each test shot
    through the fusion model, score the alarms (reference inspects
    generate_prob_curve_from_multi output qualitatively,
    utility.py:1068-1178)."""
    curves = sweep_multimodal_prob_curves(
        model, params, batch_stats, store, ts_df, disrupt_df, shots, cols,
        scaler, **kw)
    return score_alarms(curves, threshold, t_min, min_dwell_s)


def threshold_tradeoff_from_curves(
    curves,
    thresholds: Sequence[float] = (0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
    t_min: float = 1.0,
    min_dwell_s: float = 0.0,
) -> pd.DataFrame:
    """Rescore pre-swept prob curves per threshold — probabilities are
    threshold-independent, so the trade-off curve needs no further device
    work. Shared by threshold_sweep / multimodal_threshold_sweep and the
    CLIs (which already hold curves from alarm scoring and must not sweep
    the library twice)."""
    rows = []
    for thr in thresholds:
        s = score_alarms(curves, thr, t_min, min_dwell_s)["summary"]
        rows.append({
            "threshold": thr,
            "detection_rate": s["detection_rate"],
            "detection_rate_recoverable": s["detection_rate_recoverable"],
            "warning_p50_s": s["warning_p50_s"],
            "n_detected": s["detected"],
            "n_premature": s["premature"],
            "false_alarm_rate": s["false_alarm_rate"],
            "false_alarm_time_frac": s["false_alarm_time_frac"],
            "n_false_alarms": s["false_alarms"],
        })
    return pd.DataFrame(rows)


def dwell_tradeoff_from_curves(
    curves,
    dwells: Sequence[float] = (0.0, 0.05, 0.1, 0.2, 0.4),
    threshold: float = 0.5,
    t_min: float = 1.0,
) -> pd.DataFrame:
    """Detection / warning / false-alarm rate vs the alarm DWELL requirement
    at a fixed threshold — the second operational axis (no reference
    counterpart; the reference alarms on first crossing only). Dwell trades
    warning time 1:1 for false-alarm suppression: each row shows exactly how
    much detection and p50 warning is paid for the FPR bought. Rescoring is
    host-only, like threshold_tradeoff_from_curves."""
    rows = []
    for dw in dwells:
        s = score_alarms(curves, threshold, t_min, dw)["summary"]
        rows.append({
            "min_dwell_s": dw,
            "detection_rate": s["detection_rate"],
            "detection_rate_recoverable": s["detection_rate_recoverable"],
            "warning_p50_s": s["warning_p50_s"],
            "n_detected": s["detected"],
            "n_premature": s["premature"],
            "false_alarm_rate": s["false_alarm_rate"],
            "false_alarm_time_frac": s["false_alarm_time_frac"],
            "n_false_alarms": s["false_alarms"],
        })
    return pd.DataFrame(rows)


def operating_grid_from_curves(
    curves,
    thresholds: Sequence[float] = (0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
    dwells: Sequence[float] = (0.0, 0.05, 0.1, 0.2, 0.4),
    t_min: float = 1.0,
) -> pd.DataFrame:
    """Full threshold x dwell operating surface (round-4 verdict next #2):
    every (threshold, min_dwell_s) combination rescored on the held curves,
    so the artifact shows directly WHICH operating points — if any — reach
    detection 1.0 / false-alarm 0, and which axis fails where none does.
    Host-only rescoring like the 1-D trade-offs; cost is O(grid x shots)
    numpy, no device work."""
    rows = []
    for thr in thresholds:
        for dw in dwells:
            s = score_alarms(curves, thr, t_min, dw)["summary"]
            rows.append({
                "threshold": thr,
                "min_dwell_s": dw,
                "detection_rate": s["detection_rate"],
                "detection_rate_recoverable": s["detection_rate_recoverable"],
                "warning_p50_s": s["warning_p50_s"],
                "warning_p90_s": s["warning_p90_s"],
                "n_detected": s["detected"],
                "n_premature": s["premature"],
                "false_alarm_rate": s["false_alarm_rate"],
                "false_alarm_time_frac": s["false_alarm_time_frac"],
                "n_false_alarms": s["false_alarms"],
            })
    return pd.DataFrame(rows)


def multimodal_threshold_sweep(
    model, params, batch_stats, store, ts_df, disrupt_df, shots, cols, scaler,
    thresholds: Sequence[float] = (0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
    t_min: float = 1.0,
    min_dwell_s: float = 0.0,
    **kw,
) -> pd.DataFrame:
    """Operational trade-off curve for the fusion model; shots are swept
    once and rescored per threshold on the host."""
    curves = sweep_multimodal_prob_curves(
        model, params, batch_stats, store, ts_df, disrupt_df, shots, cols,
        scaler, **kw)
    return threshold_tradeoff_from_curves(curves, thresholds, t_min,
                                          min_dwell_s)


def threshold_sweep(
    model, params, batch_stats, store, disrupt_df, shots,
    thresholds: Sequence[float] = (0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
    **kw,
) -> pd.DataFrame:
    """Detection rate / warning time / premature rate vs alarm threshold —
    the operational trade-off curve. The library is swept ONCE (one device
    dispatch via sweep_prob_curves); alarms are rescored per threshold on the
    host (probabilities are threshold-independent)."""
    t_min = kw.pop("t_min", 1.0)
    min_dwell_s = kw.pop("min_dwell_s", 0.0)
    curves = sweep_prob_curves(
        model, params, batch_stats, store, disrupt_df, shots,
        seq_len=kw.pop("seq_len", 21), dist=kw.pop("dist", 3),
        crop_size=kw.pop("crop_size", 128), batch_size=kw.pop("batch_size", 128),
        compute_dtype=kw.pop("compute_dtype", None), mesh=kw.pop("mesh", None))
    return threshold_tradeoff_from_curves(curves, thresholds, t_min,
                                          min_dwell_s)
