"""0D table builder: cleaning, clipping, resampling, feature engineering.

Rebuild of reference src/generate_numerical_data.py (ts_interpolate): takes
the raw multi-rate MDSplus dump and emits a uniform-dt table per shot with
engineered features. Steps (reference line refs in parens):

  1. linear NaN interpolation + inf->nan (:19-22)
  2. Thomson fillna(0) + unit scaling Ne/1e19, Te/1e3 (:35-40)
  3. physical bounding + positivity clamps (:42-56), Ip scaling /1e6 (:59)
  4. per-shot validity filters: >50% nulls, constant signal, < 2 s (:89-129)
  5. per-shot IQR outlier clipping (q15/q85, whisker 1.25) (:147-162)
  6. cubic resampling of every column onto a uniform dt grid spanning
     [tftsrt - 4 dt, tipminf + 8 dt] (:188-207)
  7. engineered features: Thomson core/edge averages (:212-216), Greenwald
     density nG = Ip/(pi a^2) and ne_nG_ratio (:220-221), vessel current
     Iv = VCM03 - RC03 (:224)
  8. frame_idx column mapping each row to a camera frame (:293-308)
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from ..config import DT_0D, FPS, Schema


def clean_signals(df: pd.DataFrame, cols: Sequence[str]) -> pd.DataFrame:
    """Steps 1-3: interpolate NaNs, scale units, clamp positivity."""
    df = df.copy()
    df[list(cols)] = df[list(cols)].replace([np.inf, -np.inf], np.nan)
    df[list(cols)] = df[list(cols)].interpolate(method="linear", limit_direction="forward")

    for col in cols:
        if col in Schema.TS_NE_CORE_COLS + Schema.TS_NE_EDGE_COLS:
            df[col] = df[col].fillna(0) / 1e19
        elif col in Schema.TS_TE_CORE_COLS + Schema.TS_TE_EDGE_COLS:
            df[col] = df[col].fillna(0) / 1e3
    # positivity clamps on densities / temperatures / stored energy
    for col in cols:
        if any(tag in col for tag in ("TS_", "ne_", "WTOT")):
            df[col] = df[col].clip(lower=0)
    if "\\ipmhd" in df.columns:
        df["\\ipmhd"] = df["\\ipmhd"] / 1e6
    return df


def valid_shots(df: pd.DataFrame, cols: Sequence[str], min_duration: float = 2.0) -> List[int]:
    """Step 4: drop shots with >50% nulls, constant signals, or < 2 s span."""
    keep = []
    for shot in np.unique(df.shot.values):
        d = df[df.shot == shot]
        if len(d) == 0:
            continue
        if d.time.max() - d.time.min() < min_duration:
            continue
        sub = d[list(cols)]
        if (sub.isna().sum() > 0.5 * len(d)).any():
            continue
        if ((sub.max() - sub.min()) < 1e-3).any():
            continue
        keep.append(shot)
    return keep


def iqr_clip(x: np.ndarray, q_low: float = 15, q_high: float = 85,
             whisker: float = 1.25) -> np.ndarray:
    """Step 5: per-signal IQR outlier clipping (reference :147-162)."""
    lo, hi = np.nanpercentile(x, [q_low, q_high])
    iqr = hi - lo
    return np.clip(x, lo - whisker * iqr, hi + whisker * iqr)


def resample_shot(d: pd.DataFrame, cols: Sequence[str], tftsrt: float,
                  tipminf: float, dt: float) -> pd.DataFrame:
    """Step 6: cubic interpolation of every column onto the uniform grid
    [tftsrt - 4 dt, tipminf + 8 dt]."""
    from scipy.interpolate import interp1d

    t_raw = d.time.values.astype(np.float64)
    grid = np.arange(tftsrt - 4 * dt, tipminf + 8 * dt, dt)
    out = {"time": grid}
    for col in cols:
        y = np.nan_to_num(d[col].values.astype(np.float64))
        y = iqr_clip(y)
        if len(t_raw) >= 4:
            f = interp1d(t_raw, y, kind="cubic", bounds_error=False,
                         fill_value=(y[0], y[-1]))
        else:
            f = interp1d(t_raw, y, kind="linear", bounds_error=False,
                         fill_value=(y[0], y[-1]))
        out[col] = f(grid).astype(np.float32)
    return pd.DataFrame(out)


def engineer_features(df: pd.DataFrame) -> pd.DataFrame:
    """Step 7: Thomson averages, Greenwald fraction, vessel current."""
    df = df.copy()
    groups = {
        "\\TS_TE_CORE_AVG": [c for c in Schema.TS_TE_CORE_COLS if c in df.columns],
        "\\TS_TE_EDGE_AVG": [c for c in Schema.TS_TE_EDGE_COLS if c in df.columns],
        "\\TS_NE_CORE_AVG": [c for c in Schema.TS_NE_CORE_COLS if c in df.columns],
        "\\TS_NE_EDGE_AVG": [c for c in Schema.TS_NE_EDGE_COLS if c in df.columns],
    }
    for name, cs in groups.items():
        if cs:
            df[name] = df[cs].mean(axis=1)

    # Greenwald density nG = Ip[MA] / (pi a^2) [10^20 m^-3]; ratio vs line density
    ip = df["\\RC03"].abs() if "\\RC03" in df.columns else None
    if ip is not None and "\\aminor" in df.columns:
        a = df["\\aminor"].replace(0, np.nan)
        df["\\nG"] = ip / (np.pi * a ** 2)
        if "\\ne_inter01" in df.columns:
            df["\\ne_nG_ratio"] = (df["\\ne_inter01"] / df["\\nG"]).replace(
                [np.inf, -np.inf], np.nan).fillna(0)
    if "\\VCM03" in df.columns and "\\RC03" in df.columns:
        df["\\Iv"] = df["\\VCM03"] - df["\\RC03"]
    return df


def sync_video_0d(ts_df: pd.DataFrame, disrupt_df: pd.DataFrame,
                  fps: float = FPS) -> pd.DataFrame:
    """Video/0D synchronization table (rebuild of reference
    src/generate_sync_video_0D.py): one row per 0D sample with the matching
    camera frame index and the time distance to the quench, used for
    aligning legacy clip folders to table rows. The modern pipeline matches
    indices directly (data/windows.py:multimodal_windows); this table is
    kept for dataset auditing."""
    rows = []
    for shot in np.unique(ts_df.shot.values):
        if shot not in set(disrupt_df.shot.values.tolist()):
            continue
        r = disrupt_df[disrupt_df.shot == shot].iloc[0]
        d = ts_df[ts_df.shot == shot]
        t = d.time.values
        frame_idx = np.clip((t * fps).astype(int), 0, int(r.frame_cutoff))
        rows.append(pd.DataFrame({
            "shot": shot, "time": t, "frame_idx": frame_idx,
            "t_to_quench": float(r.tipminf) - t,
            "in_plasma": (t >= float(r.tftsrt)) & (t <= float(r.tipminf)),
        }))
    return pd.concat(rows, ignore_index=True) if rows else pd.DataFrame()


def build_0d_table(
    raw: pd.DataFrame,
    disrupt_df: pd.DataFrame,
    cols: Optional[Sequence[str]] = None,
    dt: float = DT_0D,
    fps: float = FPS,
) -> pd.DataFrame:
    """Full ETL: raw multi-rate dump -> uniform-dt engineered table
    (the reference's KSTAR_Disruption_ts_data_extend.csv, dt=4/210, or the
    5ms multimodal table with dt=1/210)."""
    cols = [c for c in (cols or [c for c in raw.columns if c.startswith("\\")])
            if c in raw.columns]
    raw = clean_signals(raw, cols)
    shots = [s for s in valid_shots(raw, cols)
             if s in set(disrupt_df.shot.values.tolist())]

    tables = []
    for shot in shots:
        row = disrupt_df[disrupt_df.shot == shot].iloc[0]
        d = raw[raw.shot == shot]
        res = resample_shot(d, cols, float(row.tftsrt), float(row.tipminf), dt)
        res = engineer_features(res)
        res.insert(0, "shot", shot)
        # step 8: frame index column
        res["frame_idx"] = np.maximum((res.time.values * fps).astype(int), 0)
        tables.append(res)
    return pd.concat(tables, ignore_index=True) if tables else pd.DataFrame()
