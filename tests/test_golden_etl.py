"""Golden ETL parity: run the REFERENCE ts_interpolate on a raw-format
fixture (full MDSplus column grammar, NaN/inf patches, multi-shot) and
assert build_0d_table emits a value-identical table — dt grids, unit
scalings, IQR clipping, cubic resampling, engineered features, frame_idx.

This closes the round-1 gap: the rebuilt pipeline had only ever been run on
its own synthetic outputs (VERDICT.md missing #1).
"""

import os
import sys

import numpy as np
import pandas as pd
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")

FPS = 210.0
DT = 4 / FPS


@pytest.fixture(scope="module")
def ref_gen_mod():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    return importlib.import_module("src.generate_numerical_data")


@pytest.fixture()
def legacy_fillna():
    """The reference targets pandas 1.x (`fillna(method='ffill')`, removed in
    pandas 2) — shim the old signature while the reference code runs."""
    orig = pd.DataFrame.fillna

    def fillna(self, value=None, *, method=None, **kw):
        if method is not None:
            return self.ffill(**kw) if method in ("ffill", "pad") else self.bfill(**kw)
        return orig(self, value, **kw)

    pd.DataFrame.fillna = fillna
    try:
        yield
    finally:
        pd.DataFrame.fillna = orig


def _signal_columns(config) -> list:
    return (config.DEFAULT_COLS + config.LM + config.HCM + config.DL
            + config.LV + config.RC + config.TCI + config.HA + config.TS)


def make_raw_fixture(config):
    """Raw multi-rate dump in the reference's exact format: one row per 5 ms
    sample, every MDSplus column from the schema, pre-scaling units
    (Ne ~ 1e19, Te ~ 1e3, Ip ~ -1e6, HA ~ 1e18, RC ~ 1e6), NaN patches and a
    few infs, plus one invalid shot (constant q95)."""
    rng = np.random.default_rng(7)
    frames = []
    shots = {
        # shot: (t_flattop_start, t_tmq, t_ip_min_fault, n_rows)
        31001: (0.8, 3.20, 3.30, 720),
        31002: (0.7, 2.90, 3.05, 680),
        31003: (0.8, 3.20, 3.30, 720),   # invalid: constant q95
    }
    cols = _signal_columns(config)
    for shot, (tft, ttq, tip, n) in shots.items():
        t = np.arange(n) * 0.005
        d = {"shot": shot, "time": t}
        for col in cols:
            base = rng.uniform(0.5, 2.0)
            wander = np.cumsum(rng.normal(0, 0.02, n))
            sig = base + 0.3 * np.sin(t * rng.uniform(1, 4)) + wander
            if col in config.TS_NE_CORE_COLS + config.TS_NE_EDGE_COLS:
                sig = np.abs(sig) * 1e19
            elif col in config.TS_TE_CORE_COLS + config.TS_TE_EDGE_COLS:
                sig = np.abs(sig) * 1e3
            elif col == "\\ipmhd":
                sig = -np.abs(sig) * 0.4e6        # negative, ~MA after scaling
            elif col in config.HA:
                sig = np.abs(sig) * 1e18
            elif col in ("\\RC03", "\\VCM03"):
                sig = -np.abs(sig) * 1e6
            elif col in ("\\RCPPU1", "\\RCPPL1"):
                sig = np.abs(sig) * 1e6
            elif col == "\\BETAP_DLM03":
                sig = sig + 1.5                    # exercises the |x|<=2 bound
            d[col] = sig
        if shot == 31003:
            d["\\q95"] = np.full(n, 3.0)          # constant -> rejected
        frames.append(pd.DataFrame(d))
    raw = pd.concat(frames, ignore_index=True)

    # NaN patches mid-shot (forward interpolation) and a few infs
    raw.loc[100:120, "\\LM01"] = np.nan
    raw.loc[300:310, "\\q95"] = np.nan
    raw.loc[840:860, "\\TS_CORE1:CORE1_TE"] = np.nan
    raw.loc[50, "\\DLM01"] = np.inf
    raw.loc[51, "\\DLM01"] = -np.inf

    disrupt = pd.DataFrame({
        "shot": list(shots.keys()),
        "t_flattop_start": [v[0] for v in shots.values()],
        "t_tmq": [v[1] for v in shots.values()],
        "t_ip_min_fault": [v[2] for v in shots.values()],
    })
    return raw, disrupt


def test_build_0d_table_matches_reference(ref_gen_mod, legacy_fillna):
    from kstar_tpu.data.ts_pipeline import build_0d_table

    config = ref_gen_mod.config
    raw, disrupt = make_raw_fixture(config)
    sig_cols = [c for c in raw.columns if c not in ("shot", "time")]

    # the reference function reads the interpolation column list from a
    # module-level global set by its __main__ block — inject it
    ref_gen_mod.cols = sig_cols
    ref_table, _ = ref_gen_mod.ts_interpolate(raw.copy(), disrupt.copy(), DT)
    ref_table["frame_idx"] = ref_table.time.apply(lambda x: int(round(x * FPS)))

    got = build_0d_table(raw.copy(), disrupt.copy(), cols=sig_cols, dt=DT)

    # shot selection: 31003 rejected (constant q95)
    assert sorted(np.unique(ref_table.shot)) == [31001, 31002]
    assert sorted(np.unique(got.shot)) == sorted(np.unique(ref_table.shot))
    assert len(got) == len(ref_table)

    np.testing.assert_allclose(got.time.values, ref_table.time.values,
                               rtol=0, atol=1e-12)
    np.testing.assert_array_equal(got.frame_idx.values,
                                  ref_table.frame_idx.values)

    engineered = ["\\TS_NE_CORE_AVG", "\\TS_NE_EDGE_AVG", "\\TS_TE_CORE_AVG",
                  "\\TS_TE_EDGE_AVG", "\\nG", "\\ne_nG_ratio", "\\Iv"]
    for col in sig_cols + engineered:
        assert col in got.columns, f"missing column {col}"
        np.testing.assert_allclose(
            got[col].values, ref_table[col].values,
            rtol=1e-7, atol=1e-10, equal_nan=True,
            err_msg=f"column {col} diverges from reference ts_interpolate")


def test_grid_and_windows(ref_gen_mod):
    """The dt grid spans [tftsrt - 4 dt, tipminf + 8 dt] inclusive."""
    from kstar_tpu.data.ts_pipeline import build_0d_table

    config = ref_gen_mod.config
    raw, disrupt = make_raw_fixture(config)
    got = build_0d_table(raw, disrupt, dt=DT)
    d = got[got.shot == 31001]
    assert abs(d.time.iloc[0] - (0.8 - 4 * DT)) < 1e-9
    # grid = arange(t_start, tipminf + 8dt + dt, dt): last point lands within
    # one dt past tipminf + 8dt (the reference's inclusive-endpoint idiom)
    assert d.time.iloc[-1] <= 3.30 + 9 * DT + 1e-9
    assert d.time.iloc[-1] >= 3.30 + 7 * DT
    steps = np.diff(d.time.values)
    assert np.allclose(steps, DT, atol=1e-9)
