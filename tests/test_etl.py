"""ETL tests: shot-log extension, 0D table building, profiles."""

import numpy as np
import pandas as pd
import pytest

from kstar_tpu.config import FPS, Schema
from kstar_tpu.data.profiles import get_profile
from kstar_tpu.data.shotlog import (detect_cutoff, detect_startup,
                                    extend_shot_log, extend_shot_row,
                                    mean_brightness)
from kstar_tpu.data.ts_pipeline import (build_0d_table, clean_signals,
                                        engineer_features, iqr_clip,
                                        resample_shot, valid_shots)


class TestShotLog:
    def test_startup_cutoff_detection(self, tiny_dataset):
        shots, disrupt_df, _ = tiny_dataset
        s = shots[0]
        b = mean_brightness(s.frames)
        srt = detect_startup(b)
        cut = detect_cutoff(b, start=srt + 1)
        # detection should land near the synthesized startup/cutoff
        assert abs(srt - s.frame_startup) <= 12
        assert abs(cut - s.frame_cutoff) <= 12

    def test_extend_rows(self, tiny_dataset):
        shots, _, _ = tiny_dataset
        log = extend_shot_log({s.shot: s.frames for s in shots[:3]})
        assert len(log) == 3
        assert (log.frame_tipminf == log.frame_cutoff - 1).all()
        assert set(log.columns) >= {"shot", "tftsrt", "tTQend", "tipminf",
                                    "frame_startup", "frame_cutoff",
                                    "frame_tTQend", "frame_tipminf"}


class TestTSPipeline:
    def _raw(self, n_shots=2, n=400, seed=0):
        rng = np.random.default_rng(seed)
        rows = []
        for i in range(n_shots):
            t = np.sort(rng.uniform(0, 4, n))
            df = pd.DataFrame({
                "shot": 100 + i, "time": t,
                "\\q95": 3 + np.sin(t) + rng.normal(0, 0.05, n),
                "\\ipmhd": -(0.4 + 0.05 * t) * 1e6,   # raw units: A, negative
                "\\RC03": 0.6 + 0.1 * t,
                "\\aminor": 0.5 + 0.01 * np.cos(t),
                "\\VCM03": 0.7 + 0.1 * t,
                "\\ne_inter01": 2 + 0.2 * t,
            })
            df.loc[rng.choice(n, 10, replace=False), "\\q95"] = np.nan
            rows.append(df)
        return pd.concat(rows, ignore_index=True)

    def test_clean_and_valid(self):
        raw = self._raw()
        cols = ["\\q95", "\\RC03", "\\aminor"]
        cleaned = clean_signals(raw, cols)
        assert cleaned["\\q95"].isna().sum() <= 1  # leading NaNs may remain
        assert valid_shots(cleaned, cols) == [100, 101]

    def test_iqr_clip(self):
        x = np.r_[np.zeros(100), 1e6]
        out = iqr_clip(x)
        assert out.max() < 1e6

    def test_resample_uniform_grid(self):
        raw = self._raw(1)
        d = raw[raw.shot == 100]
        res = resample_shot(d, ["\\q95"], tftsrt=0.5, tipminf=3.5, dt=0.01)
        dt = np.diff(res.time.values)
        np.testing.assert_allclose(dt, 0.01, atol=1e-9)
        assert np.isfinite(res["\\q95"].values).all()

    def test_engineer_features(self):
        raw = self._raw(1)
        out = engineer_features(raw)
        assert "\\nG" in out.columns and "\\ne_nG_ratio" in out.columns
        assert "\\Iv" in out.columns
        np.testing.assert_allclose(out["\\Iv"], raw["\\VCM03"] - raw["\\RC03"])
        # nG = Ip / (pi a^2), ratio scaled by 0.1 (reference :220-221)
        np.testing.assert_allclose(
            out["\\nG"], raw["\\ipmhd"] / np.pi / raw["\\aminor"] ** 2)
        np.testing.assert_allclose(
            out["\\ne_nG_ratio"], raw["\\ne_inter01"] / out["\\nG"] * 0.1)

    def test_build_table_end_to_end(self):
        raw = self._raw(2)
        disrupt = pd.DataFrame({"shot": [100, 101], "tftsrt": [0.5, 0.5],
                                "tipminf": [3.5, 3.5]})
        table = build_0d_table(raw, disrupt, dt=0.02)
        assert set(table.shot.unique()) == {100, 101}
        assert "frame_idx" in table.columns
        assert np.isfinite(table["\\q95"].values).all()


class TestProfiles:
    def test_profile_interpolation(self):
        vals = np.linspace(1, 2, 27)
        prof = get_profile(vals, n_points=64)
        assert prof.shape == (64,)
        assert prof.min() >= 0.1 and prof.max() <= 1e2

    def test_profile_batch(self):
        vals = np.random.default_rng(0).uniform(0.5, 3, (5, 27))
        prof = get_profile(vals, n_points=32)
        assert prof.shape == (5, 32)

    def test_profile_tensor_missing_channel_keeps_radii(self):
        """A missing Thomson channel must drop ITS radius, not shift every
        later channel onto an earlier radius (regression: a RADIUS prefix
        slice silently misassigned core radii to edge channels)."""
        import pandas as pd

        from kstar_tpu.config import Schema
        from kstar_tpu.data.profiles import profile_tensor

        cols = Schema.TS_TE_CORE_COLS + Schema.TS_TE_EDGE_COLS[1:]
        radius = np.asarray(Schema.RADIUS, np.float64)
        # profile = its own radius, so interpolation is near-identity
        full = pd.DataFrame({c: [r, r] for c, r in zip(cols, radius)})
        missing = full.drop(columns=[cols[5]])

        p_full = profile_tensor(full, "te", n_points=27)
        p_miss = profile_tensor(missing, "te", n_points=27)
        # both reconstruct ~the radius axis; the gap is interpolated, and
        # channels after it stay at their true radii
        assert np.allclose(p_full[0], np.linspace(radius[0], radius[-1], 27),
                           atol=1e-6)
        assert np.allclose(p_miss[0], p_full[0], atol=0.02)
