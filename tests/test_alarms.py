"""Shot-level alarm evaluation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from kstar_tpu.data import VideoStore
from kstar_tpu.eval import evaluate_video_alarms, threshold_sweep


class BrightnessModel(nn.Module):
    """p_disrupt rises with frame brightness — fires near the synthetic quench."""

    @nn.compact
    def __call__(self, x, train=False):
        b = self.param("b", nn.initializers.zeros, (1,))
        # normalized frame means: ~-47 mid-shot, ~+4 at the pre-quench flash
        m = (x.astype(jnp.float32).mean(axis=(1, 2, 3, 4)) + 25.0) / 8.0 + b[0]
        return jnp.stack([m, -m], axis=-1)


@pytest.fixture(scope="module")
def alarm_setup():
    # shots longer than the 1 s startup-suppression window
    from kstar_tpu.data import synthetic
    shots, disrupt_df, _ = synthetic.make_dataset(n_shots=4, n_frames=640,
                                                  height=32, width=32, seed=3)
    store = VideoStore.from_arrays({s.shot: s.frames for s in shots})
    model = BrightnessModel()
    v = model.init(jax.random.key(0), jnp.zeros((1, 8, 16, 16, 3)))
    return model, v, store, disrupt_df, [s.shot for s in shots]


class TestAlarmEvaluation:
    def test_per_shot_and_summary(self, alarm_setup):
        model, v, store, disrupt_df, shots = alarm_setup
        res = evaluate_video_alarms(
            model, v["params"], {}, store, disrupt_df, shots,
            seq_len=8, dist=3, crop_size=32, batch_size=32,
            threshold=0.5, t_min=0.2, compute_dtype=jnp.float32)
        per_shot, summary = res["per_shot"], res["summary"]
        assert len(per_shot) == len(shots)
        assert summary["n_shots"] == len(shots)
        assert summary["detected"] + summary["missed"] == len(shots)
        # the synthetic flash precedes the quench: the brightness model
        # should detect most shots with positive warning time
        assert summary["detection_rate"] >= 0.5
        warns = per_shot.warning_s.dropna()
        assert (warns >= 0).all()

    def test_threshold_sweep_monotone(self, alarm_setup):
        model, v, store, disrupt_df, shots = alarm_setup
        df = threshold_sweep(model, v["params"], {}, store, disrupt_df, shots,
                             thresholds=(0.3, 0.6, 0.9), seq_len=8, dist=3,
                             crop_size=32, batch_size=32, t_min=0.2,
                             compute_dtype=jnp.float32)
        assert len(df) == 3
        # detection rate cannot increase with a stricter threshold
        assert (np.diff(df.detection_rate.values) <= 1e-9).all()
