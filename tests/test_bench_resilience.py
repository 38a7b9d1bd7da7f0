"""bench.py must ALWAYS emit one parseable JSON line, whatever arm fails
(round-3 verdict weak #1 + round-4 review: the baseline arm had the same
artifact-zeroing failure mode as the TPU arm)."""

import io
import json
import os
import sys

import pytest


@pytest.fixture
def bench(monkeypatch, tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import bench as b

    # no cross-talk with the machine's real cache; fast retries
    monkeypatch.setattr(b, "BASELINE_FILE", str(tmp_path / "b.json"))
    monkeypatch.setattr(b, "RETRY_BACKOFF_S", 0)
    yield b


def _run_main(bench, capsys):
    bench.main()
    out = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert len(out) == 1, "exactly one JSON line"
    return json.loads(out[0])


TPU_OK = {"clips_per_s": 20000.0, "stream_p50_ms": 4.0, "f1": 0.92}
BASE_OK = {"version": None, "torch_cpu_clips_per_s": 21.6, "torch_cpu_f1": 0.89}


def test_baseline_arm_failure_still_emits_json(bench, capsys, monkeypatch):
    def worker(mode, env_extra=None):
        if mode == "baseline":
            raise RuntimeError("torch baseline crashed")
        return dict(TPU_OK)

    monkeypatch.setattr(bench, "_run_worker", worker)
    rec = _run_main(bench, capsys)
    assert rec["value"] == 20000.0
    assert rec["vs_baseline"] is None
    assert "baseline_error" in rec["extras"]
    assert rec["extras"]["hard_fixture_test_f1"] == 0.92


def test_both_arms_fail_still_emits_json(bench, capsys, monkeypatch):
    def worker(mode, env_extra=None):
        raise RuntimeError(f"{mode} arm down")

    monkeypatch.setattr(bench, "_run_worker", worker)
    rec = _run_main(bench, capsys)
    assert rec["value"] is None and rec["vs_baseline"] is None
    assert "error" in rec["extras"] and "baseline_error" in rec["extras"]


def test_tpu_failure_with_cached_baseline(bench, capsys, monkeypatch):
    base = dict(BASE_OK, version=bench.BASELINE_VERSION)
    with open(bench.BASELINE_FILE, "w") as f:
        json.dump(base, f)

    calls = {"tpu": 0}

    def worker(mode, env_extra=None):
        if mode == "tpu":
            calls["tpu"] += 1
            raise RuntimeError("backend init failed")
        return {"f1": 0.91}      # f1cpu fallback

    monkeypatch.setattr(bench, "_run_worker", worker)
    rec = _run_main(bench, capsys)
    assert rec["value"] is None
    assert calls["tpu"] == bench.TPU_ATTEMPTS          # bounded retries ran
    assert rec["extras"]["hard_fixture_test_f1_cpu"] == 0.91
    assert rec["extras"]["torch_cpu_max_sustained_fps"] == 21.6


def test_happy_path_json_shape(bench, capsys, monkeypatch):
    base = dict(BASE_OK, version=bench.BASELINE_VERSION)
    with open(bench.BASELINE_FILE, "w") as f:
        json.dump(base, f)
    monkeypatch.setattr(bench, "_run_worker",
                        lambda mode, env_extra=None: dict(TPU_OK))
    rec = _run_main(bench, capsys)
    assert rec["metric"] == "continuous_inference_clips_per_sec"
    assert rec["value"] == 20000.0
    assert rec["vs_baseline"] == round(20000.0 / 21.6, 2)
    assert rec["extras"]["hard_fixture_torch_cpu_f1"] == 0.89


def test_stale_cache_version_rejected(bench, tmp_path):
    with open(bench.BASELINE_FILE, "w") as f:
        json.dump(dict(BASE_OK, version=-1), f)
    assert bench._load_cached_baseline() is None
    # missing required key also rejected (shared BASELINE_KEYS contract)
    with open(bench.BASELINE_FILE, "w") as f:
        json.dump({"version": bench.BASELINE_VERSION,
                   "torch_cpu_clips_per_s": 21.6}, f)
    assert bench._load_cached_baseline() is None
