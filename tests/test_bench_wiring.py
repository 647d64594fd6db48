"""Wiring smoke test for bench.py's main() orchestration.

The heavy stages each get measured on the chip (and were, piecemeal,
when written); what has historically broken between rounds is the
ORCHESTRATION — a stage function's return arity changing under main()
(r05: bench_headline_and_decode grew a third return value), a new
artifact key wired to the wrong dict, the regression tripwire never
firing. This test runs the REAL main() with every hardware stage
monkeypatched to instant fakes and asserts the artifact-of-record
schema: one shot at the end of a round is too late to find a TypeError
in line 3 of main().
"""
import importlib
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(monkeypatch):
    monkeypatch.setenv("TS_BENCH_BACKEND_CHECKED", "1")
    sys.path.insert(0, REPO)
    mod = importlib.import_module("bench")
    yield mod


def test_main_artifact_schema(bench, monkeypatch, capsys):
    windows = [{"headline_fps": 400.0, "decode_fps": 450.0,
                "probe_ms": 27.5},
               {"headline_fps": 410.0, "decode_fps": 455.0,
                "probe_ms": 29.0}]
    monkeypatch.setattr(bench, "bench_headline_and_decode",
                        lambda lib: (410.0, 455.0, windows))
    monkeypatch.setattr(bench, "bench_transfer", lambda s: (1.0, 3000.0))
    monkeypatch.setattr(bench, "_bench_bulk",
                        lambda lib, s, resize: 500.0)
    monkeypatch.setattr(bench, "bench_device_vpp", lambda s: 8e6)
    monkeypatch.setattr(bench, "bench_device_augment", lambda s: 4e6)
    # pool_aggregate deliberately BELOW 0.2x its BENCH_BEST counterpart
    # (571.5 in the committed best): the tripwire must fire.
    monkeypatch.setattr(bench, "bench_pool_aggregate",
                        lambda lib, s: 6.3)
    monkeypatch.setattr(bench, "bench_segment_parallel",
                        lambda lib, s: 240.0)
    monkeypatch.setattr(bench, "bench_decode_only",
                        lambda lib, s, *a: 250.0)
    monkeypatch.setattr(bench, "bench_fast_read_latency",
                        lambda lib: {"fast_read_p50_ms": 2.4,
                                     "fast_read_p95_ms": 5.0,
                                     "fast_read_p99_ms": 7.0,
                                     "fast_read_tail_ok": True})
    monkeypatch.setattr(bench, "bench_clip_sampling",
                        lambda lib, s, mode: (180.0, 0.85))
    monkeypatch.setattr(
        bench, "bench_serving",
        lambda s, **kw: (400.0, {"p50": 0.05, "p95": 0.1}))
    monkeypatch.setattr(bench, "_loader_window", lambda s: 390.0)
    monkeypatch.setattr(bench, "bench_serving_stream_model",
                        lambda s: {"serving_model_steps_per_s": 10.0,
                                   "serving_model_kv_ratio": 3.0})
    monkeypatch.setattr(bench, "bench_vit_train",
                        lambda: {"vit_train_mfu": 0.43})
    monkeypatch.setattr(bench, "bench_vit_train_joint",
                        lambda: {"vit_joint_mfu": 0.25})
    monkeypatch.setattr(bench, "probe_link", lambda *a: 27.5)
    monkeypatch.setattr(bench, "bench_scaling",
                        lambda lib: {"cpu_cores": 1, "skipped": "1 core"})
    persisted = []
    monkeypatch.setattr(bench, "_persist_best", persisted.append)

    result = bench.main()

    # The printed artifact is ONE parseable JSON line (driver contract).
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line) == result
    assert result["metric"] == \
        "1080p_decode_to_224px_rgb_planar_f32_fps_per_chip"
    assert result["value"] == 410.0
    assert result["vs_baseline"] == round(410.0 / 2000.0, 4)
    # Per-window evidence rides the artifact (r04 verdict item 5).
    assert result["windows"] == windows
    st = result["stages"]
    assert st["loader_efficiency_vs_decode"] == round(410.0 / 455.0, 3)
    assert st["serving_vs_adjacent_loader"] == round(400.0 / 390.0, 3)
    assert st["serving_model_kv_ratio"] == 3.0
    assert "error" not in json.dumps(st)  # every faked stage landed
    assert result["link"]["degraded"] is False
    assert persisted == [result]
    # Regression tripwire (r04 verdict item 1): pool_aggregate at 6.3
    # vs a committed best of 571.5 must produce an explicit entry.
    regressed = {r["stage"] for r in result.get("regressions", [])}
    assert "pool_aggregate_fps" in regressed


def test_stage_regressions_semantics(bench):
    best = json.load(open(os.path.join(REPO, "BENCH_BEST.json")))
    ref = best["stages"]["decode_fps"]
    # Latency keys and flags never trip; throughput below the floor does.
    stages = {"decode_fps": 0.1 * ref,
              "fast_read_p50_ms": 1e9,      # _ms: skipped by design
              "fast_read_tail_ok": False,   # bool: skipped by design
              "brand_new_stage": 0.0}       # no baseline: skipped
    hits = {r["stage"] for r in bench._stage_regressions(stages)}
    assert hits == {"decode_fps"}
    assert bench._stage_regressions({"decode_fps": ref}) == []
