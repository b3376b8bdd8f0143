"""bench.py regression guard: the round-7 verdict found the guard silently
skipping because the newest driver artifact BENCH_r{N}.json was
stdout-truncated ("parsed": null). These tests pin the fallback to the
builder's own truncation-proof BENCH/r{N}.json copy — no Spark needed."""

import json
import os

import bench


def _write(dirpath, name, payload):
    with open(os.path.join(dirpath, name), "w") as f:
        json.dump(payload, f)


def _guard(tmp_path, monkeypatch, timings, sf_dir="/root/testdata/sf0.1"):
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", sf_dir)
    return bench._regressions_vs_previous(timings, here=str(tmp_path))


def test_fallback_to_local_copy_when_driver_artifact_truncated(tmp_path, monkeypatch):
    _write(tmp_path, "BENCH_r07.json", {"n": 7, "parsed": None, "tail": "trunc"})
    os.makedirs(tmp_path / "BENCH")
    _write(
        tmp_path / "BENCH",
        "r07.json",
        {"sf": "0.1", "queries": {"full_pipeline": 2.0, "funnel": 0.8}},
    )
    out = _guard(tmp_path, monkeypatch, {"full_pipeline": 3.0, "funnel": 0.81})
    assert out["vs"] == os.path.join("BENCH", "r07.json")
    assert "skipped" not in out
    # >10% AND >0.3s flags; a 0.01s wobble does not
    assert list(out["flagged"]) == ["full_pipeline"]
    assert out["flagged"]["full_pipeline"]["prev"] == 2.0


def test_newest_round_wins_for_fallback(tmp_path, monkeypatch):
    _write(tmp_path, "BENCH_r07.json", {"n": 7, "parsed": None})
    _write(tmp_path, "BENCH_r08.json", {"n": 8, "parsed": None})
    os.makedirs(tmp_path / "BENCH")
    _write(tmp_path / "BENCH", "r07.json", {"sf": "0.1", "queries": {"funnel": 9.0}})
    _write(tmp_path / "BENCH", "r08.json", {"sf": "0.1", "queries": {"funnel": 1.0}})
    out = _guard(tmp_path, monkeypatch, {"funnel": 2.0})
    assert out["vs"] == os.path.join("BENCH", "r08.json")
    assert out["flagged"]["funnel"]["prev"] == 1.0


def test_driver_artifact_used_when_parseable(tmp_path, monkeypatch):
    _write(
        tmp_path,
        "BENCH_r07.json",
        {"n": 7, "parsed": {"sf": "0.1", "queries": {"funnel": 1.0}}},
    )
    out = _guard(tmp_path, monkeypatch, {"funnel": 1.01})
    assert out["vs"] == "BENCH_r07.json"
    assert out["flagged"] == {}


def test_sf_mismatch_still_skips_on_fallback(tmp_path, monkeypatch):
    _write(tmp_path, "BENCH_r07.json", {"n": 7, "parsed": None})
    os.makedirs(tmp_path / "BENCH")
    _write(tmp_path / "BENCH", "r07.json", {"sf": "0.1", "queries": {"funnel": 1.0}})
    out = _guard(
        tmp_path, monkeypatch, {"funnel": 9.9}, sf_dir="/root/testdata/sf0.01"
    )
    assert out["flagged"] == {}
    assert "sf mismatch" in out["skipped"]


def test_unreadable_everywhere_reports_error(tmp_path, monkeypatch):
    _write(tmp_path, "BENCH_r07.json", {"n": 7, "parsed": None})
    out = _guard(tmp_path, monkeypatch, {"funnel": 1.0})
    assert out["flagged"] == {}
    assert "error" in out
