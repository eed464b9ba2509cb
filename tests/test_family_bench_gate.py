"""Unit tests for the family-bench regression gate (VERDICT r2 #6) —
the diff logic itself, no Spark session needed."""

from __future__ import annotations

import json

from tools.family_bench import NOISE_FLOOR_SEC, REGRESSION_FACTOR, _previous


def test_previous_flattens_families(tmp_path):
    p = tmp_path / "FAMILY_BENCH.json"
    p.write_text(
        json.dumps(
            {
                "graph": {"queries": {"a": 1.0, "b": 2.0}, "total_sec": 3.0},
                "ann": {"queries": {"c": 0.5}, "total_sec": 0.5},
                "regressions": [{"query": "a"}],
            }
        )
    )
    flat, cal = _previous(str(p))
    assert flat == {"a": 1.0, "b": 2.0, "c": 0.5}
    # no probe recorded -> falls back to bench.py's pinned reference
    from bench import _CAL_REF_MT_SEC

    assert cal == _CAL_REF_MT_SEC


def test_previous_missing_or_corrupt(tmp_path):
    assert _previous(str(tmp_path / "absent.json"))[0] == {}
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert _previous(str(bad))[0] == {}


def test_gate_thresholds_are_sane():
    # a 1.5x factor above a 0.4 s floor: sub-noise queries never trip
    assert REGRESSION_FACTOR == 1.5
    assert NOISE_FLOOR_SEC == 0.4
    was, now = 1.0, 1.6
    assert now > REGRESSION_FACTOR * was and now > NOISE_FLOOR_SEC
    was, now = 0.1, 0.39  # 3.9x slower but under the noise floor
    assert not (now > NOISE_FLOOR_SEC and now > REGRESSION_FACTOR * was)


def test_previous_reads_recorded_calibration(tmp_path):
    p = tmp_path / "FAMILY_BENCH.json"
    p.write_text(
        json.dumps(
            {
                "graph": {"queries": {"a": 1.0}, "total_sec": 1.0},
                "calibration_mt_sec": 0.9,
            }
        )
    )
    flat, cal = _previous(str(p))
    assert flat == {"a": 1.0}
    assert cal == 0.9
