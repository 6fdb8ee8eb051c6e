"""Unit tests for bench.py's outlier gate (no Spark session needed).

Round-6 postmortem: text_lm_score shipped at 23.9 s against a ~0.6 s
registry median because bench.py only checked ``n_failed == 0`` — a
CodegenFallback regression class that a per-key ratio gate catches
for free.  ``find_outliers`` is the pure function behind that gate.
"""

import bench


def test_no_outliers_on_uniform_timings():
    timings = {f"q{i}": 1.0 + i * 0.01 for i in range(20)}
    assert bench.find_outliers(timings) == {}


def test_flags_single_10x_key():
    timings = {f"q{i}": 0.6 for i in range(30)}
    timings["text_lm_score"] = 23.9  # the round-6 regression, verbatim
    out = bench.find_outliers(timings)
    assert set(out) == {"text_lm_score"}
    assert out["text_lm_score"] > 30  # 23.9 / 0.6 ≈ 39.8x


def test_boundary_is_strictly_greater_than_factor():
    # exactly FACTOR x median must NOT flag (gate is >, not >=)
    timings = {f"q{i}": 1.0 for i in range(10)}
    timings["edge"] = bench.OUTLIER_FACTOR * 1.0
    assert bench.find_outliers(timings) == {}
    timings["edge"] = bench.OUTLIER_FACTOR * 1.0 + 0.001
    assert set(bench.find_outliers(timings)) == {"edge"}


def test_failed_keys_excluded_from_median_and_flagging():
    timings = {f"q{i}": 1.0 for i in range(10)}
    timings["broken"] = -1.0  # failure sentinel
    assert bench.find_outliers(timings) == {}


def test_too_few_keys_returns_empty():
    assert bench.find_outliers({"a": 1.0, "b": 100.0}) == {}


def test_zero_median_returns_empty():
    timings = {f"q{i}": 0.0 for i in range(10)}
    timings["slow"] = 5.0
    assert bench.find_outliers(timings) == {}


def test_even_count_median_is_midpoint():
    # even count: median of sorted [1,1,3,19] = (1+3)/2 = 2.0, so the
    # threshold is 20.0 — 19.0 passes, 21.0 flags (and the midpoint
    # median is what makes 19.0 pass: the odd-branch median of either
    # neighbor, 1.0 or 3.0, would give a different verdict)
    timings = {"a": 1.0, "b": 1.0, "c": 3.0, "d": 19.0}
    assert bench.find_outliers(timings) == {}
    timings["d"] = 21.0
    assert set(bench.find_outliers(timings)) == {"d"}


def test_odd_count_median_is_middle_element():
    # odd count: median of sorted [1,1,3,3,31] = 3.0; 31.0 > 30 flags
    timings = {"a": 1.0, "b": 1.0, "c": 3.0, "d": 3.0, "e": 31.0}
    assert set(bench.find_outliers(timings)) == {"e"}
    timings["e"] = 29.0  # <= 10x the 3.0 median: clean
    assert bench.find_outliers(timings) == {}


def test_exempt_keys_skip_flagging(monkeypatch):
    timings = {f"q{i}": 1.0 for i in range(10)}
    timings["known_slow"] = 50.0
    monkeypatch.setattr(
        bench, "OUTLIER_EXEMPT", frozenset({"known_slow"})
    )
    assert bench.find_outliers(timings) == {}


# --- condition-split artifacts (round-12: settled vs ambient paths) ------


def test_artifact_path_routes_by_condition():
    assert bench.artifact_path("/x", "settled") == "/x/BENCH_settled_latest.json"
    assert bench.artifact_path("/x", "ambient") == "/x/BENCH_full_latest.json"
    # any non-settled condition routes to the ambient path
    assert bench.artifact_path("/x", "weird") == "/x/BENCH_full_latest.json"


def test_condition_write_allowed(tmp_path):
    import json

    p = tmp_path / "a.json"
    # missing file: allowed
    assert bench.condition_write_allowed(str(p), "settled")
    # same condition: allowed (normal overwrite of own record)
    p.write_text(json.dumps({"condition": "settled"}))
    assert bench.condition_write_allowed(str(p), "settled")
    # different condition: refused — the r10/r11 shadowing bug
    assert not bench.condition_write_allowed(str(p), "ambient")
    # unstamped or unreadable artifacts don't block
    p.write_text(json.dumps({"metric": "x"}))
    assert bench.condition_write_allowed(str(p), "ambient")
    p.write_text("not json")
    assert bench.condition_write_allowed(str(p), "settled")


def test_committed_settled_record_is_condition_stamped():
    """The settled record at its dedicated path must be stamped
    condition=='settled' and carry the envelope probes — the driver's
    ambient post-close run can then never masquerade as (or clobber)
    the steady-state record."""
    import json
    import os

    path = bench.artifact_path(
        os.path.dirname(os.path.abspath(bench.__file__)), "settled"
    )
    assert os.path.exists(path), "settled record missing at HEAD"
    with open(path) as f:
        rec = json.load(f)
    assert rec["condition"] == "settled"
    assert rec["repeat"] >= 3
    probes = rec["envelope_probe"]
    assert set(probes) == {"before", "after"}
    for side in probes.values():
        assert set(side) == set(bench.ENVELOPE_PROBE_KEYS)
        assert all(v > 0 for v in side.values())


def test_probe_keys_are_registered():
    from downloader_spark.plans.registry import registry

    reg = registry()
    for k in bench.ENVELOPE_PROBE_KEYS:
        assert k in reg
