"""Regression tests for bench.py's best-of-round fold (judge r9 item 3).

The r9 driver artifact published a host-noise regression (+50.2s) that
the round's two sibling runs disproved; the fold makes the ledger's
vs_prev base and the published per-query timings min-per-query across
all same-round BENCH_SELF entries, so a single contended pass can't
manufacture a phantom regression.  No Spark session needed — the fold
is pure artifact plumbing.
"""

import json

import bench


def _entry(rounds_seen, queries, sf=0.1, metric="headline_queries_wall",
           **extra):
    d = {"metric": metric, "value": round(sum(queries.values()), 3),
         "unit": "sec", "queries": queries, "sf": sf,
         "rounds_seen": rounds_seen, "runs_per_query": 2}
    d.update(extra)
    return d


def test_prev_round_fold_takes_min_across_entries(tmp_path, monkeypatch):
    """vs_prev base = per-query min across ALL prev-round entries, not
    whichever single entry the driver sampled last."""
    lines = [
        _entry(8, {"q1": 1.0, "q2": 5.0}),          # clean run
        _entry(8, {"q1": 3.5, "q2": 2.0}),          # contended on q1
        _entry(7, {"q1": 0.1, "q2": 0.1}),          # older round: ignored
        _entry(8, {"q1": 9.9, "q2": 9.9}, sf=0.001),  # other sf: ignored
        _entry(8, {"q1": 0.01}, metric="q1_solo_remeasure"),  # solo: ignored
    ]
    (tmp_path / "BENCH_SELF.jsonl").write_text(
        "".join(json.dumps(d) + "\n" for d in lines))
    (tmp_path / "BENCH_r09.json").write_text(json.dumps({"sf": 0.1}))
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))

    src, prev = bench._latest_bench_artifact(0.1)
    assert prev["queries"] == {"q1": 1.0, "q2": 2.0}
    assert prev["value"] == 3.0
    assert prev["folded_entries"] == 2
    assert "BENCH_SELF" in src


def test_prev_round_fold_unions_grown_headline_set(tmp_path, monkeypatch):
    """Mid-round headline growth: a name present in only one entry
    still contributes its timing to the folded base."""
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    (tmp_path / "BENCH_r09.json").write_text("{}")
    lines = [
        _entry(8, {"q1": 2.0}),
        _entry(8, {"q1": 1.5, "q_new": 4.0}),
    ]
    (tmp_path / "BENCH_SELF.jsonl").write_text(
        "".join(json.dumps(d) + "\n" for d in lines))
    src, prev = bench._latest_bench_artifact(0.1)
    assert prev["queries"] == {"q1": 1.5, "q_new": 4.0}
    assert prev["value"] == 5.5


def test_same_round_entries_filter(tmp_path, monkeypatch):
    """_same_round_entries returns only this round's headline entries
    at the same sf (the publication-side fold's input)."""
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    (tmp_path / "BENCH_r09.json").write_text("{}")
    lines = [
        _entry(9, {"q1": 1.0}),                      # this round
        _entry(8, {"q1": 0.5}),                      # previous round
        _entry(9, {"q1": 0.2}, sf=0.001),            # other sf
        _entry(9, {"q1": 0.1}, metric="x_solo_remeasure"),
    ]
    (tmp_path / "BENCH_SELF.jsonl").write_text(
        "".join(json.dumps(d) + "\n" for d in lines))
    got = bench._same_round_entries(0.1)
    assert [e["queries"] for e in got] == [{"q1": 1.0}]


def test_publication_fold_respects_source_hash():
    """The publication-side fold only inherits a same-round timing when
    the entry's recorded qhash matches the current source hash — a
    mid-round plan edit must re-earn its number.  (Mirrors the inline
    fold loop in main(); exercised here as the loop's exact logic.)"""
    timings = {"qa": 3.0, "qb": 3.0}
    qhash = {"qa": "aaa", "qb": "bbb"}
    entries = [
        {"queries": {"qa": 1.0, "qb": 1.0},
         "qhash": {"qa": "aaa", "qb": "STALE"}},
        {"queries": {"qa": 2.0, "qb": 0.5}, "qhash": {}},  # legacy entry
    ]
    folded = 0
    for entry in entries:
        eq, eh = entry.get("queries", {}), entry.get("qhash", {})
        for n in timings:
            if n in eq and eh.get(n) == qhash[n] and eq[n] < timings[n]:
                timings[n] = eq[n]
                folded += 1
    assert timings == {"qa": 1.0, "qb": 3.0}
    assert folded == 1

def test_prev_round_fold_propagates_benchcache_and_calib(tmp_path,
                                                         monkeypatch):
    """The folded vs_prev base carries the benchcache flag (unanimous
    value, else 'mixed', legacy entries 'unknown') and the min host
    calibration constant, so main()'s cross-methodology and
    calibrated-delta logic can read them (judge r10 items 4-5)."""
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    (tmp_path / "BENCH_r09.json").write_text("{}")
    lines = [
        _entry(8, {"q1": 2.0}, benchcache="on", host_calib_sec=1.4),
        _entry(8, {"q1": 1.5}, benchcache="on", host_calib_sec=1.1),
    ]
    (tmp_path / "BENCH_SELF.jsonl").write_text(
        "".join(json.dumps(d) + "\n" for d in lines))
    _, prev = bench._latest_bench_artifact(0.1)
    assert prev["benchcache"] == "on"
    assert prev["host_calib_sec"] == 1.1

    lines.append(_entry(8, {"q1": 1.0}))  # legacy entry, no flag
    (tmp_path / "BENCH_SELF.jsonl").write_text(
        "".join(json.dumps(d) + "\n" for d in lines))
    _, prev = bench._latest_bench_artifact(0.1)
    assert prev["benchcache"] == "mixed"


def test_publication_fold_requires_tree_hash_and_cache_flag():
    """Widened fold guard (advisor r10): a same-round entry only folds
    when its whole-source tree hash AND benchcache flag match the
    current run — a mid-round helper edit (qhash-invisible) or a
    cache-mode flip invalidates earlier entries.  Mirrors the inline
    guard in main()."""
    tree, bench_cache = "tttttttttttt", "on"
    timings = {"qa": 3.0}
    qhash = {"qa": "aaa"}
    entries = [
        {"queries": {"qa": 1.0}, "qhash": {"qa": "aaa"},
         "tree_hash": "STALE_TREE__", "benchcache": "on"},
        {"queries": {"qa": 1.2}, "qhash": {"qa": "aaa"},
         "tree_hash": tree, "benchcache": "off"},
        {"queries": {"qa": 1.5}, "qhash": {"qa": "aaa"}},  # legacy
        {"queries": {"qa": 2.0}, "qhash": {"qa": "aaa"},
         "tree_hash": tree, "benchcache": "on"},           # eligible
    ]
    folded = 0
    for entry in entries:
        if entry.get("tree_hash") != tree \
                or entry.get("benchcache") != bench_cache:
            continue
        eq, eh = entry.get("queries", {}), entry.get("qhash", {})
        for n in timings:
            if n in eq and eh.get(n) == qhash[n] and eq[n] < timings[n]:
                timings[n] = eq[n]
                folded += 1
    assert timings == {"qa": 2.0}
    assert folded == 1


def test_tree_hash_stable_and_source_sensitive(tmp_path, monkeypatch):
    """_tree_hash digests every streamforge_spark/*.py: stable across
    calls, changes when any helper module changes."""
    pkg = tmp_path / "streamforge_spark"
    pkg.mkdir()
    (pkg / "helper.py").write_text("X = 1\n")
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    h1 = bench._tree_hash()
    assert h1 == bench._tree_hash() and len(h1) == 12
    (pkg / "helper.py").write_text("X = 2\n")
    assert bench._tree_hash() != h1


def test_calibrated_delta_normalizes_host_speed():
    """total_delta_calibrated scales the current total to the previous
    round's host speed: identical plans on a 2x slower host read as
    zero; a real 10% regression survives the normalization; missing
    constants yield None instead of a misleading number."""
    # same workload, host exactly 2x slower: raw +100s, calibrated 0
    assert bench._calibrated_delta(200.0, 0.30, 100.0, 0.15) == 0.0
    # real 10% regression on an identical host stays visible
    assert bench._calibrated_delta(110.0, 0.15, 100.0, 0.15) == 10.0
    # faster host can't mask a regression: raw -25s, calibrated +50s
    assert bench._calibrated_delta(75.0, 0.075, 100.0, 0.15) == 50.0
    # missing constants (pre-r10 artifacts) -> None
    assert bench._calibrated_delta(100.0, None, 100.0, 0.15) is None
    assert bench._calibrated_delta(100.0, 0.15, 100.0, None) is None
    assert bench._calibrated_delta(100.0, 0.15, None, 0.15) is None


def test_fold_calib_never_worse_than_any_contributor():
    """The constant paired with a FOLD total is the min over this
    run's calib and every fold-eligible entry's (judge r11 item 1:
    fold minima recorded at 0.171-host states were scaled by the final
    run's 0.342 constant, publishing a phantom -73.6s improvement).
    Invariant: fold_calib <= every contributor's recorded constant."""
    entries = [{"host_calib_sec": 0.171}, {"host_calib_sec": 0.205},
               {"host_calib_sec": None},            # legacy: ignored
               {}]                                   # legacy: ignored
    got = bench._fold_calib(0.342, entries)
    assert got == 0.171
    assert all(got <= e["host_calib_sec"] for e in entries
               if isinstance(e.get("host_calib_sec"), (int, float)))
    # a faster THIS run still contributes its own constant
    assert bench._fold_calib(0.100, entries) == 0.100


def test_fold_equals_this_run_pairing_when_nothing_folds():
    """When no earlier entry folded in (fold total == this-run total),
    fold_calib == this run's calib, so the published calibrated delta
    MUST equal the this-run pairing — the r11 artifact's -73.6s vs
    -9.2s divergence is exactly this identity violated."""
    calib = 0.171
    assert bench._fold_calib(calib, []) == calib
    total = total_this_run = 138.6
    prev, prev_calib = 136.4, 0.165
    d_fold = bench._calibrated_delta(
        total, bench._fold_calib(calib, []), prev, prev_calib)
    d_this = bench._calibrated_delta(total_this_run, calib,
                                     prev, prev_calib)
    assert d_fold == d_this


def test_effective_samples_sums_recorded_runs():
    """effective_samples sums each eligible entry's RECORDED
    runs_per_query plus this run's pass count (advisor r11: a 1-pass
    entry folding into a 2-pass run is 3 samples, not 2*(1+1)=4)."""
    eligible = [{"runs_per_query": 1}, {"runs_per_query": 2}, {}]
    passes = [{"q1": 1.0}, {"q1": 1.1}]
    got = len(passes) + sum(e.get("runs_per_query", 1)
                            for e in eligible)
    assert got == 2 + 1 + 2 + 1 == 6


def test_headline_names_are_registered_and_oracled():
    """A renamed/deregistered query must fail here, not crash the
    driver's round-end bench run (KeyError mid-measurement)."""
    from streamforge_spark import registry
    registry.load_all()
    missing = [n for n in bench.HEADLINE if n not in registry.QUERIES]
    assert not missing, missing
    unoracled = [n for n in bench.HEADLINE if n not in registry.ORACLES]
    assert not unoracled, unoracled
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
