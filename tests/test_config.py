"""ScopedConfig layering (ScopedConfig.java:80-107 priority order)."""

from __future__ import annotations

import json

import pytest

from streamforge_spark.config import ScopedConfig


@pytest.fixture()
def files(tmp_path):
    cfgf = tmp_path / "streamforge.json"
    cfgf.write_text(json.dumps({
        "common": {"TOPIC": "common-topic", "ONLY_COMMON": "c"},
        "JobA": {"TOPIC": "joba-topic", "ONLY_JOB": "j"},
    }))
    envf = tmp_path / ".env"
    envf.write_text("TOPIC=dotenv-topic\n# comment\nDOTENV_ONLY='quoted'\n")
    return str(cfgf), str(envf)


def test_priority_order(files):
    cfgf, envf = files
    cfg = ScopedConfig(config_file=cfgf, env_file=envf,
                       environ={"TOPIC": "env-topic"},
                       overrides={"TOPIC": "override-topic"})
    cfg.activate_job("JobA")
    assert cfg.get("TOPIC") == "override-topic"            # overrides win
    cfg2 = ScopedConfig(config_file=cfgf, env_file=envf,
                        environ={"TOPIC": "env-topic"})
    assert cfg2.get("TOPIC") == "env-topic"                # then environ
    cfg3 = ScopedConfig(config_file=cfgf, env_file=envf, environ={})
    assert cfg3.get("TOPIC") == "dotenv-topic"             # then .env
    cfg4 = ScopedConfig(config_file=cfgf, env_file=None, environ={})
    cfg4.activate_job("JobA")
    assert cfg4.get("TOPIC") == "joba-topic"               # then json[job]
    assert cfg4.get("ONLY_COMMON") == "c"                  # then json[common]
    cfg4.activate_job("JobB")
    assert cfg4.get("TOPIC") == "common-topic"             # other job -> common


def test_exists_require_and_dotenv_quotes(files):
    cfgf, envf = files
    cfg = ScopedConfig(config_file=cfgf, env_file=envf, environ={})
    assert cfg.get("DOTENV_ONLY") == "quoted"
    assert cfg.exists("DOTENV_ONLY") and not cfg.exists("NOPE")
    with pytest.raises(KeyError, match="NOPE"):
        cfg.require("NOPE")
    cfg.activate_job("JobA")
    assert cfg.get("ONLY_JOB") == "j"
    assert cfg.get("MISSING", "dflt") == "dflt"


def test_bench_artifact_parser_survives_driver_wrapper_shapes(tmp_path, monkeypatch):
    # the driver wraps bench output as {"parsed": null, "tail": ...} on
    # partial captures; r3's artifact crashed the naive .get chain
    import json
    import bench as bench_mod
    root = tmp_path
    (root / "BENCH_r01.json").write_text(json.dumps(
        {"n": 1, "rc": 0, "sf": 0.1, "parsed": None, "tail": "garbage"}))
    (root / "BENCH_r02.json").write_text("not json at all {")
    (root / "BENCH_r03.json").write_text(json.dumps(
        {"parsed": {"sf": 0.1, "queries": {"q1": 1.5}, "value": 1.5}}))
    (root / "BENCH_r04.json").write_text(json.dumps([1, 2, 3]))  # non-dict
    monkeypatch.setattr(
        bench_mod.pathlib.Path, "resolve",
        lambda self: root / "bench.py", raising=False)
    name, data = bench_mod._latest_bench_artifact(0.1)
    assert name == "BENCH_r03.json" and data["queries"] == {"q1": 1.5}
    assert bench_mod._latest_bench_artifact(0.01) is None


def test_driver_window_rotation_rules(monkeypatch):
    # the self-rotating window contract future rounds rely on:
    # CORE stays pinned; ROTATION_PRIORITY names drop out once the
    # driver has checked them; never-checked queries fill the rest in
    # registration order; already-checked non-core sink to the back
    from streamforge_spark import registry
    registry.load_all()
    names = list(registry.QUERIES)
    checked = set(registry.CORE_WINDOW[:5]) \
        | {registry.ROTATION_PRIORITY[0], registry.ROTATION_PRIORITY[2]} \
        | set(names[-40:])
    with monkeypatch.context() as m:
        m.setattr(registry, "_driver_checked", lambda: checked)
        registry.reorder_for_driver_window()
        order = list(registry.QUERIES)
        n_core = len([n for n in registry.CORE_WINDOW
                      if n in registry.QUERIES])
        # core first, in order, even the already-checked ones
        assert order[:n_core] == [n for n in registry.CORE_WINDOW
                                  if n in registry.QUERIES]
        # checked priority names are NOT pinned after core
        prio_block = order[n_core:n_core + len(registry.ROTATION_PRIORITY)]
        assert registry.ROTATION_PRIORITY[0] not in prio_block
        assert registry.ROTATION_PRIORITY[2] not in prio_block
        assert registry.ROTATION_PRIORITY[1] in prio_block
        # the 50-slot window holds no already-checked non-core queries
        window = order[:50]
        for n in window[n_core:]:
            assert n not in checked, n
        # ORACLES order mirrors QUERIES order
        assert [n for n in order if n in registry.ORACLES] == \
            list(registry.ORACLES)
    # monkeypatch restored: rebuild the real ordering for later tests
    registry.reorder_for_driver_window()
