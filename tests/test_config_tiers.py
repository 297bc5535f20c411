"""YAML config overlay + explorative/sensitive tiers (VERDICT r3 #6; the
reference supports confuse YAML files and named arg groups,
reference config.py:26-70)."""

import json

import pytest


def test_from_dict_presets_and_overrides():
    from pandas_profiling_personal_spark import ProfileConfig

    cfg = ProfileConfig.from_dict(
        {"preset": "explorative", "top_k": 7, "correlations": ["pearson"]}
    )
    assert cfg.string_refinement is True and cfg.char_analysis is True
    assert cfg.top_k == 7
    assert cfg.correlations == ("pearson",)  # list -> tuple coercion

    sens = ProfileConfig.from_dict({"preset": "sensitive"})
    assert sens.redact is True and sens.duplicates is False

    with pytest.raises(ValueError, match="does not exist|do not exist"):
        ProfileConfig.from_dict({"no_such_knob": 1})
    with pytest.raises(ValueError, match="preset"):
        ProfileConfig.from_dict({"preset": "bogus"})


def test_from_yaml(tmp_path):
    from pandas_profiling_personal_spark import ProfileConfig

    f = tmp_path / "cfg.yaml"
    f.write_text(
        "preset: minimal\ntop_k: 3\nsamples_head: 0\n"
    )
    cfg = ProfileConfig.from_yaml(f)
    assert cfg.correlations == () and cfg.top_k == 3
    assert cfg.samples_head == 0

    empty = tmp_path / "empty.yaml"
    empty.write_text("")
    assert ProfileConfig.from_yaml(empty) == ProfileConfig()


def test_explorative_string_refinement(spark):
    from pandas_profiling_personal_spark import EXPLORATIVE, profile

    rows = [
        (
            f"https://ex{i % 4}.org/p{i}?q={i}",
            f"/data/set{i % 3}/file{i}.txt",
            f"word{i % 5}",
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "u string, p string, w string")
    r = profile(df, EXPLORATIVE.with_(correlations=(), duplicates=False))
    u, p, w = r.variables["u"], r.variables["p"], r.variables["w"]
    assert u["type_refined"] == "url"
    assert {"protocol", "host", "path", "query"} <= set(u["url_parts"])
    schemes = {d["value"]: d["count"] for d in u["url_parts"]["protocol"]}
    assert schemes == {"https": 40}
    assert p["type_refined"] == "path"
    assert p["common_prefix"] == "/data/set"
    suffixes = {d["value"]: d["count"] for d in p["path_parts"]["suffix"]}
    assert suffixes[".txt"] == 40
    assert "type_refined" not in w


def test_sensitive_redaction(spark):
    from pandas_profiling_personal_spark import SENSITIVE, profile

    df = spark.createDataFrame(
        [(i % 3, f"secret{i % 4}") for i in range(30)], "x int, s string"
    )
    r = profile(df, SENSITIVE.with_(correlations=()))
    for v in r.variables.values():
        assert v.get("redacted") is True
        assert "top_values" not in v and "mode" not in v
        assert "extreme_obs" not in v
    assert r.sample == {"head": [], "random": []}
    assert r.duplicates == []
    # statistics survive redaction
    assert r.variables["x"]["n_distinct"] == 3


def test_to_file_minify_and_assets(spark, tmp_path):
    """Reference to_file parity: htmlmin-style minify + assets directory
    (reference profile_report.py:257-330); inline single file stays the
    default."""
    from pandas_profiling_personal_spark import MINIMAL, profile
    from pandas_profiling_personal_spark.report import html as H

    df = spark.createDataFrame([(i, f"v{i % 3}") for i in range(20)],
                               "a int, b string")
    r = profile(df, MINIMAL)

    plain = tmp_path / "plain.html"
    H.to_file(r, str(plain))
    mini = tmp_path / "mini.html"
    H.to_file(r, str(mini), minify=True)
    assert mini.stat().st_size < plain.stat().st_size
    assert "<title>" in mini.read_text()

    assets = tmp_path / "rep.html"
    H.to_file(r, str(assets), assets_dir=str(tmp_path / "assets"))
    page = assets.read_text()
    assert "<style>" not in page and "profile.css" in page
    assert (tmp_path / "assets" / "profile.css").stat().st_size > 100


def test_cli_config_yaml(tmp_path):
    """CLI --config consumes a YAML overlay in a subprocess (spark-submit
    users cannot pass Python kwargs)."""
    import subprocess
    import sys

    import pandas as pd

    src = tmp_path / "d.parquet"
    pd.DataFrame(
        {"a": range(40), "s": [f"k{i % 4}" for i in range(40)]}
    ).to_parquet(src)
    ycfg = tmp_path / "cfg.yaml"
    ycfg.write_text("preset: minimal\ntop_k: 2\n")
    out = tmp_path / "rep.json"
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "pandas_profiling_personal_spark.cli",
            str(src),
            str(out),
            "--config",
            str(ycfg),
            "--master",
            "local[2]",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.loads(out.read_text())
    assert rep["table"]["n"] == 40
    tops = rep["variables"]["s"]["top_values"]
    assert len(tops) == 2  # top_k: 2 honored through the YAML path


def test_explorative_embedding_refinement(spark):
    """EXPLORATIVE tier: a constant-dimension array<double> column refines
    to an Embedding tab (health stats from one extra 1-row agg); ragged
    and non-numeric arrays stay opaque Arrays; the HTML report renders
    the tab."""
    from pandas_profiling_personal_spark import EXPLORATIVE, profile
    from pandas_profiling_personal_spark.report.html import render_html
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
    r = profile(emb, EXPLORATIVE.with_(correlations=(), duplicates=False))
    v = r.variables["embedding"]
    assert v["type_refined"] == "embedding"
    es = v["embedding_stats"]
    assert es["dim_min"] == es["dim_max"] and es["dim_min"] > 0
    assert es["n"] == emb.count()
    assert "Embedding" in render_html(r)

    # ragged float arrays do NOT refine to Embedding, but DO get health
    # stats + the EMBEDDING_RAGGED alert (the breakage worth surfacing);
    # string arrays stay untouched. A zero vector and a NaN component
    # raise their own alerts.
    rows = [
        ([1.0, 2.0], ["a"]),
        ([1.0, 2.0, 3.0], ["b"]),
        ([0.0, 0.0], ["c"]),
        ([float("nan"), 1.0], ["d"]),
    ]
    df2 = spark.createDataFrame(
        rows, "ragged array<double>, strs array<string>"
    )
    r2 = profile(df2, EXPLORATIVE.with_(correlations=(), duplicates=False))
    assert "type_refined" not in r2.variables["ragged"]
    assert r2.variables["ragged"]["embedding_stats"]["n_distinct_dims"] > 1
    assert "type_refined" not in r2.variables["strs"]
    assert "embedding_stats" not in r2.variables["strs"]
    kinds = {a["type"] for a in r2.alerts if a.get("column") == "ragged"}
    assert {"EMBEDDING_RAGGED", "EMBEDDING_ZERO",
            "EMBEDDING_NONFINITE"} <= kinds

    # default tier: off (the gate mirrors string_refinement)
    r3 = profile(emb.select("embedding"))
    assert "embedding_stats" not in r3.variables["embedding"]


def test_interactions_targets_restrict_pairs(spark):
    """Reference interactions.targets: only pairs involving a target are
    computed — the quadratic explode drops to ~T·N."""
    from pandas_profiling_personal_spark import ProfileConfig, profile

    rows = [(float(i), float(i * 2), float(i % 7), float(50 - i))
            for i in range(50)]
    df = spark.createDataFrame(rows, "a double, b double, c double, d double")
    full = profile(df, ProfileConfig(exact=True, interactions=True))
    pairs_full = {(x, y) for x, inner in full.scatter.items() for y in inner}
    assert len(pairs_full) == 6  # all C(4,2) pairs

    tgt = profile(df, ProfileConfig(
        exact=True, interactions=True, interactions_targets=("a",)))
    pairs_tgt = {(x, y) for x, inner in tgt.scatter.items() for y in inner}
    assert pairs_tgt == {("a", "b"), ("a", "c"), ("a", "d")}
    # an unknown target restricts to nothing rather than falling back
    none = profile(df, ProfileConfig(
        exact=True, interactions=True, interactions_targets=("ghost",)))
    assert none.scatter == {}


def test_coerce_str_to_date_inference(spark):
    """Reference vars.cat.coerce_str_to_date: date-like string columns
    reclassify to DATETIME (opt-in); numeric wins over date; junk stays
    categorical."""
    from pandas_profiling_personal_spark import ProfileConfig, profile

    rows = [
        ("2024-01-0%d" % (i % 9 + 1), str(2000 + i), "x%d" % i,
         "2024-01-01 10:0%d:00" % (i % 10))
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "d string, y string, junk string, ts string")
    r = profile(df, ProfileConfig(
        exact=True, infer_types=True, coerce_str_to_date=True,
        correlations=(), duplicates=False))
    assert r.variables["d"]["type"] == "DateTime"
    assert r.variables["ts"]["type"] == "DateTime"
    assert r.variables["y"]["type"] == "Numeric"     # numeric wins
    assert r.variables["junk"]["type"] == "Categorical"
    # date stats flow through the DATETIME describer
    assert r.variables["d"]["min"] is not None

    # off by default: everything stays as the base classification
    r2 = profile(df, ProfileConfig(
        exact=True, infer_types=True,
        correlations=(), duplicates=False))
    assert r2.variables["d"]["type"] == "Categorical"
