"""The spark-submit CLI (datamatch_spark/cli.py): spec factories,
end-to-end dedup + match runs from JSON configs, and loud config
errors. The pipeline itself is the same ThresholdMatcher the golden
tests pin — here we check the declarative layer drives it faithfully."""
import json

import pytest

from datamatch_spark import cli
from datamatch_spark.indices import (
    ColumnsIndex,
    MultiIndex,
    QGramIndex,
    SortedNeighborhoodIndex,
)
from datamatch_spark.scorers import (
    AbsoluteScorer,
    AlterScorer,
    MaxScorer,
    SimSumScorer,
)
from datamatch_spark.similarities import (
    DateSimilarity,
    JaroWinklerSimilarity,
    StringSimilarity,
)

NAMES = [
    ("beech", "freddie"),
    ("beech", "freedie"),
    ("dupas", "demia"),
    ("dupas", "demeia"),
    ("brown", "latoya"),
    ("bowen", "latoya"),
    ("rhea", "cherri"),
    ("rhea", "cherrie"),
    ("be", "freedie"),
    ("du", "demeia"),
    ("teneisha", "green"),
    ("tyler", "green"),
    ("te neisha", "green"),
    ("t", "green"),
]


def _write_names(spark, path):
    spark.createDataFrame(
        [(i, l, f) for i, (l, f) in enumerate(NAMES)],
        "row_key long, last string, first string",
    ).coalesce(1).write.mode("overwrite").parquet(path)


# ---- spec factories -------------------------------------------------

def test_build_index_specs():
    assert isinstance(
        cli.build_index({"type": "columns", "cols": ["a"]}), ColumnsIndex
    )
    m = cli.build_index(
        {
            "type": "multi",
            "indices": [
                {"type": "columns", "cols": ["a"]},
                {"type": "qgram", "col": "b", "q": 2},
            ],
            "combine_keys": False,
        }
    )
    assert isinstance(m, MultiIndex)
    assert isinstance(
        cli.build_index(
            {"type": "sorted_neighborhood", "cols": ["a"], "window": 3}
        ),
        SortedNeighborhoodIndex,
    )
    assert isinstance(cli.build_index({"type": "qgram", "col": "a"}), QGramIndex)
    with pytest.raises(ValueError, match="unknown index type"):
        cli.build_index({"type": "btree"})
    with pytest.raises(ValueError, match="'type' key"):
        cli.build_index(["columns"])
    with pytest.raises(ValueError, match="bad index spec"):
        cli.build_index({"type": "columns", "cols": ["a"], "bogus": 1})


def test_build_scorer_specs():
    # dict sugar -> SimSumScorer, mirroring the Python API
    s = cli.build_scorer(
        {"last": {"type": "jaro_winkler"}, "first": {"type": "string"}}
    )
    assert isinstance(s, SimSumScorer)
    fields = s._fields
    assert isinstance(fields["last"], JaroWinklerSimilarity)
    assert isinstance(fields["first"], StringSimilarity)
    assert isinstance(
        cli.build_scorer(
            {"type": "absolute", "column": "ssn", "score": 1.0}
        ),
        AbsoluteScorer,
    )
    mx = cli.build_scorer(
        {
            "type": "max",
            "scorers": [
                {"type": "absolute", "column": "ssn", "score": 1.0},
                {"type": "simsum", "fields": {"d": {"type": "date", "d_max": 7}}},
            ],
        }
    )
    assert isinstance(mx, MaxScorer)
    alt = cli.build_scorer(
        {
            "type": "alter",
            "scorer": {"last": {"type": "jaro_winkler"}},
            "values": {"0": 1, "1": 1},
            "alter": {"op": "multiply", "value": 0.5},
        }
    )
    assert isinstance(alt, AlterScorer)
    inner = cli.build_scorer(
        {"type": "simsum", "fields": {"d": {"type": "date"}}}
    )
    assert isinstance(inner._fields["d"], DateSimilarity)
    with pytest.raises(ValueError, match="unknown scorer type"):
        cli.build_scorer({"type": "mean"})
    with pytest.raises(ValueError, match="unknown similarity type"):
        cli.build_scorer({"f": {"type": "cosine"}})
    with pytest.raises(ValueError, match="alter must be"):
        cli._alter_fn("halve")
    with pytest.raises(ValueError, match="unknown alter op"):
        cli._alter_fn({"op": "xor", "value": 1})


def test_alter_fn_semantics(spark):
    from pyspark.sql import functions as F

    df = spark.range(1).select(F.lit(0.8).alias("s"))
    for alter, want in [(0.5, 0.5),
                        ({"op": "multiply", "value": 0.5}, 0.4),
                        ({"op": "add", "value": 0.1}, 0.9),
                        ({"op": "set", "value": 0.3}, 0.3)]:
        got = df.select(cli._alter_fn(alter)(F.col("s")).alias("v")).first()["v"]
        assert got == pytest.approx(want), alter


# ---- end-to-end runs ------------------------------------------------

def test_cli_dedup_end_to_end(spark, tmp_path, capsys):
    src = str(tmp_path / "names.parquet")
    out = str(tmp_path / "out")
    _write_names(spark, src)
    config = {
        "input": {"a": {"path": src, "format": "parquet"}},
        "row_key": "row_key",
        "index": {"type": "noop"},
        "scorer": {
            "last": {"type": "jaro_winkler"},
            "first": {"type": "jaro_winkler"},
        },
        "threshold": 0.83,
        "outputs": [
            {"kind": "clusters", "path": out, "format": "parquet",
             "lower_bound": 0.83},
            {"kind": "decision"},
        ],
        "metrics_path": str(tmp_path / "metrics"),
    }
    cfg_path = tmp_path / "job.json"
    cfg_path.write_text(json.dumps(config))
    # main() reuses the test session via getOrCreate (same master)
    rc = cli.main(["--config", str(cfg_path), "--master", "local[4]"])
    assert rc == 0
    line = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("{")
    ][-1]
    summary = json.loads(line)
    assert summary["mode"] == "dedup"
    assert summary["decision"]["number_of_matched_pairs"] > 0
    assert summary["metrics_run_id"]

    by_cluster: dict[int, set[int]] = {}
    for r in spark.read.parquet(f"{out}/all_clusters").collect():
        by_cluster.setdefault(r["cluster_idx"], set()).add(r["row_key"])
    got = sorted(tuple(sorted(v)) for v in by_cluster.values())
    assert got == [(0, 1, 8), (2, 3, 9), (4, 5), (6, 7), (10, 12, 13)]
    # metrics sink recorded the scored_pairs stage
    parts = spark.read.parquet(str(tmp_path / "metrics") + "/partitions")
    assert parts.where("stage = 'scored_pairs'").count() > 0


def test_cli_match_mode_with_filters_and_variator(spark, tmp_path, capsys):
    rows_a = [(0, "beech", "freddie", "x"), (1, "rhea", "cherri", "y")]
    rows_b = [(10, "beech", "freedie", "x"), (11, "cherrie", "rhea", "y")]
    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    schema = "row_key long, last string, first string, grp string"
    spark.createDataFrame(rows_a, schema).write.mode("overwrite").parquet(a)
    spark.createDataFrame(rows_b, schema).write.mode("overwrite").parquet(b)
    config = {
        "input": {"a": {"path": a}, "b": {"path": b}},
        "index": {"type": "columns", "cols": ["grp"]},
        "scorer": {
            "last": {"type": "jaro_winkler"},
            "first": {"type": "jaro_winkler"},
        },
        "variator": {"type": "swap", "col_a": "first", "col_b": "last"},
        "threshold": 0.8,
        "outputs": [{"kind": "pairs", "path": str(tmp_path / "pairs")}],
    }
    cfg = tmp_path / "m.json"
    cfg.write_text(json.dumps(config))
    assert cli.main(["--config", str(cfg), "--master", "local[4]"]) == 0
    line = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("{")
    ][-1]
    summary = json.loads(line)
    assert summary["mode"] == "match"
    # the swapped pair (11: cherrie/rhea vs 1: rhea/cherri) must match
    assert summary["decision"]["number_of_matched_pairs"] == 2
    allp = spark.read.parquet(str(tmp_path / "pairs") + "/all_pairs")
    assert allp.count() == 4  # two pairs x two rows each


def test_cli_config_errors(spark, tmp_path):
    src = str(tmp_path / "names.parquet")
    _write_names(spark, src)
    base = {
        "input": {"a": {"path": src}},
        "scorer": {"last": {"type": "jaro_winkler"}},
        "threshold": 0.8,
    }
    bad_inp = dict(base, input={})
    with pytest.raises(ValueError, match="must contain 'a'"):
        cli.run_job(spark, bad_inp)
    no_thr = {k: v for k, v in base.items() if k != "threshold"}
    with pytest.raises(ValueError, match="threshold is required"):
        cli.run_job(spark, no_thr)
    bad_out = dict(base, outputs=[{"kind": "clusters"}])
    with pytest.raises(ValueError, match="needs a 'path'"):
        cli.run_job(spark, bad_out)
    bad_fmt = dict(base, input={"a": {"path": src, "format": "orcx"}})
    with pytest.raises(ValueError, match="unknown input format"):
        cli.run_job(spark, bad_fmt)


def test_cli_inherits_master_under_spark_submit(tmp_path, monkeypatch):
    """Under spark-submit (PYSPARK_GATEWAY_PORT set) with no explicit
    master, main() must pass master='inherit' so the submit-time
    --master conf is not overridden by a builder local default."""
    import datamatch_spark.cli as cli_mod
    import datamatch_spark.session as sess

    cfg = tmp_path / "j.json"
    cfg.write_text(json.dumps({"input": {"a": {"path": "x"}},
                               "scorer": {"f": {"type": "string"}},
                               "threshold": 0.5}))
    seen = {}

    def fake_get_spark(master=None, **kw):
        seen["master"] = master
        raise RuntimeError("stop before touching Spark")

    monkeypatch.setattr(sess, "get_spark", fake_get_spark)
    monkeypatch.setenv("PYSPARK_GATEWAY_PORT", "50000")
    with pytest.raises(RuntimeError, match="stop before"):
        cli_mod.main(["--config", str(cfg)])
    assert seen["master"] == "inherit"
    # an explicit --master always wins over inheritance
    with pytest.raises(RuntimeError, match="stop before"):
        cli_mod.main(["--config", str(cfg), "--master", "local[2]"])
    assert seen["master"] == "local[2]"
    # standalone (no gateway): default local sizing path (None)
    monkeypatch.delenv("PYSPARK_GATEWAY_PORT")
    with pytest.raises(RuntimeError, match="stop before"):
        cli_mod.main(["--config", str(cfg)])
    assert seen["master"] is None


def test_simsum_spec_rejects_unknown_keys():
    with pytest.raises(ValueError, match="unknown keys"):
        cli.build_scorer(
            {"type": "simsum", "fields": {"f": {"type": "string"}},
             "weights": [1, 2]}
        )


def test_missing_scorer_is_loud(spark, tmp_path):
    src = str(tmp_path / "n.parquet")
    _write_names(spark, src)
    with pytest.raises(ValueError, match="scorer is required"):
        cli.run_job(spark, {"input": {"a": {"path": src}},
                            "threshold": 0.8})


def test_build_new_specs():
    from datamatch_spark import (
        MongeElkanSimilarity,
        SuffixArrayIndex,
        TokenSetSimilarity,
    )

    idx = cli.build_index({"type": "suffix", "col": "a", "min_len": 3})
    assert isinstance(idx, SuffixArrayIndex)
    assert isinstance(
        cli.build_similarity({"type": "token_set", "mode": "dice"}),
        TokenSetSimilarity,
    )
    assert isinstance(
        cli.build_similarity({"type": "monge_elkan"}), MongeElkanSimilarity
    )


def test_cli_golden_records_output(spark, tmp_path, capsys):
    src = str(tmp_path / "names_gr.parquet")
    out = str(tmp_path / "golden")
    _write_names(spark, src)
    config = {
        "input": {"a": {"path": src, "format": "parquet"}},
        "row_key": "row_key",
        "index": {"type": "noop"},
        "scorer": {
            "last": {"type": "jaro_winkler"},
            "first": {"type": "jaro_winkler"},
        },
        "threshold": 0.83,
        "outputs": [
            {"kind": "golden_records", "path": out,
             "rules": {"last": "most_frequent", "first": "longest"}},
        ],
    }
    cfg_path = tmp_path / "job_gr.json"
    cfg_path.write_text(json.dumps(config))
    rc = cli.main(["--config", str(cfg_path), "--master", "local[4]"])
    assert rc == 0
    got = spark.read.parquet(out)
    rows = got.collect()
    # every source record lands in exactly one golden row
    assert got.agg({"cluster_size": "sum"}).collect()[0][0] == 14
    merged = [r for r in rows if r["cluster_size"] > 1]
    assert len(merged) == 5  # the fixture's five known clusters
    # a bad spec is loud
    config["outputs"] = [{"kind": "golden_records", "path": out}]
    with pytest.raises(ValueError, match="needs a non-empty"):
        cli.run_job(spark, config)


def test_build_geo_specs():
    from datamatch_spark import GeoGridIndex, GeoSimilarity

    idx = cli.build_index(
        {"type": "geo_grid", "lat_col": "lat", "lon_col": "lon", "d_km": 5.0}
    )
    assert isinstance(idx, GeoGridIndex)
    sim = cli.build_similarity({"type": "geo", "d_max_km": 500.0})
    assert isinstance(sim, GeoSimilarity)
    with pytest.raises(ValueError, match="bad index spec"):
        cli.build_index({"type": "geo_grid", "lat_col": "lat"})
