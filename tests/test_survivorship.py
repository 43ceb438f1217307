"""golden_records — survivorship / golden-record merge: every rule
against a hand-computed fixture, deterministic tie-breaks, NULL
handling, ER composition through groups_from_pairs, and validation.
No reference counterpart (the reference pipeline ends at cluster
reports, /root/reference/datamatch/matchers.py:425-474)."""

import datetime

import pytest
from pyspark.sql import functions as F

from datamatch_spark import golden_records
from datamatch_spark.clustering import groups_from_pairs

ROWS = [
    # id, grp, name,       seg,  bal,   seen (date)
    (0, "a", "jonathan",   "x",  10.0,  datetime.date(2024, 1, 1)),
    (1, "a", "jon",        "y",  30.0,  datetime.date(2024, 3, 1)),
    (2, "a", "jonny",      "y",  20.0,  datetime.date(2024, 2, 1)),
    (3, "b", "ada",        "z",  5.0,   datetime.date(2024, 1, 5)),
    (4, "b", None,         None, None,  None),
]
SCHEMA = "id long, grp string, name string, seg string, bal double, seen date"


def _df(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    assign = df.select("id", F.col("grp").alias("group_id"))
    return df.drop("grp"), assign


def _by_grp(out):
    return {r["group_id"]: r.asDict() for r in out.collect()}


def test_all_rules_hand_computed(spark):
    df, assign = _df(spark)
    out = golden_records(
        df,
        "id",
        assign,
        rules={
            "name": "longest",
            "seg": "most_frequent",
            "bal": "max",
            "seen": "latest:seen",
        },
    )
    got = _by_grp(out)
    assert got["a"] == {
        "group_id": "a",
        "cluster_size": 3,
        "name": "jonathan",
        "seg": "y",  # modal (2x)
        "bal": 30.0,
        "seen": datetime.date(2024, 3, 1),
    }
    # group b: the all-NULL row contributes to size but never wins
    assert got["b"] == {
        "group_id": "b",
        "cluster_size": 2,
        "name": "ada",
        "seg": "z",
        "bal": 5.0,
        "seen": datetime.date(2024, 1, 5),
    }


def test_numeric_rules(spark):
    df, assign = _df(spark)
    got = _by_grp(
        golden_records(
            df, "id", assign,
            rules={"bal": "sum", "seg": "count_distinct", "name": "min"},
        )
    )
    assert got["a"]["bal"] == 60.0
    assert got["a"]["seg"] == 2
    assert got["a"]["name"] == "jon"
    got2 = _by_grp(
        golden_records(df, "id", assign, rules={"bal": "mean", "name": "shortest"})
    )
    assert got2["a"]["bal"] == pytest.approx(20.0)
    assert got2["a"]["name"] == "jon"


def test_tie_breaks_are_deterministic(spark):
    # equal length -> larger value; equal frequency -> larger value;
    # equal order key -> larger id wins latest
    df = spark.createDataFrame(
        [
            (0, "g", "abc", "p", 1),
            (1, "g", "abd", "q", 1),
        ],
        "id long, grp string, s string, m string, o int",
    )
    assign = df.select("id", F.col("grp").alias("group_id"))
    got = _by_grp(
        golden_records(
            df.drop("grp"), "id", assign,
            rules={"s": "longest", "m": "most_frequent"},
        )
    )
    assert got["g"]["s"] == "abd"
    assert got["g"]["m"] == "q"
    got2 = _by_grp(
        golden_records(
            df.drop("grp").withColumn("pick", F.col("s")),
            "id", assign, rules={"pick": "latest:o"},
        )
    )
    assert got2["g"]["pick"] == "abd"  # tie on o -> id 1 wins


def test_latest_skips_null_order_rows(spark):
    df = spark.createDataFrame(
        [(0, "g", "old", 1), (1, "g", "mystery", None)],
        "id long, grp string, s string, o int",
    )
    assign = df.select("id", F.col("grp").alias("group_id"))
    got = _by_grp(
        golden_records(df.drop("grp"), "id", assign, rules={"s": "latest:o"})
    )
    assert got["g"]["s"] == "old"  # unknown recency never wins
    got2 = _by_grp(
        golden_records(df.drop("grp"), "id", assign, rules={"s": "earliest:o"})
    )
    assert got2["g"]["s"] == "old"


def test_composes_with_groups_from_pairs(spark):
    # the ER lifecycle end-to-end: pair graph -> clusters -> merge
    df = spark.createDataFrame(
        [(0, "ann arbor"), (1, "ann"), (2, "bob"), (3, "ann a")],
        "id long, name string",
    )
    pairs = spark.createDataFrame([(0, 1), (1, 3)], "idx_a long, idx_b long")
    assign = groups_from_pairs(df, "id", pairs)
    got = _by_grp(golden_records(df, "id", assign, rules={"name": "longest"}))
    assert got[0] == {"group_id": 0, "cluster_size": 3, "name": "ann arbor"}
    assert got[2] == {"group_id": 2, "cluster_size": 1, "name": "bob"}


def test_unassigned_rows_excluded(spark):
    df, _ = _df(spark)
    assign = spark.createDataFrame([(0, "solo")], "id long, group_id string")
    got = _by_grp(golden_records(df, "id", assign, rules={"name": "max"}))
    assert set(got) == {"solo"} and got["solo"]["cluster_size"] == 1


def test_validation(spark):
    df, assign = _df(spark)
    with pytest.raises(ValueError):
        golden_records(df, "id", assign, rules={})
    with pytest.raises(ValueError):
        golden_records(df, "id", assign, rules={"id": "max"})
    with pytest.raises(ValueError):
        golden_records(df, "id", assign, rules={"name": "vibes"})
    with pytest.raises(KeyError):
        golden_records(df, "id", assign, rules={"missing": "max"})
    with pytest.raises(KeyError):
        golden_records(df, "id", assign, rules={"name": "latest:missing"})
    with pytest.raises(KeyError):
        golden_records(df, "id", assign.drop("group_id"), rules={"name": "max"})
    with pytest.raises(ValueError):
        # cluster_col collides with a record column
        golden_records(
            df.withColumn("group_id", F.lit("x")), "id", assign,
            rules={"name": "max"},
        )


def test_deterministic_under_repartition(spark):
    # tie-breaks are value/id-based, never partition-order-based
    df, assign = _df(spark)
    rules = {
        "name": "longest",
        "seg": "most_frequent",
        "bal": "sum",
        "seen": "latest:seen",
    }
    base = sorted(
        golden_records(df, "id", assign, rules=rules).collect(),
        key=lambda r: str(r["group_id"]),
    )
    for n in (1, 3, 7):
        got = sorted(
            golden_records(
                df.repartition(n), "id", assign.repartition(n), rules=rules
            ).collect(),
            key=lambda r: str(r["group_id"]),
        )
        assert got == base, n


def test_matcher_get_golden_records(spark):
    from datamatch_spark import JaroWinklerSimilarity, NoopIndex, ThresholdMatcher

    rows = [
        ("beech", "freddie", 10.0),
        ("beech", "freedie", 30.0),
        ("rhea", "cherri", 5.0),
        ("rhea", "cherrie", 7.0),
        ("solo", "xander", 1.0),
    ]
    df = spark.createDataFrame(
        [(i, l, f, b) for i, (l, f, b) in enumerate(rows)],
        "row_key long, last string, first string, bal double",
    )
    m = ThresholdMatcher(
        NoopIndex(),
        {"last": JaroWinklerSimilarity(), "first": JaroWinklerSimilarity()},
        df,
    )
    rules = {"last": "most_frequent", "first": "longest", "bal": "sum"}
    out = m.get_golden_records(rules, 0.83)
    got = {r["group_id"]: r.asDict() for r in out.collect()}
    merged = {k: v for k, v in got.items() if not k.startswith("row:")}
    assert len(merged) == 2 and len(got) == 3
    by_last = {v["last"]: v for v in merged.values()}
    assert by_last["beech"]["bal"] == 40.0
    assert by_last["beech"]["first"] == "freedie"  # len-tie -> larger value
    assert by_last["rhea"]["first"] == "cherrie"
    assert got[[k for k in got if k.startswith("row:")][0]]["last"] == "solo"

    no_solo = m.get_golden_records(rules, 0.83, include_singletons=False)
    assert no_solo.count() == 2

    # match mode refuses
    m2 = ThresholdMatcher(
        NoopIndex(),
        {"last": JaroWinklerSimilarity(), "first": JaroWinklerSimilarity()},
        df, df.withColumn("row_key", F.col("row_key") + 100),
    )
    with pytest.raises(ValueError):
        m2.get_golden_records(rules)
