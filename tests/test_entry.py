"""Local mirror of the driver's correctness gate: run every
``queries()`` entry at sf0.01 and compare row-count + column names +
order-insensitive values against ``oracle_sql()`` via DuckDB."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def _compare(name, sdf, con, sql):
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = con.sql(sql)
    duck_cols = res.columns
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: columns {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rowcount {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _norm(spark_rows, spark_cols)
    b = _norm(duck_rows, duck_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if not _row_eq(x, y)]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def _row_eq(x, y):
    if len(x) != len(y):
        return False
    for u, v in zip(x, y):
        if isinstance(u, float) and isinstance(v, float):
            if math.isnan(u) and math.isnan(v):
                continue
            if abs(u - v) > 1e-9:
                return False
        elif u != v:
            return False
    return True


ORACLE = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_every_oracle_has_query():
    assert set(ORACLE) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_vs_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    _compare(name, sdf, duck, ORACLE[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    assert sdf.count() >= 0
    assert sdf.columns


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.columns[0] == "cluster_idx"


def test_duckdb_soundex_matches_spark_on_edge_cases(spark):
    """The oracle's pure-SQL Soundex must replicate Spark's soundex
    byte-for-byte on the hard cases: H/W ignored without code reset
    (ASHCRAFT, BHB, SCHWARZ), first-letter code dedup (PFISTER),
    non-letter separators (O'BRIEN, X1Y2Z3), pass-through for
    non-A-Z-leading values (123ABC, É), vowel runs, empties."""
    from pyspark.sql import functions as F

    cases = [
        "ROBERT", "RUPERT", "ASHCRAFT", "ASHCROFT", "TYMCZAK", "PFISTER",
        "HONEYMAN", "A", "AA", "HW", "WH", "123ABC", "O'BRIEN", "MCDONALD",
        "LLOYD", "JACKSON", "", "H", "W", "BHB", "SCHWARZ", "X1Y2Z3",
        "AEIOU", "C3PO", "ÉCLAIR",
    ]
    sp = {
        r["u"]: r["s"]
        for r in spark.createDataFrame([(c,) for c in cases], "u string")
        .select("u", F.soundex("u").alias("s"))
        .collect()
    }
    con = duckdb.connect()
    expr = entry_mod._duckdb_soundex("u")
    for c in cases:
        got = con.execute(f"SELECT {expr} FROM (SELECT ? AS u)", [c]).fetchone()[0]
        assert got == sp[c], (c, got, sp[c])


def test_phonetic_query_deterministic_across_partitioning(spark):
    """q_phonetic_candidates samples via a doc_id predicate (not
    .limit), so its result is identical however the read is split."""
    base = QUERIES["phonetic_candidates"](spark, SF_DIR)
    want = {(r["idx_a"], r["idx_b"]) for r in base.collect()}

    import __spark_entry__ as e
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(17)
    from datamatch_spark.indices import PhoneticIndex
    from datamatch_spark.pairing import candidate_pairs
    from pyspark.sql import functions as F

    rp = candidate_pairs(
        docs.withColumn("w0", F.split(F.col("text"), " ").getItem(0))
        .where(F.col("doc_id") < 200),
        PhoneticIndex("w0"),
        "doc_id",
        [],
    )
    got = {(r["idx_a"], r["idx_b"]) for r in rp.collect()}
    assert got == want and len(want) > 0
