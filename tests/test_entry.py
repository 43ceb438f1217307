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


def test_jw_oracle_precondition_ascii_corpus():
    """``_duckdb_jw_chain`` scores RAW strings while the engine
    transliterates first (``unidecode_ascii``): the jw_dedup_pairs
    oracle is valid iff transliteration is identity on the corpus.
    Pin that precondition so a testdata regeneration can't silently
    invalidate the oracle."""
    con = duckdb.connect()
    n = con.sql(
        f"SELECT count(*) FROM '{SF_DIR}/documents.parquet' "
        r"WHERE text IS NULL OR regexp_matches(text, '[^\x00-\x7f]')"
    ).fetchone()[0]
    assert n == 0


def _duck_pairs(con, pairs):
    con.execute("CREATE OR REPLACE TABLE tp (idx_a INT, idx_b INT, s_a VARCHAR, s_b VARCHAR)")
    con.executemany(
        "INSERT INTO tp VALUES (?, ?, ?, ?)",
        [(i, i, a, b) for i, (a, b) in enumerate(pairs)],
    )


ADVERSARIAL_PAIRS = [
    ("", ""), ("", "abc"), ("abc", ""), ("a", "a"), ("a", "b"),
    ("martha", "marhta"), ("dixon", "dicksonx"), ("jellyfish", "smellyfish"),
    ("dwayne", "duane"), ("aaaaa", "aaaaa"), ("aaaaa", "aabaa"),
    ("ab", "ba"), ("abcd", "dcba"), ("abcde", "edcba"),
    ("xxxxxxxxxxyyyyyyyyyy", "yyyyyyyyyyxxxxxxxxxx"),
    ("prefixmatch_long_tail_aaaa", "prefixmatch_long_tail_bbbb"),
    ("the same exact forty char string here!!", "the same exact forty char string here!!"),
    ("transposed pairs ab cd", "transposed pairs ba dc"),
    ("short", "a much longer counterpart string"),
    ("zzz", "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"),
    ("19990212", "19991202"), ("20000101", "20001001"),
    ("repeated e everywhere eeeee", "eeeee everywhere repeated e"),
]


def test_duckdb_jw_chain_matches_kernel_on_adversarial_pairs():
    """The recursive-CTE JW must equal ``kernels.jaro_winkler_batch``
    (the python-Levenshtein algorithm) on constructed hard cases:
    transpositions, reversals, equal-length ties (s1 stays the A side),
    big length skews, repeated characters, empties."""
    from datamatch_spark import kernels

    con = duckdb.connect()
    _duck_pairs(con, ADVERSARIAL_PAIRS)
    sql = (
        "WITH RECURSIVE jw_cand AS (SELECT * FROM tp),"
        + entry_mod._duckdb_jw_chain()
        + " SELECT idx_a, jw FROM jw_scored ORDER BY idx_a"
    )
    got = dict(con.sql(sql).fetchall())
    ker = kernels.jaro_winkler_batch(
        [a for a, _ in ADVERSARIAL_PAIRS], [b for _, b in ADVERSARIAL_PAIRS], 0.1
    )
    for i, want in enumerate(ker):
        assert abs(got[i] - float(want)) < 1e-12, (ADVERSARIAL_PAIRS[i], got[i], want)


def test_duckdb_lcs_chain_matches_kernel_on_adversarial_pairs():
    """The recursive-CTE indel ratio must equal
    ``kernels.lev_ratio_batch`` on the same constructed cases."""
    from datamatch_spark import kernels

    con = duckdb.connect()
    _duck_pairs(con, ADVERSARIAL_PAIRS)
    sql = (
        "WITH RECURSIVE lcs_in AS "
        "(SELECT idx_a, idx_b, s_a AS fa, s_b AS fb FROM tp),"
        + entry_mod._duckdb_lcs_chain()
        + " SELECT idx_a, ratio FROM lcs_out ORDER BY idx_a"
    )
    got = dict(con.sql(sql).fetchall())
    ker = kernels.lev_ratio_batch(
        [a for a, _ in ADVERSARIAL_PAIRS], [b for _, b in ADVERSARIAL_PAIRS]
    )
    for i, want in enumerate(ker):
        assert abs(got[i] - float(want)) < 1e-12, (ADVERSARIAL_PAIRS[i], got[i], want)


def _clique_chain_rows(con, edges):
    con.execute("CREATE OR REPLACE TABLE te (idx_a BIGINT, idx_b BIGINT)")
    if edges:
        con.executemany("INSERT INTO te VALUES (?, ?)", edges)
    sql = (
        "WITH RECURSIVE edges AS (SELECT idx_a, idx_b FROM te),"
        + entry_mod._duckdb_greedy_clique_chain()
        + " SELECT cluster_rep, doc_id FROM cliq"
    )
    return set(con.sql(sql).fetchall())


def test_duckdb_greedy_clique_chain_matches_engine_on_constructed_graphs():
    """The recursive-CTE greedy clique split must reproduce
    ``clustering._greedy_cliques`` (seeds ascending, LIFO stack,
    neighbors ascending, adjacent-to-all acceptance) exactly on graphs
    where the greedy ORDER matters: paths, stars, diamonds, bowties,
    barbells, plus a seeded random battery."""
    import random

    from datamatch_spark.clustering import _greedy_cliques

    graphs = [
        [],  # empty
        [(1, 2)],  # single edge
        [(1, 2), (2, 3)],  # path: split depends on walk order
        [(1, 2), (2, 3), (3, 4), (4, 5)],  # longer path
        [(1, 2), (1, 3), (1, 4), (1, 5)],  # star
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (3, 5)],  # bowtie at 3
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)],  # diamond + chord
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6)],  # barbell
        [(10, 2), (2, 30), (30, 10), (7, 8)],  # unsorted ids, 2 comps
    ]
    rng = random.Random(42)
    for _ in range(12):
        n = rng.randint(4, 14)
        m = rng.randint(n - 1, min(n * (n - 1) // 2, 3 * n))
        es = set()
        while len(es) < m:
            a, b = rng.sample(range(n), 2)
            es.add((min(a, b), max(a, b)))
        graphs.append(sorted(es))

    con = duckdb.connect()
    for edges in graphs:
        adjacency = {}
        for a, b in edges:
            adjacency.setdefault(a, set()).add(b)
            adjacency.setdefault(b, set()).add(a)
        want = set()
        for members in _greedy_cliques(adjacency.keys(), adjacency):
            rep = min(members)
            want |= {(rep, m) for m in members}
        got = _clique_chain_rows(con, edges)
        assert got == want, (edges, sorted(got), sorted(want))


def test_spans_matcher_oracle_precondition_no_separator_chars():
    """``spans_matcher_clusters`` round-trips (lastn, firstn) through
    ``concat_ws('|')`` + limit-2 split and (lang, source) through
    ':' — valid iff neither separator occurs in the corpus text or
    lang/source values. Pin it so a testdata regeneration can't
    silently desync the Spark projection from the oracle's direct
    field derivation."""
    con = duckdb.connect()
    n = con.sql(
        f"""SELECT count(*) FROM '{SF_DIR}/documents.parquet'
            WHERE text LIKE '%|%' OR lang LIKE '%|%' OR lang LIKE '%:%'
               OR source LIKE '%|%' OR source LIKE '%:%'"""
    ).fetchone()[0]
    assert n == 0
