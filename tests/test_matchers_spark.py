"""End-to-end ports of /root/reference/datamatch/test_matchers.py —
the primary equivalence oracles (golden cluster tables, pair lists,
report-frame shapes)."""

import pytest

from datamatch_spark import (
    AbsoluteScorer,
    ColumnsIndex,
    DissimilarFilter,
    JaroWinklerSimilarity,
    MaxScorer,
    NonOverlappingFilter,
    NoopIndex,
    SimSumScorer,
    StringSimilarity,
    Swap,
    ThresholdMatcher,
)


def rows6(df, cols):
    out = []
    for r in df.collect():
        out.append(
            tuple(
                round(r[c], 6) if isinstance(r[c], float) else r[c] for c in cols
            )
        )
    return out


@pytest.fixture(scope="module")
def match_matcher(spark):
    dfa = spark.createDataFrame(
        [(0, "ab", "cd"), (1, "rtx", "qw")], "row_key long, a string, b string"
    )
    dfb = spark.createDataFrame(
        [(0, "ab", "cd"), (1, "ae", "vb"), (2, "rt", "qw")],
        "row_key long, a string, b string",
    )
    return ThresholdMatcher(NoopIndex(), {"a": StringSimilarity()}, dfa, dfb)


def test_match_pairs(match_matcher):
    got = [
        (round(r["sim_score"], 6), r["idx_a"], r["idx_b"])
        for r in match_matcher.get_index_pairs_within_thresholds(0.0, 1.0).collect()
    ]
    assert got == [(0.8, 1, 2), (1.0, 0, 0)]
    assert match_matcher.collect_index_pairs_within_thresholds() == [(1, 2), (0, 0)]


def test_match_sample_pairs(match_matcher):
    cols = ["score_range", "pair_idx", "sim_score", "row_key", "a", "b"]
    got = rows6(match_matcher.get_sample_pairs(), cols)
    assert got == [
        ("1.00-0.95", 0, 1.0, 0, "ab", "cd"),
        ("1.00-0.95", 0, 1.0, 0, "ab", "cd"),
        ("0.85-0.80", 0, 0.8, 1, "rtx", "qw"),
        ("0.85-0.80", 0, 0.8, 2, "rt", "qw"),
    ]
    got = rows6(match_matcher.get_sample_pairs(include_exact_matches=False), cols)
    assert got == [
        ("0.85-0.80", 0, 0.8, 1, "rtx", "qw"),
        ("0.85-0.80", 0, 0.8, 2, "rt", "qw"),
    ]


def test_match_all_pairs(match_matcher):
    cols = ["pair_idx", "sim_score", "row_key", "a", "b"]
    got = rows6(match_matcher.get_all_pairs(), cols)
    assert got == [
        (0, 1.0, 0, "ab", "cd"),
        (0, 1.0, 0, "ab", "cd"),
        (1, 0.8, 1, "rtx", "qw"),
        (1, 0.8, 2, "rt", "qw"),
    ]
    got = rows6(match_matcher.get_all_pairs(include_exact_matches=False), cols)
    assert got == [(1, 0.8, 1, "rtx", "qw"), (1, 0.8, 2, "rt", "qw")]


def test_ensure_unique_index(spark):
    dfa = spark.createDataFrame([("a", 1), ("a", 2)], "row_key string, x long")
    dfb = spark.createDataFrame([("a", 1), ("b", 2)], "row_key string, x long")
    with pytest.raises(ValueError, match="duplicates"):
        ThresholdMatcher(NoopIndex(), {"x": StringSimilarity()}, dfa, dfb)


def test_ensure_same_columns(spark):
    dfa = spark.createDataFrame([("a", 1)], "row_key string, a long")
    dfb = spark.createDataFrame([("a", 1)], "row_key string, b long")
    with pytest.raises(ValueError, match="columns are not equal"):
        ThresholdMatcher(NoopIndex(), {"a": StringSimilarity()}, dfa, dfb)


@pytest.fixture(scope="module")
def dedup_matcher(spark):
    rows = [
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
    df = spark.createDataFrame(
        [(i, l, f) for i, (l, f) in enumerate(rows)],
        "row_key long, last string, first string",
    )
    return ThresholdMatcher(
        NoopIndex(),
        {"last": JaroWinklerSimilarity(), "first": JaroWinklerSimilarity()},
        df,
    )


def test_deduplicate_clusters(dedup_matcher):
    got = sorted(
        tuple(sorted(c))
        for c in dedup_matcher.get_index_clusters_within_thresholds(0.83)
    )
    assert got == [(0, 1, 8), (2, 3, 9), (4, 5), (6, 7), (10, 12, 13)]


def test_deduplicate_golden_table(dedup_matcher):
    # exact port of the reference golden table
    # (test_matchers.py:150-176), scores to 6dp
    cols = ["cluster_idx", "pair_idx", "sim_score", "row_key", "last", "first"]
    got = rows6(dedup_matcher.get_clusters_within_threshold(0.83), cols)
    assert got == [
        (0, 0, 0.990522, 6, "rhea", "cherri"),
        (0, 0, 0.990522, 7, "rhea", "cherrie"),
        (1, 0, 0.985297, 10, "teneisha", "green"),
        (1, 0, 0.985297, 12, "te neisha", "green"),
        (1, 1, 0.878609, 10, "teneisha", "green"),
        (1, 1, 0.878609, 13, "t", "green"),
        (1, 2, 0.876863, 12, "te neisha", "green"),
        (1, 2, 0.876863, 13, "t", "green"),
        (2, 0, 0.980748, 2, "dupas", "demia"),
        (2, 0, 0.980748, 3, "dupas", "demeia"),
        (2, 1, 0.923472, 3, "dupas", "demeia"),
        (2, 1, 0.923472, 9, "du", "demeia"),
        (2, 2, 0.902589, 2, "dupas", "demia"),
        (2, 2, 0.902589, 9, "du", "demeia"),
        (3, 0, 0.941913, 4, "brown", "latoya"),
        (3, 0, 0.941913, 5, "bowen", "latoya"),
        (4, 0, 0.939581, 0, "beech", "freddie"),
        (4, 0, 0.939581, 1, "beech", "freedie"),
        (4, 1, 0.923472, 1, "beech", "freedie"),
        (4, 1, 0.923472, 8, "be", "freedie"),
        (4, 2, 0.857679, 0, "beech", "freddie"),
        (4, 2, 0.857679, 8, "be", "freedie"),
    ]


def test_swap_variator_e2e(spark):
    rows = [
        ("blake", "lauri"),
        ("lauri", "blake"),
        ("robinson", "alexis"),
        ("robertson", "alexis"),
        ("haynes", "terry"),
        ("terry", "hayes"),
    ]
    df = spark.createDataFrame(
        [(i, l, f) for i, (l, f) in enumerate(rows)],
        "row_key long, last string, first string",
    )
    m = ThresholdMatcher(
        NoopIndex(),
        {"last": JaroWinklerSimilarity(), "first": JaroWinklerSimilarity()},
        df,
        variator=Swap("first", "last"),
    )
    assert m.collect_index_pairs_within_thresholds() == [(2, 3), (4, 5), (0, 1)]


def test_filters_e2e(spark):
    rows = [
        ("1", "john", "slidell pd", 0, 10),
        ("2", "john", "slidell pd", 10, 20),
        ("3", "john", "slidell pd", 20, 30),
        ("4", "john", "gretna pd", 11, 21),
        ("5", "john", "gretna pd", 0, 7),
        ("6", "john", "gretna pd", 10, 18),
    ]
    df = spark.createDataFrame(
        [(i,) + r for i, r in enumerate(rows)],
        "row_key long, uid string, first string, agency string, start long, end long",
    )
    m = ThresholdMatcher(
        NoopIndex(),
        {"first": JaroWinklerSimilarity()},
        df,
        filters=[DissimilarFilter("agency"), NonOverlappingFilter("start", "end")],
    )
    assert m.collect_index_pairs_within_thresholds() == [(0, 3), (1, 4), (2, 4), (2, 5)]


def test_scorer_e2e_golden(spark):
    df = spark.createDataFrame(
        [(0, "john", 5), (1, "jim", 5), (2, "ted", 3), (3, "tedd", 2)],
        "row_key long, first_name string, attract_id long",
    )
    m = ThresholdMatcher(
        NoopIndex(),
        MaxScorer(
            [
                AbsoluteScorer("attract_id", 1),
                SimSumScorer({"first_name": JaroWinklerSimilarity()}),
            ]
        ),
        df,
    )
    cols = ["cluster_idx", "pair_idx", "sim_score", "row_key", "first_name", "attract_id"]
    got = rows6(m.get_clusters_within_threshold(), cols)
    assert got == [
        (0, 0, 1.0, 0, "john", 5),
        (0, 0, 1.0, 1, "jim", 5),
        (1, 0, 0.941667, 2, "ted", 3),
        (1, 0, 0.941667, 3, "tedd", 2),
    ]
    # all-exact cluster excluded but cluster_idx keeps the gap
    got = rows6(m.get_clusters_within_threshold(include_exact_matches=False), cols)
    assert got == [
        (1, 0, 0.941667, 2, "ted", 3),
        (1, 0, 0.941667, 3, "tedd", 2),
    ]


def test_func_scorer_e2e(spark):
    df = spark.createDataFrame(
        [(0, "j", "john", 20), (1, "j", "jim", 20), (2, "b", "bill", 19), (3, "b", "bob", 21)],
        "row_key long, fc string, name string, age long",
    )
    m = ThresholdMatcher(
        ColumnsIndex("fc"),
        lambda a, b: 1.0 if a.age == b.age else 0.8,
        df,
    )
    cols = ["cluster_idx", "pair_idx", "sim_score", "row_key", "fc", "name", "age"]
    got = rows6(m.get_clusters_within_threshold(), cols)
    assert got == [
        (0, 0, 1.0, 0, "j", "john", 20),
        (0, 0, 1.0, 1, "j", "jim", 20),
        (1, 0, 0.8, 2, "b", "bill", 19),
        (1, 0, 0.8, 3, "b", "bob", 21),
    ]


def test_decision_counts(dedup_matcher):
    row = dedup_matcher.decision_counts(0.83).collect()[0]
    assert row["match_threshold"] == 0.83
    n_pairs = len(dedup_matcher.collect_index_pairs_within_thresholds(0.83, 1.0))
    assert row["number_of_matched_pairs"] == n_pairs
    assert n_pairs >= 11


def test_sample_pairs_property_random_scores(spark):
    """get_sample_pairs vs an independent reimplementation of the
    reference slicing semantics (matchers.py:292-338) on a random
    score distribution: per range, the sample_counts LOWEST pairs
    under the (score, idx_a, idx_b) total order, pair_idx descending;
    exercises the two-phase bottom-k over many input partitions."""
    import random

    import numpy as np

    from datamatch_spark import AbsoluteNumericalSimilarity, ColumnsIndex, ThresholdMatcher

    rng = random.Random(1234)
    n = 400
    rows = [(i, "g", rng.uniform(0.0, 1000.0)) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, g string, v double").repartition(16)
    k = 4
    m = ThresholdMatcher(
        ColumnsIndex("g"),
        {"v": AbsoluteNumericalSimilarity(1000)},
        df,
        row_key="id",
        validate=False,
    )
    lower, upper, step = 0.7, 1.0, 0.05
    got = [
        (r["score_range"], r["pair_idx"], round(r["sim_score"], 9), r["row_key"])
        for r in m.get_sample_pairs(k, lower, upper, step).collect()
    ]

    # independent emulation over the same scored pairs
    scored = [
        (r["sim_score"], r["idx_a"], r["idx_b"])
        for r in m.scored_pairs.collect()
    ]
    bounds = list(np.arange(upper, lower, -step)) + [lower]
    want = []
    assigned = set()
    for i in range(len(bounds) - 1):
        hi, lo = float(bounds[i]), float(bounds[i + 1])
        bucket = sorted(
            p for p in scored
            if p not in assigned and lo < p[0] <= hi
        )
        chosen = bucket[:k]
        assigned.update(chosen)
        mlen = len(chosen)
        label = "%.2f-%.2f" % (hi, lo)
        for rank, (s, ia, ib) in enumerate(chosen):
            for key in (ia, ib):
                want.append((label, mlen - 1 - rank, round(s, 9), key))
    assert sorted(got) == sorted(want)


def test_excel_sinks_via_stdlib_writer(spark, tmp_path):
    """No Excel engine is installed in this container, so the sinks
    fall back to the stdlib SpreadsheetML writer; read the workbook
    back by unzipping and parsing the sheet XML."""
    import zipfile
    import xml.etree.ElementTree as ET

    rows = [
        (0, "g1", "freddie"), (1, "g1", "freedie"),
        (2, "g2", "cherri"), (3, "g2", "cherrie"),
    ]
    df = spark.createDataFrame(rows, "row_key long, g string, name string")
    m = ThresholdMatcher(
        ColumnsIndex("g"), {"name": JaroWinklerSimilarity()}, df, validate=False
    )
    ns = {"x": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}

    def read_book(path):
        out = {}
        with zipfile.ZipFile(path) as z:
            wb = ET.fromstring(z.read("xl/workbook.xml"))
            names = [s.get("name") for s in wb.findall(".//x:sheet", ns)]
            for i, name in enumerate(names, start=1):
                sheet = ET.fromstring(z.read(f"xl/worksheets/sheet{i}.xml"))
                rows_out = []
                for row in sheet.findall(".//x:row", ns):
                    vals = []
                    for c in row.findall("x:c", ns):
                        if c.get("t") == "inlineStr":
                            vals.append(c.find(".//x:t", ns).text)
                        else:
                            v = c.find("x:v", ns)
                            vals.append(None if v is None else v.text)
                    rows_out.append(vals)
                out[name] = rows_out
        return out

    p1 = str(tmp_path / "pairs.xlsx")
    m.save_pairs_to_excel(p1, match_threshold=0.9, lower_bound=0.5)
    book = read_book(p1)
    assert list(book) == ["Sample pairs", "All pairs", "Decision"]
    all_pairs = book["All pairs"]
    want = m.get_all_pairs(0.5, 1.0)
    assert all_pairs[0] == want.columns
    assert len(all_pairs) - 1 == want.count()
    dec = book["Decision"]
    assert dec[0] == ["match_threshold", "number_of_matched_pairs"]
    assert float(dec[1][0]) == 0.9

    p2 = str(tmp_path / "clusters.xlsx")
    m.save_clusters_to_excel(p2, match_threshold=0.9, lower_bound=0.5)
    book2 = read_book(p2)
    assert list(book2) == ["All clusters", "Decision"]
    assert len(book2["All clusters"]) - 1 == m.get_clusters_within_threshold(0.5).count()


def test_print_decision_output(spark, capsys):
    rows = [(0, "g", "aa"), (1, "g", "aa"), (2, "g", "zz")]
    df = spark.createDataFrame(rows, "row_key long, g string, name string")
    m = ThresholdMatcher(
        ColumnsIndex("g"), {"name": StringSimilarity()}, df, validate=False
    )
    m.print_decision(0.9)
    out = capsys.readouterr().out
    assert "for threshold 0.900:" in out
    # exactly one pair scores 1.0 (rows 0-1); 2 of 3 rows = 66%
    assert "1 matched pairs (33% of A, 33% of B)" in out


def test_match_mode_sorted_neighborhood_e2e(spark):
    """ThresholdMatcher accepts SortedNeighborhoodIndex in match mode
    (tagged-union ranking flows through the matcher facade, greedy 1:1
    pruning included)."""
    from datamatch_spark import (
        AbsoluteNumericalSimilarity,
        SortedNeighborhoodIndex,
        ThresholdMatcher,
    )

    rows_a = [(i, float(10 * i)) for i in range(20)]
    rows_b = [(100 + i, float(10 * i + 1)) for i in range(20)]
    dfa = spark.createDataFrame(rows_a, "id long, v double")
    dfb = spark.createDataFrame(rows_b, "id long, v double")
    m = ThresholdMatcher(
        SortedNeighborhoodIndex("v", window=3),
        {"v": AbsoluteNumericalSimilarity(5)},
        dfa,
        dfb=dfb,
        row_key="id",
        validate=False,
    )
    got = {(r["idx_a"], r["idx_b"]) for r in m.get_index_pairs_within_thresholds(0.5, 1.0).collect()}
    # each a=10i is adjacent to b=10i+1 in the merged sort; |diff|=1 ->
    # score 0.8; greedy 1:1 keeps exactly the i<->i matching
    assert got == {(i, 100 + i) for i in range(20)}
