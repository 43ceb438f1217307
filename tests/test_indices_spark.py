"""Ports of /root/reference/datamatch/test_indices.py to the Spark
surface: an index compiles to key_df(df) = (row_key, block_key); the
reference's bucket contents correspond to the row groups per key.
"""

import pytest

from datamatch_spark import ColumnsIndex, MultiIndex, NoopIndex


def groups(kdf):
    """block_key -> frozenset(row keys)."""
    out = {}
    for r in kdf.collect():
        out.setdefault(r["block_key"], set()).add(r["row_key"])
    return {k: frozenset(v) for k, v in out.items()}


@pytest.fixture
def simple_cd(spark):
    return spark.createDataFrame(
        [("x", 1, 2), ("y", 2, 4), ("z", 3, 4)], "row_key string, c long, d long"
    )


def test_noop_index(spark, simple_cd):
    g = groups(NoopIndex().key_df(simple_cd, "row_key"))
    assert list(g.values()) == [frozenset({"x", "y", "z"})]


def test_columns_index_single(spark, simple_cd):
    g = groups(ColumnsIndex("c").key_df(simple_cd, "row_key"))
    assert sorted(g.values(), key=len) == [
        frozenset({"x"}),
        frozenset({"y"}),
        frozenset({"z"}),
    ]
    assert len(g) == 3


def test_columns_index_multi(spark, simple_cd):
    g = groups(ColumnsIndex(["c", "d"]).key_df(simple_cd, "row_key"))
    assert len(g) == 3
    assert all(len(v) == 1 for v in g.values())


def test_ignore_key_error(spark, simple_cd):
    with pytest.raises(KeyError):
        ColumnsIndex("nope").key_df(simple_cd, "row_key")
    kdf = ColumnsIndex("nope", ignore_key_error=True).key_df(simple_cd, "row_key")
    assert kdf.count() == 0


def test_null_keys_never_pair(spark):
    df = spark.createDataFrame(
        [("x", None), ("y", None), ("z", "k")], "row_key string, c string"
    )
    g = groups(ColumnsIndex("c").key_df(df, "row_key"))
    # NaN blocking keys put rows in singleton buckets in the reference
    # (indices.py:129-132 + NaN identity) — here the key is NULL and is
    # dropped, so such rows never pair: same observable behavior.
    assert g == {"s:k": frozenset({"z"})}


def test_index_elements(spark):
    df = spark.createDataFrame(
        [(0, ["a", "b"], "q"), (1, ["c"], "w"), (2, ["b"], "e")],
        "row_key long, col1 array<string>, col2 string",
    )
    g = groups(ColumnsIndex("col1", index_elements=True).key_df(df, "row_key"))
    assert g == {
        "s:a": frozenset({0}),
        "s:b": frozenset({0, 2}),
        "s:c": frozenset({1}),
    }


def test_index_elements_multi_columns(spark):
    df = spark.createDataFrame(
        [(0, ["a", "b"], [1]), (1, ["c"], [2, 3]), (2, ["b"], [1])],
        "row_key long, col1 array<string>, col3 array<long>",
    )
    g = groups(
        ColumnsIndex(["col1", "col3"], index_elements=True).key_df(df, "row_key")
    )
    # element-product keys: ('a',1) ('b',1) ('c',2) ('c',3)
    assert g == {
        "s:a\x1fn:1.0": frozenset({0}),
        "s:b\x1fn:1.0": frozenset({0, 2}),
        "s:c\x1fn:2.0": frozenset({1}),
        "s:c\x1fn:3.0": frozenset({1}),
    }


def test_index_elements_requires_array(spark, simple_cd):
    with pytest.raises(ValueError):
        ColumnsIndex("c", index_elements=True).key_df(simple_cd, "row_key")


def test_multi_index_or_merges_equal_keys(spark, simple_cd):
    idx = MultiIndex([ColumnsIndex("c"), ColumnsIndex("d")])
    g = groups(idx.key_df(simple_cd, "row_key"))
    # the critical reference behavior (test_indices.py:157-159): bucket
    # (2,) holds x (via d=2) AND y (via c=2) — merged across sub-indices
    assert g == {
        "n:1.0": frozenset({"x"}),
        "n:2.0": frozenset({"x", "y"}),
        "n:3.0": frozenset({"z"}),
        "n:4.0": frozenset({"y", "z"}),
    }


def test_multi_index_and_composite_keys(spark, simple_cd):
    idx = MultiIndex([ColumnsIndex("c"), ColumnsIndex("d")], combine_keys=True)
    g = groups(idx.key_df(simple_cd, "row_key"))
    assert g == {
        "n:1.0\x1en:2.0": frozenset({"x"}),
        "n:2.0\x1en:4.0": frozenset({"y"}),
        "n:3.0\x1en:4.0": frozenset({"z"}),
    }


def test_numeric_key_canonicalization(spark):
    # int 2 and double 2.0 must land in the same bucket ((2,) == (2.0,)
    # as reference dict keys)
    df1 = spark.createDataFrame([("x", 2)], "row_key string, c long")
    df2 = spark.createDataFrame([("y", 2.0)], "row_key string, c double")
    k1 = ColumnsIndex("c").key_df(df1, "row_key").collect()[0]["block_key"]
    k2 = ColumnsIndex("c").key_df(df2, "row_key").collect()[0]["block_key"]
    assert k1 == k2


def test_separator_bytes_in_values_cannot_collide(spark):
    """("a\\x1fb", "c") and ("a", "b\\x1fc") are DIFFERENT key tuples;
    separator bytes inside string values are escaped out so the
    serialized keys differ (and plain values round-trip unchanged)."""
    df = spark.createDataFrame(
        [(0, "a\x1fb", "c"), (1, "a", "b\x1fc"), (2, "a\x1fb", "c")],
        "row_key long, u string, v string",
    )
    keys = ColumnsIndex(["u", "v"]).key_df(df, "row_key").collect()
    by_key = {}
    for r in keys:
        by_key.setdefault(r["block_key"], set()).add(r["row_key"])
    assert by_key[
        next(k for k in by_key if 0 in by_key[k])
    ] == {0, 2}
    assert len(by_key) == 2  # rows 0/2 share a bucket; row 1 is alone


class TestSortedNeighborhood:
    def _pairs(self, df, idx):
        from datamatch_spark.pairing import candidate_pairs

        return {
            (r["idx_a"], r["idx_b"])
            for r in candidate_pairs(df, idx, "row_key", []).collect()
        }

    def test_pairs_match_bruteforce_window(self, spark):
        """candidate_pairs(SortedNeighborhoodIndex) == all pairs whose
        positions in the (val, row_key) sort order differ by < window."""
        import random

        from datamatch_spark import SortedNeighborhoodIndex

        rnd = random.Random(7)
        rows = [(i, rnd.randint(0, 30)) for i in range(60)]
        df = spark.createDataFrame(rows, "row_key long, val long")
        for w in (2, 4, 7):
            got = self._pairs(df, SortedNeighborhoodIndex("val", window=w))
            order = [k for k, _ in sorted(rows, key=lambda r: (r[1], r[0]))]
            want = {
                (min(order[i], order[j]), max(order[i], order[j]))
                for i in range(len(order))
                for j in range(i + 1, min(i + w, len(order)))
            }
            assert got == want, (w, len(got), len(want))

    def test_null_sort_key_never_pairs(self, spark):
        from datamatch_spark import SortedNeighborhoodIndex

        df = spark.createDataFrame(
            [(0, "a"), (1, None), (2, "b")], "row_key long, val string"
        )
        got = self._pairs(df, SortedNeighborhoodIndex("val", window=3))
        assert got == {(0, 2)}

    def test_match_mode_tagged_union(self, spark):
        """Match mode (Hernández-Stolfo linkage SNI): rank the tagged
        union of A and B once; a-b become candidates iff their merged
        sort positions differ by < window. Brute-force cross-check."""
        import random

        from datamatch_spark import SortedNeighborhoodIndex
        from datamatch_spark.pairing import candidate_pairs

        rnd = random.Random(11)
        rows_a = [(i, rnd.randint(0, 25)) for i in range(40)]
        rows_b = [(100 + i, rnd.randint(0, 25)) for i in range(35)]
        dfa = spark.createDataFrame(rows_a, "row_key long, val long")
        dfb = spark.createDataFrame(rows_b, "row_key long, val long")
        for w in (2, 5):
            got = {
                (r["idx_a"], r["idx_b"])
                for r in candidate_pairs(
                    dfa, SortedNeighborhoodIndex("val", window=w),
                    "row_key", [], dfb=dfb,
                ).collect()
            }
            union = [(k, v, 0) for k, v in rows_a] + [
                (k, v, 1) for k, v in rows_b
            ]
            order = [
                (k, s)
                for k, v, s in sorted(union, key=lambda r: (r[1], r[2], r[0]))
            ]
            want = set()
            for i in range(len(order)):
                for j in range(i + 1, min(i + w, len(order))):
                    (ka, sa), (kb, sb) = order[i], order[j]
                    if sa == 0 and sb == 1:
                        want.add((ka, kb))
                    elif sa == 1 and sb == 0:
                        want.add((kb, ka))
            assert got == want, (w, len(got), len(want))

    def test_match_mode_nested_in_multiindex_rejected(self, spark):
        """Per-dataset SNI ranks are incomparable across datasets, so a
        match-mode MultiIndex containing an SNI must raise (there is no
        joint two-dataset form for the composition)."""
        from datamatch_spark import ColumnsIndex, MultiIndex, SortedNeighborhoodIndex
        from datamatch_spark.pairing import candidate_pairs

        df = spark.createDataFrame([(0, "a", 1)], "row_key long, val string, n long")
        idx = MultiIndex([SortedNeighborhoodIndex("n"), ColumnsIndex("val")])
        with pytest.raises(ValueError, match="match mode"):
            candidate_pairs(df, idx, "row_key", [], dfb=df)

    def test_window_lt_2_rejected(self):
        from datamatch_spark import SortedNeighborhoodIndex

        with pytest.raises(ValueError, match="window"):
            SortedNeighborhoodIndex("val", window=1)

    def test_multiindex_or_composition(self, spark):
        """OR with a ColumnsIndex: union of neighborhood pairs and
        equal-value pairs (the classic multi-pass blocking setup)."""
        from datamatch_spark import ColumnsIndex, MultiIndex, SortedNeighborhoodIndex

        rows = [(0, 10, "x"), (1, 11, "y"), (2, 30, "x"), (3, 31, "z")]
        df = spark.createDataFrame(rows, "row_key long, num long, cat string")
        idx = MultiIndex(
            [SortedNeighborhoodIndex("num", window=2), ColumnsIndex("cat")]
        )
        got = self._pairs(df, idx)
        # window-2 over num order 10,11,30,31 -> (0,1),(1,2),(2,3); cat adds (0,2)
        assert got == {(0, 1), (1, 2), (2, 3), (0, 2)}


class TestQGram:
    def _pairs(self, df, idx):
        from datamatch_spark.pairing import candidate_pairs

        return {
            (r["idx_a"], r["idx_b"])
            for r in candidate_pairs(df, idx, "row_key", []).collect()
        }

    def test_pairs_match_bruteforce_shared_gram(self, spark):
        from datamatch_spark import QGramIndex

        names = ["smith", "smyth", "smithe", "jones", "jonas", "ng", "n", None]
        rows = list(enumerate(names))
        df = spark.createDataFrame(rows, "row_key long, name string")

        def grams(s, q=3):
            s = s.lower()
            if len(s) < q:
                return {s}
            return {s[i:i + q] for i in range(len(s) - q + 1)}

        want = {
            (i, j)
            for i, a in rows for j, b in rows
            if i < j and a is not None and b is not None
            and grams(a) & grams(b)
        }
        got = self._pairs(df, QGramIndex("name", q=3))
        assert got == want
        # typo robustness: smith/smyth share "th"? no — they share no
        # 3-gram? smith: smi,mit,ith; smyth: smy,myt,yth -> disjoint;
        # smith/smithe share smi,mit,ith -> paired
        assert (0, 2) in got

    def test_short_and_null_keys(self, spark):
        from datamatch_spark import QGramIndex

        df = spark.createDataFrame(
            [(0, "ab"), (1, "ab"), (2, None), (3, "xy")],
            "row_key long, name string",
        )
        got = self._pairs(df, QGramIndex("name", q=3))
        assert got == {(0, 1)}  # whole-string gram for short keys; null drops

    def test_q_validation(self):
        from datamatch_spark import QGramIndex

        import pytest as _pytest
        with _pytest.raises(ValueError):
            QGramIndex("name", q=0)


class TestPhonetic:
    def _pairs(self, df, idx):
        from datamatch_spark.pairing import candidate_pairs

        return {
            (r["idx_a"], r["idx_b"])
            for r in candidate_pairs(df, idx, "row_key", []).collect()
        }

    @staticmethod
    def _soundex(s):
        """Independent American Soundex reimplementation (first letter +
        3 digits; adjacent same-code letters collapse; h/w transparent
        between same-code consonants; vowels break runs)."""
        codes = {}
        for group, d in [("bfpv", "1"), ("cgjkqsxz", "2"), ("dt", "3"),
                         ("l", "4"), ("mn", "5"), ("r", "6")]:
            for ch in group:
                codes[ch] = d
        s = s.lower()
        if not s or not s[0].isalpha():
            return s.upper()
        out = s[0].upper()
        prev = codes.get(s[0], "")
        for ch in s[1:]:
            d = codes.get(ch, "")
            if d and d != prev:
                out += d
                if len(out) == 4:
                    break
            if ch not in "hw":
                prev = d
        return (out + "000")[:4]

    def test_pairs_match_bruteforce_soundex(self, spark):
        from datamatch_spark import PhoneticIndex

        names = ["smith", "smyth", "meyer", "myer", "jones", "johnson",
                 "robert", "rupert", None]
        rows = list(enumerate(names))
        df = spark.createDataFrame(rows, "row_key long, name string")
        want = {
            (i, j)
            for i, a in rows for j, b in rows
            if i < j and a is not None and b is not None
            and self._soundex(a) == self._soundex(b)
        }
        got = self._pairs(df, PhoneticIndex("name"))
        assert got == want
        assert (0, 1) in got  # smith ~ smyth
        assert (2, 3) in got  # meyer ~ myer
        assert (6, 7) in got  # robert ~ rupert (classic soundex pair)

    def test_or_composition_with_equality(self, spark):
        from datamatch_spark import ColumnsIndex, MultiIndex, PhoneticIndex

        rows = [(0, "smith", "x"), (1, "smyth", "y"), (2, "abc", "y")]
        df = spark.createDataFrame(rows, "row_key long, name string, g string")
        got = self._pairs(
            df, MultiIndex([PhoneticIndex("name"), ColumnsIndex("g")])
        )
        assert got == {(0, 1), (1, 2)}


class TestQGramStopGrams:
    def _pairs(self, df, idx):
        from datamatch_spark.pairing import candidate_pairs

        return {
            (r["idx_a"], r["idx_b"])
            for r in candidate_pairs(df, idx, "row_key", []).collect()
        }

    def test_stop_gram_cap_keeps_candidates_linear(self, spark):
        """A constant key prefix ('src...') makes one gram corpus-wide;
        uncapped that faithfully reproduces the full C(n,2) cross
        product — the 100x-scale killer. With max_df the stop-grams
        drop and candidate volume collapses to the rare-gram pairs,
        while a planted typo pair sharing a RARE gram survives."""
        from datamatch_spark import QGramIndex

        n = 300
        rows = [(i, f"src{i:04d}") for i in range(n)]
        # planted near-dup: same rare suffix grams, different ids
        rows += [(n, "srczz77"), (n + 1, "srczz77x")]
        df = spark.createDataFrame(rows, "row_key long, name string")

        uncapped = self._pairs(df, QGramIndex("name", q=3, max_df=None, max_df_frac=None))
        total = (n + 2) * (n + 1) // 2
        assert len(uncapped) == total  # every key shares the 'src' gram

        capped = self._pairs(df, QGramIndex("name", q=3, max_df=30))
        assert len(capped) < total * 0.2, len(capped)
        assert (n, n + 1) in capped  # rare-gram typo pair survives

        # default fractional cap: 10% of 302 rows = 31 -> floor(50)
        # governs, and the corpus-wide grams (df ~302 > 50) still drop
        default_cap = self._pairs(df, QGramIndex("name", q=3))
        assert len(default_cap) < total * 0.2
        assert (n, n + 1) in default_cap

    def test_capped_qgram_warns_by_default(self, spark, caplog):
        """ADVICE r4: the default cap is a silent recall trade unless
        it announces itself — key_df with an active cap logs a warning
        naming the cap and the stop_grams escape hatch; the uncapped
        index stays quiet."""
        import logging

        from datamatch_spark import QGramIndex

        df = spark.createDataFrame(
            [(i, f"name{i:03d}") for i in range(10)], "row_key long, name string"
        )
        with caplog.at_level(logging.WARNING, logger="datamatch_spark.indices"):
            QGramIndex("name", q=3).key_df(df, "row_key")
        assert any("stop_grams" in r.message for r in caplog.records)
        caplog.clear()
        with caplog.at_level(logging.WARNING, logger="datamatch_spark.indices"):
            QGramIndex("name", q=3, max_df=None, max_df_frac=None).key_df(
                df, "row_key"
            )
        assert not caplog.records

    def test_stop_grams_report(self, spark):
        from datamatch_spark import QGramIndex

        rows = [(i, f"pre{i:03d}") for i in range(60)]
        df = spark.createDataFrame(rows, "row_key long, name string")
        idx = QGramIndex("name", q=3, max_df=30)
        hot = {r[0]: r["__df"] for r in idx.stop_grams(df, "row_key").collect()}
        assert "q:pre" in hot and hot["q:pre"] == 60
        # uncapped index reports nothing
        none_idx = QGramIndex("name", q=3, max_df=None, max_df_frac=None)
        assert none_idx.stop_grams(df, "row_key").count() == 0

    def test_frequent_short_keys_still_block_under_cap(self, spark):
        """Whole-string grams of sub-q keys are equality blocks, exempt
        from the stop-gram cap — frequent short keys must keep pairing
        (they are a hot BLOCK for the salted join, not a stop-gram),
        while a hot PROPER gram still drops."""
        from datamatch_spark import QGramIndex

        rows = [(i, "ab") for i in range(80)]            # frequent short key
        rows += [(100 + i, f"abc{i:03d}x") for i in range(80)]  # share 'abc'...
        df = spark.createDataFrame(rows, "row_key long, name string")
        got = self._pairs(df, QGramIndex("name", q=3, max_df=40))
        short_pairs = {(i, j) for i in range(80) for j in range(i + 1, 80)}
        assert short_pairs <= got  # equality blocking survives the cap
        # hot proper grams ('abc', 'bc0'...) dropped: long keys pair only
        # via rare suffix grams, far below their cross product
        long_pairs = {(a, b) for a, b in got if a >= 100}
        assert len(long_pairs) < 500

    def test_stop_grams_schema_stable(self, spark):
        """__df is long in both the capped and uncapped branches (the
        frames must union/append cleanly into one metrics table)."""
        from datamatch_spark import QGramIndex

        df = spark.createDataFrame([(0, "abcd")], "row_key long, name string")
        capped = QGramIndex("name", max_df=1).stop_grams(df, "row_key")
        uncapped = QGramIndex(
            "name", max_df=None, max_df_frac=None
        ).stop_grams(df, "row_key")
        assert capped.schema["__df"].dataType == uncapped.schema["__df"].dataType
        capped.unionByName(uncapped).collect()


class TestQGramCapRepeatedCalls:
    def test_prune_applies_on_every_key_df_call(self, spark):
        """Regression (review r5): the warn-once gate must not gate the
        PRUNE — the second key_df call on one instance (match mode's
        side b, metrics re-derivation, index reuse) must still drop
        stop-grams."""
        from datamatch_spark import QGramIndex

        rows = [(i, f"pre{i:03d}") for i in range(60)]
        df = spark.createDataFrame(rows, "row_key long, name string")
        idx = QGramIndex("name", q=3, max_df=30)
        first = idx.key_df(df, "row_key")
        second = idx.key_df(df, "row_key")
        hot = {r["block_key"] for r in first.collect()}
        hot2 = {r["block_key"] for r in second.collect()}
        assert "q:pre" not in hot
        assert hot2 == hot  # identical pruned keys on the second call


def test_negative_zero_blocks_with_positive_zero(spark):
    """-0.0 == 0.0 must land in ONE bucket (the reference's tuple keys
    hash them together); review r5 caught '-0.0' vs '0.0' string keys."""
    from datamatch_spark import ColumnsIndex
    from datamatch_spark.pairing import candidate_pairs

    df = spark.createDataFrame(
        [(0, -0.0), (1, 0.0), (2, 5.0)], "row_key long, v double"
    )
    pairs = {
        (r["idx_a"], r["idx_b"])
        for r in candidate_pairs(df, ColumnsIndex("v"), "row_key", []).collect()
    }
    assert pairs == {(0, 1)}
