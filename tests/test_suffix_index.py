"""SuffixArrayIndex (Aizawa & Oyama 2005; Christen 2012 §4.5):
brute-force pair parity, short/null keys, the too-frequent-suffix cap
with the whole-string equality exemption, stop_suffixes observability,
and match mode. No reference counterpart — the reference stops at
value-equality blocking (/root/reference/datamatch/indices.py)."""

import pytest

from datamatch_spark import SuffixArrayIndex
from datamatch_spark.pairing import candidate_pairs


def _suffixes(s, min_len=4):
    s = s.lower()
    if len(s) <= min_len:
        return {s}
    return {s[i:] for i in range(len(s) - min_len + 1)}


def _pairs(df, idx, dfb=None):
    return {
        (r["idx_a"], r["idx_b"])
        for r in candidate_pairs(df, idx, "row_key", [], dfb=dfb).collect()
    }


def test_pairs_match_bruteforce_shared_suffix(spark):
    names = [
        "christen", "kristen", "catherine", "katherine",
        "smith", "smyth", "ng", "n", None, "",
    ]
    rows = list(enumerate(names))
    df = spark.createDataFrame(rows, "row_key long, name string")
    want = {
        (i, j)
        for i, a in rows for j, b in rows
        if i < j and a not in (None, "") and b not in (None, "")
        and _suffixes(a) & _suffixes(b)
    }
    got = _pairs(df, SuffixArrayIndex("name", min_len=4))
    assert got == want
    # prefix corruption is the method's home turf:
    assert (0, 1) in got  # christen/kristen share "risten"
    assert (2, 3) in got  # catherine/katherine share "atherine"
    # smith/smyth share no >=4-suffix ("mith,smith" vs "myth,smyth")
    assert (4, 5) not in got


def test_short_and_null_keys(spark):
    df = spark.createDataFrame(
        [(0, "ab"), (1, "ab"), (2, None), (3, "xy"), (4, "AB")],
        "row_key long, name string",
    )
    # whole-string suffix for sub-min_len keys; lowercased; null drops
    assert _pairs(df, SuffixArrayIndex("name", min_len=4)) == {(0, 1), (0, 4), (1, 4)}


def test_cap_drops_hot_suffix_but_not_whole_string_blocks(spark):
    # "ington" tail shared by 5 rows -> df=5 over cap=4 for every
    # shared suffix; they must stop pairing through those suffixes.
    hot = [f"w{i}shington" for i in range(5)]  # only "shington"+ shared
    rows = list(enumerate(hot + ["abcd", "abcd", "abcd", "abcd", "abcd"]))
    df = spark.createDataFrame(rows, "row_key long, name string")
    idx_uncapped = SuffixArrayIndex("name", min_len=4)
    idx_capped = SuffixArrayIndex("name", min_len=4, max_block_size=4)
    got_uncapped = _pairs(df, idx_uncapped)
    got_capped = _pairs(df, idx_capped)
    hot_pairs = {(i, j) for i in range(5) for j in range(5) if i < j}
    whole_pairs = {(i, j) for i in range(5, 10) for j in range(5, 10) if i < j}
    assert hot_pairs <= got_uncapped and whole_pairs <= got_uncapped
    # capped: the hot shared suffixes ("shington","hington",...) have
    # df=5 > 4 and drop; no other suffix is shared among those rows
    assert got_capped & hot_pairs == set()
    # whole-string "abcd" blocks have df=5 > 4 too but are EQUALITY
    # blocks (len <= min_len) — exempt from the cap
    assert whole_pairs <= got_capped


def test_stop_suffixes_observability(spark):
    rows = [(i, f"w{i}shington") for i in range(5)]
    df = spark.createDataFrame(rows, "row_key long, name string")
    idx = SuffixArrayIndex("name", min_len=4, max_block_size=4)
    stops = {
        r["block_key"]: r["__df"]
        for r in idx.stop_suffixes(df, "row_key").collect()
    }
    assert stops["sa:shington"] == 5
    assert all(v > 4 for v in stops.values())
    # uncapped index reports an empty stop frame
    empty = SuffixArrayIndex("name", min_len=4).stop_suffixes(df, "row_key")
    assert empty.count() == 0


def test_match_mode_two_datasets(spark):
    dfa = spark.createDataFrame(
        [(0, "christen"), (1, "jones")], "row_key long, name string"
    )
    dfb = spark.createDataFrame(
        [(10, "kristen"), (11, "smith")], "row_key long, name string"
    )
    got = _pairs(dfa, SuffixArrayIndex("name", min_len=4), dfb=dfb)
    assert got == {(0, 10)}


def test_validation():
    with pytest.raises(ValueError):
        SuffixArrayIndex("name", min_len=0)
    with pytest.raises(ValueError):
        SuffixArrayIndex("name", max_block_size=0)


def test_missing_column_raises(spark):
    df = spark.createDataFrame([(0, "x")], "row_key long, other string")
    with pytest.raises(KeyError):
        SuffixArrayIndex("name").key_df(df, "row_key")
