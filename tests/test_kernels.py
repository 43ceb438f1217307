"""Golden-float parity for the string/date kernels.

Every expected value is a published constant from the reference test
suite (/root/reference/datamatch/test_similarities.py:9-62,
test_scorers.py, test_matchers.py golden tables) — see FIXTURES.md §4.
"""

import random
from datetime import date

import numpy as np
import pytest

from datamatch_spark.kernels import (
    date_similarity,
    jaro_winkler,
    jaro_winkler_batch,
    lev_ratio,
    lev_ratio_batch,
    unidecode_ascii,
)

TOL = 1e-9


def test_ratio_goldens():
    assert lev_ratio("abc", "abc") == 1.0
    assert lev_ratio("abc", "123") == 0.0
    assert lev_ratio("abce", "abcd") == 0.75
    assert lev_ratio(unidecode_ascii("thang"), unidecode_ascii("thăng")) == 1.0
    assert lev_ratio("", "") == 1.0
    assert lev_ratio("", "a") == 0.0


def test_jaro_winkler_goldens():
    assert abs(jaro_winkler("abce", "abcd", 0.2) - 0.9333333333333333) < TOL
    assert abs(jaro_winkler("wbcd", "abcd", 0.2) - 0.8333333333333334) < TOL
    # the discriminating witness: python-Levenshtein's nonstandard
    # algorithm gives 0.875 where classic Jaro-Winkler gives 0.9333
    assert abs(jaro_winkler("freddie", "freedie", 0.1) - 0.875) < TOL
    # uncapped prefix witness (p=6)
    assert abs(jaro_winkler("cherri", "cherrie", 0.1) - 0.9809523809523809) < TOL
    assert jaro_winkler("", "") == 1.0
    assert jaro_winkler("", "abc") == 0.0
    assert jaro_winkler("abc", "abc") == 1.0


def test_date_similarity_goldens():
    d = date_similarity
    assert d(date(2000, 10, 11), date(2000, 10, 11)) == 1.0
    assert abs(d(date(2000, 10, 11), date(2000, 10, 5)) - 0.8) < TOL
    assert abs(d(date(2000, 10, 11), date(2000, 11, 5)) - 0.16666666666666663) < TOL
    assert d(date(2000, 10, 11), date(2001, 3, 15)) == 0.0
    assert d(date(2000, 9, 11), date(2000, 11, 9)) == 0.5
    assert abs(d(date(2000, 3, 20), date(2000, 8, 20)) - 0.875) < TOL


def test_unidecode():
    assert unidecode_ascii("thăng") == "thang"
    assert unidecode_ascii("café") == "cafe"
    assert unidecode_ascii(None) == ""


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batch_matches_scalar_randomized(seed):
    rng = random.Random(seed)
    alphabet = "abcdeé "
    strs = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        for _ in range(200)
    ]
    a = [rng.choice(strs) for _ in range(100)]
    b = [rng.choice(strs) for _ in range(100)]
    r_batch = lev_ratio_batch(a, b)
    j_batch = jaro_winkler_batch(a, b, 0.1)
    for i in range(100):
        assert abs(r_batch[i] - lev_ratio(a[i], b[i])) < 1e-12
        assert abs(j_batch[i] - jaro_winkler(a[i], b[i], 0.1)) < 1e-12


def test_ratio_reference_dp():
    """Cross-check the vectorized LCS against a direct O(n*m) DP."""

    def slow_ratio(a, b):
        la, lb = len(a), len(b)
        if la + lb == 0:
            return 1.0
        dp = np.zeros((la + 1, lb + 1), dtype=int)
        for i in range(1, la + 1):
            for j in range(1, lb + 1):
                dp[i][j] = (
                    dp[i - 1][j - 1] + 1
                    if a[i - 1] == b[j - 1]
                    else max(dp[i - 1][j], dp[i][j - 1])
                )
        return 2.0 * dp[la][lb] / (la + lb)

    rng = random.Random(42)
    for _ in range(60):
        a = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 10)))
        b = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 10)))
        assert abs(lev_ratio(a, b) - slow_ratio(a, b)) < 1e-12


def test_date_similarity_faces_agree_on_timestamps():
    """expr vs batch/scalar on TIMESTAMPS: day distance is
    floor(|a-b| / 1 day), not the calendar-date diff (23:00 vs
    next-day 01:00 is 0 whole days apart)."""
    import pandas as pd

    from datamatch_spark.similarities import DateSimilarity

    ds = DateSimilarity(30)
    a = pd.Series(pd.to_datetime(["2020-01-01 23:00:00", "2020-01-01 23:00:00"]))
    b = pd.Series(pd.to_datetime(["2020-01-02 01:00:00", "2020-01-31 01:00:00"]))
    got = [round(x, 4) for x in ds.batch(a, b)]
    assert got == [1.0, 0.0333]


def test_relative_similarity_zero_zero_identical():
    from datamatch_spark.similarities import RelativeNumericalSimilarity

    rs = RelativeNumericalSimilarity(50)
    assert rs.sim(0.0, 0.0) == 1.0
    import pandas as pd
    assert list(rs.batch(pd.Series([0.0, 10.0]), pd.Series([0.0, 11.0])).round(4)) == [1.0, 0.8182]


def test_unidecode_non_decomposable_latin():
    """NFKD alone deletes ß/ø/æ/Ł (no combining-mark form); the
    fallback table must transliterate them like Unidecode does."""
    from datamatch_spark.kernels import unidecode_ascii

    assert unidecode_ascii("Møller") == "Moller"
    assert unidecode_ascii("Straße") == "Strasse"
    assert unidecode_ascii("Ærø") == "AEro"
    assert unidecode_ascii("Łukasz") == "Lukasz"
    assert unidecode_ascii("Þórður") == "Thordur"
    assert unidecode_ascii("œuvre") == "oeuvre"
    assert unidecode_ascii("thăng") == "thang"  # decomposable path intact
