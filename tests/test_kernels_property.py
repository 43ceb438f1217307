"""Property-based cross-checks: the vectorized batch kernels vs
independent scalar reimplementations of the same algorithms (written
directly from SURVEY.md §8.1's spec, sharing NO code with kernels.py).
Agreement on random inputs + the golden witnesses means a bug would
have to exist twice, identically, in two very different shapes."""

from hypothesis import given, settings
from hypothesis import strategies as st

from datamatch_spark.kernels import jaro_winkler_batch, lev_ratio_batch

ALPHA = "abcde é中𝕊\x00"  # small alphabet -> collisions/ties; spans the
# uint8 (ASCII) / uint16 (BMP) / uint32 (astral 𝕊) encode paths


def _scalar_lev_ratio(a: str, b: str) -> float:
    """Classic O(n*m) LCS table; ratio = 2*LCS/(la+lb)."""
    la, lb = len(a), len(b)
    if la + lb == 0:
        return 1.0
    dp = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            if a[i - 1] == b[j - 1]:
                dp[i][j] = dp[i - 1][j - 1] + 1
            else:
                dp[i][j] = max(dp[i - 1][j], dp[i][j - 1])
    return 2.0 * dp[la][lb] / (la + lb)


def _scalar_jw(a: str, b: str, pw: float = 0.1) -> float:
    """Direct transcription of the nonstandard greedy variant
    (SURVEY.md §8.1): shorter string is s1; asymmetric half-length
    window; greedy first-unmatched assignment; fractional transposition
    count; Winkler boost with UNCAPPED common prefix."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    s1, s2 = (a, b) if len(a) <= len(b) else (b, a)
    l1, l2 = len(s1), len(s2)
    halflen = (l1 + 1) // 2
    matched = [False] * l1
    order = [0] * l1
    m = 0
    for i in range(l2):
        if i >= l1 + halflen:
            continue
        if i < halflen:
            lo, hi = 0, min(i + halflen, l1 - 1)
        else:
            lo, hi = i - halflen, l1 - 1
        for j in range(lo, hi + 1):
            if not matched[j] and s1[j] == s2[i]:
                matched[j] = True
                m += 1
                order[j] = m
                break
    if m == 0:
        jaro = 0.0
    else:
        rank = 0
        t = 0
        for j in range(l1):
            if matched[j]:
                rank += 1
                if order[j] != rank:
                    t += 1
        jaro = (m / l1 + m / l2 + 1.0 - t / (2.0 * m)) / 3.0
    p = 0
    for x, y in zip(a, b):
        if x != y:
            break
        p += 1
    return min(1.0, jaro + p * pw * (1.0 - jaro))


short_text = st.text(alphabet=ALPHA, max_size=12)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(short_text, short_text), min_size=1, max_size=20))
def test_lev_ratio_batch_matches_scalar_reference(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = lev_ratio_batch(a, b)
    for i, (x, y) in enumerate(pairs):
        assert abs(got[i] - _scalar_lev_ratio(x, y)) < 1e-12, (x, y)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(short_text, short_text), min_size=1, max_size=20))
def test_jaro_winkler_batch_matches_scalar_reference(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = jaro_winkler_batch(a, b)
    for i, (x, y) in enumerate(pairs):
        assert abs(got[i] - _scalar_jw(x, y)) < 1e-12, (x, y)


def test_jw_embedded_nul_no_spurious_pad_match():
    # ADVICE r4: the prefix slice must exclude rows whose step bound
    # EQUALS i (side='left'); with side='right' the inactive row reads
    # S2's pad value 0 at step i and an embedded NUL in s1 at the
    # still-eligible window position records a spurious match
    # (observed: 0.667 instead of 0.0 for this batch). The longer
    # second row keeps the loop alive past the first row's bound.
    a = ["a\x00", "abcde"]
    b = ["cd", "abcde"]
    got = jaro_winkler_batch(a, b)
    for i, (x, y) in enumerate(zip(a, b)):
        assert abs(got[i] - _scalar_jw(x, y)) < 1e-12, (x, y, got[i])


def test_scalar_reference_reproduces_golden_witnesses():
    # the discriminating witnesses from the reference's own suite
    assert abs(_scalar_jw("freddie", "freedie") - 0.875) < 1e-12
    assert abs(_scalar_lev_ratio("abce", "abcd") - 0.75) < 1e-12
