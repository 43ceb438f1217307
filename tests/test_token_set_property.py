"""Property-based cross-checks for TokenSetSimilarity: scalar face vs
an independent set-math reimplementation on random whitespace-heavy
strings (hypothesis), and expr-vs-scalar parity over one seeded random
batch (a single Spark job, not one per example)."""

import random

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datamatch_spark import TokenSetSimilarity

# whitespace-dense alphabet: empty tokens, runs, case collisions
TEXT = st.text(alphabet="ab A \t\n", max_size=24)


def _ref(a: str, b: str, mode: str) -> float:
    ta = {t for t in a.lower().split() if t}
    tb = {t for t in b.lower().split() if t}
    inter = len(ta & tb)
    if mode == "jaccard":
        den = len(ta | tb)
        return inter / den if den else 0.0
    if mode == "dice":
        den = len(ta) + len(tb)
        return 2 * inter / den if den else 0.0
    den = min(len(ta), len(tb))
    return inter / den if den else 0.0


@settings(max_examples=300, deadline=None)
@given(TEXT, TEXT, st.sampled_from(["jaccard", "dice", "overlap"]))
def test_scalar_matches_independent_reimpl(a, b, mode):
    assert TokenSetSimilarity(mode).sim(a, b) == _ref(a, b, mode)


def test_expr_matches_scalar_on_random_batch(spark):
    rng = random.Random(42)

    def rand_text():
        return "".join(rng.choice("ab cd  A\t") for _ in range(rng.randrange(0, 20)))

    rows = [(i, rand_text(), rand_text()) for i in range(200)]
    df = spark.createDataFrame(rows, "i long, a string, b string")
    for mode in ("jaccard", "dice", "overlap"):
        s = TokenSetSimilarity(mode)
        got = {
            r["i"]: r["v"]
            for r in df.select("i", s.expr(F.col("a"), F.col("b")).alias("v")).collect()
        }
        for i, a, b in rows:
            assert got[i] == s.sim(a, b) == _ref(a, b, mode), (mode, a, b)
