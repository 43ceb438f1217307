"""Fellegi-Sunter probabilistic record linkage with EM estimation.

The reference engine (``/root/reference/datamatch``) is purely
threshold-based: every similarity is hand-weighted and the cutoffs are
picked by eye (``matchers.py:220-474``). This module adds the classic
probabilistic upgrade a record-linkage practitioner expects at corpus
scale: Fellegi & Sunter (JASA 1969) match/non-match weights with the
``m``/``u`` probabilities and the match prevalence ``lambda`` estimated
*unsupervised* by EM over binary agreement patterns (Winkler 1988; the
same latent-mixture formulation Splink uses).

Spark-first shape — the whole estimation is ONE aggregation:

1. Candidate pairs carry ``k`` binary agreement columns ("gammas").
   ``groupBy(*gammas).count()`` collapses any number of pairs (10^12
   included) to at most ``2^k`` pattern rows — map-side combinable, a
   few hundred bytes over the wire.
2. EM runs driver-side over those ``<= 2^k`` pattern counts in pure
   Python. This is NOT a driver-side scale compromise: the input to EM
   is *constant-size* regardless of corpus size, and every float
   operation is an explicitly-ordered left fold so the run is
   bit-reproducible (and replayable in a DuckDB recursive CTE — see
   ``__spark_entry__.oracle_sql()["fs_em_pairs"]``).
3. Scoring is a pure Column projection: the fitted ``m``/``u``/
   ``lambda`` are embedded as literals, so per-pair match weight and
   posterior probability add ZERO shuffles and stay inside
   whole-stage codegen.

Determinism contract (load-bearing for the hard oracle): patterns are
folded in ascending gamma-tuple order; products multiply fields
left-to-right in declaration order starting from the prior; all
arithmetic is IEEE float64 with no reassociation (plain Python
left-folds, never ``sum()``/numpy).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "FellegiSunterModel",
    "estimate_fs",
    "u_probability",
    "term_frequencies",
    "tf_adjust",
]

_EPS = 1e-6  # m/u/lambda clamp, keeps log-weights finite


def _clamp(x: float) -> float:
    return min(max(x, _EPS), 1.0 - _EPS)


@dataclass(frozen=True)
class FellegiSunterModel:
    """Fitted FS parameters for ``k`` comparison fields.

    ``m[k]``: P(gamma_k = 1 | pair is a match); ``u[k]``: the same for
    non-matches; ``lam``: match prevalence among candidate pairs.
    """

    gamma_cols: tuple[str, ...]
    m: tuple[float, ...]
    u: tuple[float, ...]
    lam: float
    n_iter: int

    def to_dict(self) -> dict:
        """JSON-safe parameters (floats round-trip exactly through
        json); rebuild with :meth:`from_dict` — fit once, score in any
        later job without re-running EM."""
        return {
            "gamma_cols": list(self.gamma_cols),
            "m": list(self.m),
            "u": list(self.u),
            "lam": self.lam,
            "n_iter": self.n_iter,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "FellegiSunterModel":
        return cls(
            gamma_cols=tuple(d["gamma_cols"]),
            m=tuple(float(x) for x in d["m"]),
            u=tuple(float(x) for x in d["u"]),
            lam=float(d["lam"]),
            n_iter=int(d["n_iter"]),
        )

    def params_df(self, spark: SparkSession) -> DataFrame:
        """One row per field: (field, m, u, agree/disagree log2 weights)."""
        rows = [
            (
                name,
                self.m[k],
                self.u[k],
                math.log2(self.m[k] / self.u[k]),
                math.log2((1.0 - self.m[k]) / (1.0 - self.u[k])),
            )
            for k, name in enumerate(self.gamma_cols)
        ]
        return spark.createDataFrame(
            rows, "field string, m double, u double, w_agree double, w_disagree double"
        )

    def _wv(self, get: "callable") -> tuple[Column, Column]:
        """(match, non-match) likelihood columns, fixed fold order."""
        w: Column = F.lit(self.lam)
        v: Column = F.lit(1.0 - self.lam)
        for k, name in enumerate(self.gamma_cols):
            g = get(name) == 1
            w = w * F.when(g, F.lit(self.m[k])).otherwise(F.lit(1.0 - self.m[k]))
            v = v * F.when(g, F.lit(self.u[k])).otherwise(F.lit(1.0 - self.u[k]))
        return w, v

    def match_probability(self, get=F.col) -> Column:
        """Posterior P(match | gammas) as a pure Column expression."""
        w, v = self._wv(get)
        return w / (w + v)

    def match_weight(self, get=F.col) -> Column:
        """Total log2 Bayes factor (Fellegi-Sunter composite weight).

        Per-field weights are computed in Python (``math.log2`` on the
        fitted literals) and summed left-to-right in field order.
        """
        out: Column = F.lit(0.0)
        for k, name in enumerate(self.gamma_cols):
            wa = math.log2(self.m[k] / self.u[k])
            wd = math.log2((1.0 - self.m[k]) / (1.0 - self.u[k]))
            out = out + F.when(get(name) == 1, F.lit(wa)).otherwise(F.lit(wd))
        return out

    def score(self, pairs: DataFrame) -> DataFrame:
        """Append ``match_weight`` and ``match_probability``.

        Pure projection over literal parameters — no shuffle, no UDF;
        safe to apply to the full 10^12-pair candidate stream.
        """
        return pairs.withColumn("match_weight", self.match_weight()).withColumn(
            "match_probability", self.match_probability()
        )


def _em(
    patterns: list[tuple[tuple[int, ...], int]],
    k: int,
    n_iter: int,
    init_m: float,
    init_u: float,
    init_lambda: float,
) -> tuple[tuple[float, ...], tuple[float, ...], float]:
    """Left-fold EM over sorted (gamma-tuple, count) pattern rows.

    Every accumulation walks ``patterns`` in the given (ascending)
    order and every product walks fields 0..k-1, so the exact float64
    operation sequence is reproducible by any engine that replays the
    same fold — the DuckDB oracle does, step for step.
    """
    m = [init_m] * k
    u = [init_u] * k
    lam = init_lambda
    total = 0.0
    for _, c in patterns:
        total = total + float(c)
    for _ in range(n_iter):
        s_cp = 0.0
        s_cq = 0.0
        s_cp_g = [0.0] * k
        s_cq_g = [0.0] * k
        for g, c in patterns:
            w = lam
            v = 1.0 - lam
            for j in range(k):
                w = w * (m[j] if g[j] else 1.0 - m[j])
                v = v * (u[j] if g[j] else 1.0 - u[j])
            p = w / (w + v)
            cp = float(c) * p
            cq = float(c) * (1.0 - p)
            s_cp = s_cp + cp
            s_cq = s_cq + cq
            for j in range(k):
                if g[j]:
                    s_cp_g[j] = s_cp_g[j] + cp
                    s_cq_g[j] = s_cq_g[j] + cq
        lam = _clamp(s_cp / total)
        for j in range(k):
            m[j] = _clamp(s_cp_g[j] / s_cp)
            u[j] = _clamp(s_cq_g[j] / s_cq)
    return tuple(m), tuple(u), lam


def estimate_fs(
    pairs: DataFrame,
    gamma_cols: list[str],
    n_iter: int = 20,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_lambda: float = 0.5,
) -> FellegiSunterModel:
    """Fit FS parameters by EM over a candidate-pair DataFrame.

    ``gamma_cols`` must be integer 0/1 agreement columns (build them
    with ``F.when(...).otherwise(0)`` / ``eqNullSafe``). The only
    distributed work is one ``groupBy(*gamma_cols).count()`` whose
    result is at most ``2^k`` rows — the driver collect is
    constant-size by construction, not corpus-bounded.

    Raises ``ValueError`` on empty input, non-binary gamma values, or
    NULL gammas (a NULL agreement is an upstream bug — fold missing
    values into 0/1 explicitly before calling).
    """
    if not gamma_cols:
        raise ValueError("estimate_fs needs at least one gamma column")
    if not 0.0 < init_lambda < 1.0:
        raise ValueError(f"init_lambda must be in (0,1), got {init_lambda}")
    k = len(gamma_cols)
    rows = (
        pairs.groupBy(*[F.col(c).cast("int").alias(c) for c in gamma_cols])
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if not rows:
        raise ValueError("estimate_fs: no candidate pairs")
    patterns: list[tuple[tuple[int, ...], int]] = []
    for r in rows:
        g = tuple(r[c] for c in gamma_cols)
        if any(x is None or x not in (0, 1) for x in g):
            raise ValueError(f"non-binary gamma pattern {g!r}; gammas must be 0/1 ints")
        patterns.append((g, r["n"]))
    patterns.sort(key=lambda t: t[0])
    m, u, lam = _em(patterns, k, n_iter, init_m, init_u, init_lambda)
    return FellegiSunterModel(tuple(gamma_cols), m, u, lam, n_iter)


def term_frequencies(records: DataFrame, col: str) -> DataFrame:
    """``(value, tf)`` — each non-NULL value's relative frequency in
    the RECORD table (not the pair stream). This is the input to
    :func:`tf_adjust`; compute it over the same corpus the pairs were
    drawn from.

    Declarative: one groupBy over the value vocabulary plus a 1-row
    total joined back — no driver collect, so a 10^12-row corpus costs
    one value-cardinality shuffle."""
    counts = (
        records.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    total = counts.agg(F.sum("__n").alias("__t"))
    return counts.crossJoin(total).select(
        "value", (F.col("__n") / F.col("__t")).alias("tf")
    )


def tf_adjust(
    scored: DataFrame,
    model: FellegiSunterModel,
    field: str,
    value_col: str,
    tf: DataFrame,
    tf_weight: float = 1.0,
) -> DataFrame:
    """Splink-style term-frequency adjustment for one exact-match
    field: agreement on a RARE value ("zzyzx") is stronger evidence
    than on a common one ("smith"), so the field's average
    u-probability is replaced by the value-specific collision
    probability ``tf(v)`` — the agreement Bayes factor becomes
    ``m_k / tf(v)`` instead of ``m_k / u_k``.

    ``scored`` is ``model.score(...)`` output that also carries
    ``value_col`` (the agreed value, e.g. either side's token —
    irrelevant rows are untouched); ``tf`` is
    :func:`term_frequencies` of the record column. Appends:

    * ``match_weight_tf``      — ``match_weight`` + ``tf_weight`` ×
      log2(u_k / tf(v)) on agreeing pairs (positive for rarer-than-
      average values, negative for common ones), unchanged otherwise.
    * ``match_probability_tf`` — the posterior recomputed with the
      match likelihood scaled by ``(u_k / tf(v))^tf_weight``.

    Pairs whose value is NULL or absent from ``tf`` (e.g. frequencies
    from a reference corpus) get NO adjustment — never a NULL score.
    ``tf_weight`` in [0, 1] damps the adjustment (Splink's
    ``tf_adjustment_weight``); 1.0 is the full Fellegi-Sunter
    substitution.

    Scale shape: one equi-join of the pair stream against the
    broadcast value-frequency table, then pure Column arithmetic —
    no shuffle of the pairs, no UDF.
    """
    if field not in model.gamma_cols:
        raise ValueError(
            f"field {field!r} is not one of the model's gamma columns "
            f"{model.gamma_cols}"
        )
    for c in ("match_weight", value_col):
        if c not in scored.columns:
            raise KeyError(c)
    k = model.gamma_cols.index(field)
    u_k = model.u[k]
    tfj = F.broadcast(
        tf.select(F.col("value").alias("__tfv"), F.col("tf").alias("__tf"))
    )
    j = scored.join(tfj, on=F.col(value_col) == F.col("__tfv"), how="left")
    agree = (F.col(field) == 1) & F.col("__tf").isNotNull()
    ratio = F.lit(u_k) / F.col("__tf")
    delta = F.when(
        agree, F.lit(float(tf_weight)) * F.log2(ratio)
    ).otherwise(F.lit(0.0))
    adj = F.when(agree, F.pow(ratio, F.lit(float(tf_weight)))).otherwise(
        F.lit(1.0)
    )
    w, v = model._wv(F.col)
    prob = (w * adj) / (w * adj + v)
    return (
        j.withColumn("match_weight_tf", F.col("match_weight") + delta)
        .withColumn("match_probability_tf", prob)
        .drop("__tfv", "__tf")
    )


def u_probability(records: DataFrame, col: str) -> float:
    """Exact P(two distinct random records agree on ``col``) =
    Σ_v n_v·(n_v−1) / (N·(N−1)) over non-NULL values — the principled
    u-probability for an exact-match comparison (what Splink
    approximates by random-pair sampling), useful as ``init_u`` or as
    a sanity check on the EM estimate. One value-cardinality
    aggregation collapsed to a single driver row; NULLs excluded on
    both sides (NULL never agrees with anything)."""
    row = (
        records.where(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum(F.expr("n * (n - 1)")).alias("agree"),
            F.sum("n").alias("total"),
        )
        .collect()
    )[0]
    if not row["total"] or row["total"] < 2:
        raise ValueError(
            f"u_probability needs >= 2 non-NULL values in {col!r}"
        )
    return float(row["agree"]) / (float(row["total"]) * (row["total"] - 1.0))
