"""Record-pair scorers: compile a scorer tree into ONE Column expression
over the candidate-pair frame.

Refusal semantics: the reference raises ``RefuseToScoreException`` to
delegate upward (/root/reference/datamatch/scorers.py:13-41); here a
refusing scorer evaluates to NULL, and Max/Min use ``greatest``/
``least`` (which ignore NULLs) so an all-children-refuse composite is
NULL — pairs whose top-level score is NULL are dropped by the matcher.

Scoring is a *horizontal* per-row expression — no aggregation, no
shuffle. Everything except the string kernels and user batch functions
stays inside whole-stage codegen.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .similarities import BaseSimilarity

__all__ = [
    "RefuseToScoreException",
    "CompileCtx",
    "BaseScorer",
    "SimSumScorer",
    "AbsoluteScorer",
    "MaxScorer",
    "MinScorer",
    "AlterScorer",
    "FuncScorer",
]


class RefuseToScoreException(Exception):
    """API-parity export; the Spark engine models refusal as NULL."""


@dataclass
class CompileCtx:
    """Mutable compile context threaded through the scorer tree.

    ``df`` is the pair frame (scorers like AlterScorer may join side
    tables onto it); ``a``/``b`` name the record struct columns,
    ``idx_a``/``idx_b`` the row-key columns.
    """

    df: DataFrame
    a: str = "a"
    b: str = "b"
    idx_a: str = "idx_a"
    idx_b: str = "idx_b"
    _uid: int = field(default=0)

    def fresh(self, prefix: str) -> str:
        self._uid += 1
        return f"__{prefix}_{self._uid}"

    @property
    def record_schema(self) -> T.StructType:
        return self.df.schema[self.a].dataType

    def acol(self, name: str) -> Column:
        return F.col(f"{self.a}.{name}")

    def bcol(self, name: str) -> Column:
        return F.col(f"{self.b}.{name}")


class BaseScorer:
    """Compiles to a DoubleType Column; NULL means refuse-to-score."""

    #: True when this scorer can evaluate to NULL (refuse). When False
    #: the matcher skips the NULL-score filter entirely — important
    #: because a filter over a UDF column would be pushed below the
    #: scoring repartition and make Catalyst evaluate every scoring
    #: UDF twice.
    can_refuse: bool = True

    def compile(self, ctx: CompileCtx) -> Column:  # pragma: no cover - abstract
        raise NotImplementedError

    def required_columns(self) -> set[str]:
        return set()


class SimSumScorer(BaseScorer):
    """Root-mean-square of the per-field similarities (despite the
    name — reference scorers.py:44-69): ``sqrt(Σ sim_k² / n_fields)``;
    a null on either side contributes 0 for that field."""

    can_refuse = False

    def __init__(self, fields: dict[str, BaseSimilarity]) -> None:
        self._fields = dict(fields)

    def required_columns(self) -> set[str]:
        return set(self._fields)

    def compile(self, ctx: CompileCtx) -> Column:
        names = ctx.record_schema.fieldNames()
        for k in self._fields:
            if k not in names:
                raise KeyError(k)
        if self.can_swap_fuse():  # same criterion as the fused paths
            return self._compile_fused(ctx)
        sq_terms = []
        for k, simcls in self._fields.items():
            va, vb = ctx.acol(k), ctx.bcol(k)
            # nanvl: a NaN sim output (custom sims on NaN inputs) must
            # contribute 0 like the batch path's nan_to_num — a NaN
            # term would otherwise poison the whole score and sort
            # ABOVE 1.0 (Spark NaN ordering), corrupting slices
            # coalesce: a sim whose expr REFUSES with NULL on non-null
            # inputs (partial-null struct coords, date stage-3) must
            # contribute 0 like the reference's refuse handling and the
            # fused path's masking (scorers.py:64-65) — without it one
            # NULL term silently nulls the whole record score
            s = F.when(va.isNull() | vb.isNull(), F.lit(0.0)).otherwise(
                F.coalesce(
                    F.nanvl(simcls.expr(va, vb).cast("double"), F.lit(0.0)),
                    F.lit(0.0),
                )
            )
            sq_terms.append(s * s)
        total = sq_terms[0]
        for t_ in sq_terms[1:]:
            total = total + t_
        return F.sqrt(total / float(len(self._fields)))

    def _compile_fused(self, ctx: CompileCtx) -> Column:
        """One Arrow pandas UDF for the whole record score: a single
        JVM↔Python exchange instead of one per field — the per-field
        UDF plan ships every scored column through Arrow separately and
        pays a pipe round-trip each, which dominates multi-field
        scoring cost. Null fields contribute 0 (reference
        scorers.py:64-65)."""
        items = list(self._fields.items())
        score_core = self._score_core

        @pandas_udf("double")
        def fused(*cols: pd.Series) -> pd.Series:
            return pd.Series(
                score_core([(cols[2 * i], cols[2 * i + 1]) for i in range(len(items))])
            )

        args = []
        for k, _ in items:
            args.append(ctx.acol(k))
            args.append(ctx.bcol(k))
        return fused(*args)

    def _score_core(self, col_pairs: list) -> "np.ndarray":
        """RMS over per-field batch sims for aligned (a, b) Series
        pairs, one entry per field in ``self._fields`` order. The
        SINGLE scoring implementation behind both the fused pair-row
        UDF and the grouped block-local path (grouped.py) — sharing it
        is what makes the two paths bit-identical (same kernels, same
        accumulation order, same null masking)."""
        import numpy as np

        n = len(col_pairs[0][0])

        def na_mask(x) -> "np.ndarray":
            # struct columns arrive as a pd.DataFrame (one column per
            # field): any NULL field refuses the pair, matching the
            # expr faces' any-coordinate-NULL -> NULL convention
            na = x.isna().to_numpy()
            return na.any(axis=1) if na.ndim == 2 else na

        acc = np.zeros(n, dtype=np.float64)
        for (a, b), sim in zip(col_pairs, self._fields.values()):
            mask = na_mask(a) | na_mask(b)
            vals = np.asarray(sim.batch(a, b), dtype=np.float64)
            vals = np.where(mask, 0.0, np.nan_to_num(vals, nan=0.0))
            acc += vals * vals
        return np.sqrt(acc / float(len(self._fields)))

    def score_positions(
        self, cols: dict, pos_a: "np.ndarray", pos_b: "np.ndarray"
    ) -> "np.ndarray":
        """Score the pairs (cols[k][pos_a[i]], cols[k][pos_b[i]]) —
        the grouped path's entry point: ``cols`` holds each scored
        field's values ONCE per record (a block or grid cell), and the
        position arrays enumerate the pairs, so no per-pair record
        duplication ever crosses the JVM↔Python boundary."""
        col_pairs = []
        for k in self._fields:
            s = cols[k]
            col_pairs.append((
                s.iloc[pos_a].reset_index(drop=True),
                s.iloc[pos_b].reset_index(drop=True),
            ))
        return self._score_core(col_pairs)

    def can_swap_fuse(self) -> bool:
        """True when every similarity has a batch kernel, enabling the
        swap-aware fused path (``compile_swap_max``)."""
        return all(callable(getattr(s, "batch", None)) for s in self._fields.values())

    def compile_swap_max(self, ctx: CompileCtx, col_x: str, col_y: str) -> Column:
        """Max-over-Swap-variants score in ONE Arrow UDF.

        Swap(x, y) variants differ from the base record ONLY in fields
        x and y, so the 4 combo scores share every other field's
        similarity. The naive inline-combo path evaluates the full
        fused scorer 4x (pandas UDFs compute for the whole batch even
        under a ``F.when`` guard — the guard masks the RESULT, not the
        compute). Here instead:

        * invariant fields are scored ONCE;
        * the four cross-similarities of the swapped pair (ax·bx,
          ax·by, ay·bx, ay·by) are each evaluated only on the row
          subset whose combo is actually valid (one/both sides swap),
          so kernel work is 1x + O(swap-rate), not 4x;
        * per-combo totals accumulate in the exact field order of the
          plain fused scorer and the max is taken pre-sqrt (sqrt is
          monotone and correctly rounded, so ``sqrt(max(acc))`` is
          bitwise ``max(sqrt(acc))``) — results are bit-identical to
          the inline-combo path;
        * combo validity mirrors Swap's null-safe-unequal gate
          (reference variators.py:32-59) and invalid combos are
          excluded like greatest() ignores the guard NULLs; NaN scores
          win comparisons (np.maximum) matching Spark's greatest;
        * the swap gates are computed JVM-SIDE (``~eqNullSafe``) and fed
          to the UDF as boolean columns: Arrow->pandas turns a float
          NULL into NaN, so a pandas-side gate could not distinguish
          NULL vs NaN (NULL <=> NaN is false — a swap — while
          NaN <=> NaN is true — no swap). This keeps float swap
          columns on the fused path (VERDICT r4 #4).

        Works when x/y themselves are scored or not: an unscored
        swapped column still flips the swap gate and feeds no kernel.
        """
        import numpy as np

        names = ctx.record_schema.fieldNames()
        for k in self._fields:
            if k not in names:
                raise KeyError(k)
        swap_core = self._swap_max_core

        @pandas_udf("double")
        def swap_fused(*cols: pd.Series) -> pd.Series:
            ax, ay, bx, by = cols[0], cols[1], cols[2], cols[3]
            # JVM-computed ~eqNullSafe gates (never null)
            swap_a = np.asarray(cols[4], dtype=bool)
            swap_b = np.asarray(cols[5], dtype=bool)
            return pd.Series(
                swap_core(col_x, col_y, ax, ay, bx, by, swap_a, swap_b,
                          list(cols[6:]))
            )

        def _missing(c: Column, name: str) -> Column:
            # pandas-sense missing: NULL, or NaN for float fields —
            # mirrors Swap's reference gate (pd.isna(a) and pd.isna(b)
            # -> no swap), so a NULL-vs-NaN pair must not swap even
            # though NULL <=> NaN is false (review r5)
            from pyspark.sql import types as _T

            dt = ctx.record_schema[name].dataType
            if isinstance(dt, (_T.FloatType, _T.DoubleType)):
                return c.isNull() | F.isnan(c)
            return c.isNull()

        def _gate(x: Column, y: Column) -> Column:
            both_missing = _missing(x, col_x) & _missing(y, col_y)
            return ~x.eqNullSafe(y) & ~both_missing

        args = [
            ctx.acol(col_x),
            ctx.acol(col_y),
            ctx.bcol(col_x),
            ctx.bcol(col_y),
            _gate(ctx.acol(col_x), ctx.acol(col_y)),
            _gate(ctx.bcol(col_x), ctx.bcol(col_y)),
        ]
        for k in self._fields:
            if k not in (col_x, col_y):
                args.append(ctx.acol(k))
                args.append(ctx.bcol(k))
        return swap_fused(*args)

    def _swap_max_core(
        self, col_x, col_y, ax, ay, bx, by, swap_a, swap_b, inv
    ) -> "np.ndarray":
        """Max-over-Swap-variants RMS for aligned Series — the shared
        implementation behind the fused pair-row UDF and the grouped
        path's ``score_positions_swap_max``. ``inv`` is the flat
        [a, b, a, b, ...] list of the non-swap fields' Series in field
        order; ``swap_a``/``swap_b`` are the per-row swap gates as bool
        ndarrays. See compile_swap_max's docstring for the combo
        algebra; this body is its verbatim extraction."""
        import numpy as np

        items = list(self._fields.items())
        n_fields = float(len(items))
        sim_x = self._fields.get(col_x)
        sim_y = self._fields.get(col_y)
        # When both swapped fields are scored by the SAME similarity
        # (the canonical Swap("first","last") JW x JW case), field y's
        # cross-sim table is a permutation of field x's: cy[(i,j)] =
        # sim(a_y-variant-i, b_y-variant-j) and the y-variants are the
        # x-variants exchanged, so only FOUR distinct value-pairs exist
        # — (ax,bx) and (ay,by) needed on all rows (plain scoring pays
        # those too) plus (ax,by)/(ay,bx) on swap rows only. Kernel
        # work = plain + 2 x swap-rate, vs the inline-combo path's 8.
        share_xy = (
            sim_x is not None
            and sim_y is not None
            and type(sim_x) is type(sim_y)
            and vars(sim_x) == vars(sim_y)
        )

        def masked_sim(sim, a: pd.Series, b: pd.Series, mask: "np.ndarray"):
            if mask.all():  # ~100% swap rate: skip the subset copies
                nullm = (a.isna() | b.isna()).to_numpy()
                vals = np.asarray(sim.batch(a, b), dtype=np.float64)
                return np.where(nullm, 0.0, vals)
            out = np.zeros(len(a), dtype=np.float64)
            idx = np.flatnonzero(mask)
            if len(idx):
                av = a.iloc[idx].reset_index(drop=True)
                bv = b.iloc[idx].reset_index(drop=True)
                nullm = (av.isna() | bv.isna()).to_numpy()
                vals = np.asarray(sim.batch(av, bv), dtype=np.float64)
                out[idx] = np.where(nullm, 0.0, vals)
            return out

        n = len(ax)
        ones = np.ones(n, dtype=bool)
        # combo validity: (i, j) needs variant i on a / j on b
        valid = {
            (0, 0): ones,
            (0, 1): swap_b,
            (1, 0): swap_a,
            (1, 1): swap_a & swap_b,
        }

        # cross sims, masked to the rows whose combos need them.
        # a-side value of field x under variant i: ax if i==0 else ay
        # a-side value of field y under variant i: ay if i==0 else ax
        def cross(sim, a0, a1, b0, b1):
            return {
                (0, 0): masked_sim(sim, a0, b0, ones),
                (0, 1): masked_sim(sim, a0, b1, valid[(0, 1)]),
                (1, 0): masked_sim(sim, a1, b0, valid[(1, 0)]),
                (1, 1): masked_sim(sim, a1, b1, valid[(1, 1)]),
            }

        if share_xy:
            m_any = swap_a | swap_b
            p1 = masked_sim(sim_x, ax, bx, ones)
            p2 = masked_sim(sim_x, ax, by, m_any)
            p3 = masked_sim(sim_x, ay, bx, m_any)
            p4 = masked_sim(sim_x, ay, by, ones)
            cx = {(0, 0): p1, (0, 1): p2, (1, 0): p3, (1, 1): p4}
            cy = {(0, 0): p4, (0, 1): p3, (1, 0): p2, (1, 1): p1}
        else:
            cx = cross(sim_x, ax, ay, bx, by) if sim_x is not None else None
            cy = cross(sim_y, ay, ax, by, bx) if sim_y is not None else None
        combos = [(0, 0), (0, 1), (1, 0), (1, 1)]
        acc = {c: np.zeros(n, dtype=np.float64) for c in combos}
        ptr = 0
        for k, sim in items:
            if k == col_x:
                for c in combos:
                    acc[c] += cx[c] * cx[c]
            elif k == col_y:
                for c in combos:
                    acc[c] += cy[c] * cy[c]
            else:
                a, b = inv[2 * ptr], inv[2 * ptr + 1]
                nullm = (a.isna() | b.isna()).to_numpy()
                vals = np.asarray(sim.batch(a, b), dtype=np.float64)
                sq = np.where(nullm, 0.0, vals)
                sq = sq * sq
                for c in combos:
                    acc[c] += sq
                ptr += 1
        best = acc[(0, 0)]
        for c in combos[1:]:
            best = np.where(valid[c], np.maximum(best, acc[c]), best)
        return np.sqrt(best / n_fields)

    def score_positions_swap_max(
        self,
        cols: dict,
        pos_a: "np.ndarray",
        pos_b: "np.ndarray",
        col_x: str,
        col_y: str,
    ) -> "np.ndarray":
        """Grouped-path twin of compile_swap_max: swap gates computed
        pandas-side. ONLY sound when neither swap column is a
        float/double (Arrow→pandas folds a float NULL into NaN, which
        the gate could not distinguish — the eligibility check in
        grouped.supports_grouped_scoring excludes those shapes; for
        every other type pandas NA ≡ SQL NULL and this gate is exactly
        ``~eqNullSafe(x, y) & ~(isnull(x) & isnull(y))``)."""
        import numpy as np

        def take(s, p):
            return s.iloc[p].reset_index(drop=True)

        ax, ay = take(cols[col_x], pos_a), take(cols[col_y], pos_a)
        bx, by = take(cols[col_x], pos_b), take(cols[col_y], pos_b)

        def gate(x: pd.Series, y: pd.Series) -> "np.ndarray":
            both_na = (x.isna() & y.isna()).to_numpy()
            nonnull = (~x.isna() & ~y.isna()).to_numpy()
            with_vals = x == y
            eq_vals = nonnull & with_vals.fillna(False).to_numpy(dtype=bool)
            return ~both_na & ~eq_vals

        swap_a, swap_b = gate(ax, ay), gate(bx, by)
        inv = []
        for k in self._fields:
            if k not in (col_x, col_y):
                inv.append(take(cols[k], pos_a))
                inv.append(take(cols[k], pos_b))
        return self._swap_max_core(
            col_x, col_y, ax, ay, bx, by, swap_a, swap_b, inv
        )


class AbsoluteScorer(BaseScorer):
    """Fixed score when both records carry the same non-null value in
    ``column_name``; refuses (NULL) otherwise (reference scorers.py:
    72-113). Missing column ⇒ KeyError unless ``ignore_key_error``
    (then always refuses)."""

    def __init__(self, column_name: str, score: float, ignore_key_error: bool = False) -> None:
        self._column = column_name
        self._score = float(score)
        self._ignore_key_error = ignore_key_error

    def required_columns(self) -> set[str]:
        return {self._column}

    def compile(self, ctx: CompileCtx) -> Column:
        if self._column not in ctx.record_schema.fieldNames():
            if self._ignore_key_error:
                return F.lit(None).cast("double")
            raise KeyError(self._column)
        va, vb = ctx.acol(self._column), ctx.bcol(self._column)
        cond = va.isNotNull() & vb.isNotNull() & (va == vb)
        dt = ctx.record_schema[self._column].dataType
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            # Spark: NaN is not NULL and NaN = NaN is TRUE — without
            # this guard two missing-as-NaN values (pandas-sourced
            # float columns) would count as an exact match; the
            # reference's pd.isnull treats NaN as missing and refuses
            cond = cond & ~F.isnan(va) & ~F.isnan(vb)
        return F.when(cond, F.lit(self._score)).otherwise(
            F.lit(None).cast("double")
        )


class _Composite(BaseScorer):
    def __init__(self, scorers: list[BaseScorer]) -> None:
        self._scorers = list(scorers)
        # greatest/least ignore NULLs: the composite refuses only when
        # every child refuses
        self.can_refuse = all(s.can_refuse for s in self._scorers)

    def required_columns(self) -> set[str]:
        out: set[str] = set()
        for s in self._scorers:
            out |= s.required_columns()
        return out

    def _children(self, ctx: CompileCtx) -> list[Column]:
        return [s.compile(ctx) for s in self._scorers]


class MaxScorer(_Composite):
    """Max over non-refusing children; all-refuse ⇒ NULL
    (reference scorers.py:116-143). ``greatest`` ignores NULLs."""

    def compile(self, ctx: CompileCtx) -> Column:
        cols = self._children(ctx)
        return cols[0] if len(cols) == 1 else F.greatest(*cols)


class MinScorer(_Composite):
    """Min over non-refusing children (reference scorers.py:146-173)."""

    def compile(self, ctx: CompileCtx) -> Column:
        cols = self._children(ctx)
        return cols[0] if len(cols) == 1 else F.least(*cols)


class AlterScorer(BaseScorer):
    """Wraps a scorer; when a side table maps both row keys to equal
    values, applies ``alter`` to the score (reference scorers.py:
    176-207). The side table is broadcast-joined onto the pair frame —
    at scale it must be dimension-sized.

    ``values``: pandas Series (reference API), dict, or a 2-column
    Spark DataFrame (key, value). ``alter``: Column -> Column callable
    (plain arithmetic lambdas like ``lambda x: x / 2`` work).
    """

    def __init__(self, scorer: BaseScorer, values, alter) -> None:
        self._scorer = scorer
        self.can_refuse = scorer.can_refuse
        self._values = values
        self._alter = alter

    def required_columns(self) -> set[str]:
        return self._scorer.required_columns()

    def _values_df(self, ctx: CompileCtx, key_name: str, val_name: str) -> DataFrame:
        spark = ctx.df.sparkSession
        v = self._values
        if isinstance(v, DataFrame):
            kc, vc = v.columns[:2]
            # a duplicated key would silently MULTIPLY candidate-pair
            # rows through the left join (duplicate reports, double
            # greedy keeps); the table is dimension-sized, so one tiny
            # eager check is worth the loud error
            dup = (
                v.groupBy(kc).count().where(F.col("count") > 1).limit(1).count()
            )
            if dup:
                raise ValueError(
                    f"AlterScorer values table has duplicate keys in {kc!r}"
                )
            return v.select(F.col(kc).alias(key_name), F.col(vc).alias(val_name))
        if isinstance(v, dict):
            items = list(v.items())
        else:  # pandas Series
            items = list(pd.Series(v).items())
        if len({k for k, _ in items}) != len(items):
            raise ValueError("AlterScorer values has duplicate keys")
        pdf = pd.DataFrame(items, columns=[key_name, val_name])
        return spark.createDataFrame(pdf)

    def compile(self, ctx: CompileCtx) -> Column:
        inner = self._scorer.compile(ctx)
        # the joined value columns depend only on the pair KEYS, never
        # on the variant combo — cache them on the ctx so the inline
        # combo-variant path (which compiles the tree once per combo)
        # joins the values table 2 times total, not 2·mv²
        cache = getattr(ctx, "_alter_joins", None)
        if cache is None:
            cache = {}
            ctx._alter_joins = cache
        if id(self) not in cache:
            ka, va = ctx.fresh("alterk_a"), ctx.fresh("alterv_a")
            kb, vb = ctx.fresh("alterk_b"), ctx.fresh("alterv_b")
            vdf = self._values_df(ctx, "k", "v")
            ctx.df = ctx.df.join(
                F.broadcast(vdf.select(F.col("k").alias(ka), F.col("v").alias(va))),
                on=F.col(ctx.idx_a) == F.col(ka),
                how="left",
            ).join(
                F.broadcast(vdf.select(F.col("k").alias(kb), F.col("v").alias(vb))),
                on=F.col(ctx.idx_b) == F.col(kb),
                how="left",
            )
            cache[id(self)] = (va, vb)
        va, vb = cache[id(self)]
        cond = F.col(va).isNotNull() & F.col(vb).isNotNull() & (F.col(va) == F.col(vb))
        from pyspark.sql import types as _T

        if isinstance(
            ctx.df.schema[va].dataType, (_T.FloatType, _T.DoubleType)
        ):
            # Spark evaluates NaN = NaN as TRUE; the reference's Python
            # NaN == NaN is False, so two NaN side-table values must
            # NOT trigger the alteration (review r5, confirmed live)
            cond = cond & ~F.isnan(F.col(va)) & ~F.isnan(F.col(vb))
        return F.when(cond, self._alter(inner).cast("double")).otherwise(inner)


class FuncScorer(BaseScorer):
    """User scoring function (reference scorers.py:210-227).

    Fast path (default): ``cb(pdf_a: pd.DataFrame, pdf_b: pd.DataFrame)
    -> array-like`` — one Arrow-batched pandas UDF call per batch.

    ``per_row=True`` gives reference API parity (``cb(a: pd.Series,
    b: pd.Series) -> float`` with ``.name`` = row key) at row-at-a-time
    Python speed — tests/small data only.
    """

    can_refuse = False  # contract: the callback returns floats

    def __init__(self, cb, per_row: bool = False, columns: set[str] | None = None) -> None:
        self._cb = cb
        self._per_row = per_row
        self._columns = set(columns or ())

    @property
    def wants_full_record(self) -> bool:
        """With no declared ``columns`` the callback sees the WHOLE
        record (reference semantics) — the matcher must not prune."""
        return not self._columns

    def required_columns(self) -> set[str]:
        return self._columns

    def compile(self, ctx: CompileCtx) -> Column:
        cb = self._cb
        if self._per_row:

            @pandas_udf("double")
            def score_udf(
                a: pd.DataFrame, b: pd.DataFrame, ia: pd.Series, ib: pd.Series
            ) -> pd.Series:
                out = []
                for i in range(len(a)):
                    sa = a.iloc[i].rename(ia.iloc[i])
                    sb = b.iloc[i].rename(ib.iloc[i])
                    out.append(float(cb(sa, sb)))
                return pd.Series(out, dtype="float64")

            return score_udf(
                F.col(ctx.a), F.col(ctx.b), F.col(ctx.idx_a), F.col(ctx.idx_b)
            )

        @pandas_udf("double")
        def batch_udf(a: pd.DataFrame, b: pd.DataFrame) -> pd.Series:
            return pd.Series(cb(a, b), dtype="float64")

        return batch_udf(F.col(ctx.a), F.col(ctx.b))


def coerce_scorer(scorer) -> BaseScorer:
    """dict -> SimSumScorer; bare callable -> per-row FuncScorer
    (reference matchers.py:89-94)."""
    if isinstance(scorer, BaseScorer):
        return scorer
    if isinstance(scorer, dict):
        return SimSumScorer(scorer)
    if callable(scorer):
        return FuncScorer(scorer, per_row=True)
    raise TypeError(f"cannot use {scorer!r} as a scorer")
