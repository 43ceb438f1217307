"""Variators: per-record variant expansion.

A variator compiles to an ``array<struct>`` Column of record variants;
the matcher explodes it on both sides of the pair join and takes the
per-pair max score (reference max-over-variations, matchers.py:
138-144). The default Variator yields a single-element array, which the
matcher fast-paths (no explode, no pair-max shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["Variator", "Swap"]


def _both_missing(struct_col: Column, col_a: str, col_b: str, schema) -> Column:
    """TRUE when both swap fields are MISSING in the pandas sense
    (NULL, or NaN for float fields): the reference's gate is
    ``pd.isna(a) and pd.isna(b)`` -> no swap, so a NULL-vs-NaN pair
    must NOT produce a variant even though NULL <=> NaN is false
    (review r5). Without a schema (type unknown) only NULLs count —
    eqNullSafe already covers NULL/NULL and NaN/NaN."""
    from pyspark.sql import types as T

    def missing(name: str) -> Column:
        v = struct_col.getField(name)
        if schema is not None and isinstance(
            schema[name].dataType, (T.FloatType, T.DoubleType)
        ):
            return v.isNull() | F.isnan(v)
        return v.isNull()

    return missing(col_a) & missing(col_b)


class Variator:
    """Identity variator (reference variators.py:13-29).

    ``max_variants``: static upper bound on the variant-array length,
    or None when unknown. When small (≤4 per side) the matcher scores
    every variant combination inline and takes ``greatest`` — zero
    extra shuffle; unknown bounds fall back to explode + per-pair max
    aggregation. Subclasses that override :meth:`variants` should set
    it when the bound is known.
    """

    max_variants: int | None = 1

    def required_columns(self) -> set[str]:
        return set()

    @property
    def is_noop(self) -> bool:
        return type(self) is Variator

    def variants(
        self, struct_col: Column, fields: list[str], schema=None
    ) -> Column:
        """``schema``: optional record StructType — lets subclasses make
        type-aware decisions (Swap's NaN-vs-NULL missing gate)."""
        return F.array(struct_col)

    def __init_subclass__(cls, **kwargs) -> None:
        # a subclass that redefines variants() without declaring its
        # bound must not inherit the identity's bound of 1
        super().__init_subclass__(**kwargs)
        if "variants" in cls.__dict__ and "max_variants" not in cls.__dict__:
            cls.max_variants = None


class Swap(Variator):
    """Yields the record plus a copy with two columns exchanged, unless
    the two values are null-safe-equal (reference variators.py:32-59:
    skip when both-NaN or equal; one-null pairs DO produce a swap)."""

    max_variants = 2

    def __init__(self, column_a: str, column_b: str) -> None:
        self._col_a = column_a
        self._col_b = column_b

    def required_columns(self) -> set[str]:
        return {self._col_a, self._col_b}

    def variants(
        self, struct_col: Column, fields: list[str], schema=None
    ) -> Column:
        if self._col_a not in fields or self._col_b not in fields:
            raise KeyError(f"Swap columns {self._col_a}/{self._col_b} not in record")
        swapped = F.struct(
            *[
                (
                    struct_col.getField(self._col_b).alias(f)
                    if f == self._col_a
                    else (
                        struct_col.getField(self._col_a).alias(f)
                        if f == self._col_b
                        else struct_col.getField(f).alias(f)
                    )
                )
                for f in fields
            ]
        )
        do_swap = ~struct_col.getField(self._col_a).eqNullSafe(
            struct_col.getField(self._col_b)
        ) & ~_both_missing(struct_col, self._col_a, self._col_b, schema)
        return F.when(do_swap, F.array(struct_col, swapped)).otherwise(
            F.array(struct_col)
        )
