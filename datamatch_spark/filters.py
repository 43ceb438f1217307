"""Pair-level predicates, applied to candidate pairs *before* scoring.

Each filter compiles to a boolean Column over the pair frame (struct
columns ``a``/``b``). Catalyst keeps these cheap JVM predicates below
the expensive scoring UDF projection, mirroring the reference's
filter-before-score ordering (/root/reference/datamatch/matchers.py:
120-128,134-137).
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["BaseFilter", "DissimilarFilter", "NonOverlappingFilter", "ColumnFilter"]


class BaseFilter(ABC):
    """A pair predicate: keep the pair when the Column is true."""

    @abstractmethod
    def predicate(self, a: str, b: str, schema: T.StructType) -> Column:
        """``a``/``b`` are the names of the pair frame's record structs."""
        raise NotImplementedError

    def required_columns(self) -> set[str]:
        return set()


class DissimilarFilter(BaseFilter):
    """Keep a pair only when the two records differ on ``col``; nulls
    pass (reference filters.py:33-65)."""

    def __init__(self, col: str, ignore_key_error: bool = False) -> None:
        self._col = col
        self._ignore_key_error = ignore_key_error

    def required_columns(self) -> set[str]:
        return {self._col}

    def predicate(self, a: str, b: str, schema: T.StructType) -> Column:
        if self._col not in schema.fieldNames():
            if self._ignore_key_error:
                return F.lit(True)
            raise KeyError(self._col)
        va = F.col(f"{a}.{self._col}")
        vb = F.col(f"{b}.{self._col}")
        keep = va.isNull() | vb.isNull() | (va != vb)
        if isinstance(
            schema[self._col].dataType, (T.FloatType, T.DoubleType)
        ):
            # NaN is 'missing' in the reference (pd.isnull -> pair
            # passes), but Spark evaluates NaN = NaN as TRUE so a
            # both-NaN pair would be dropped here (review r5,
            # confirmed live); missing values must pass
            keep = keep | F.isnan(va) | F.isnan(vb)
        return keep


class NonOverlappingFilter(BaseFilter):
    """Keep a pair only when the [start, end] ranges do NOT overlap;
    touching endpoints count as overlap (reference filters.py:68-96).
    Null endpoints reject the pair — same observable behavior as the
    reference's NaN comparisons."""

    def __init__(self, start: str, end: str) -> None:
        self._start = start
        self._end = end

    def required_columns(self) -> set[str]:
        return {self._start, self._end}

    def predicate(self, a: str, b: str, schema: T.StructType) -> Column:
        return (F.col(f"{a}.{self._end}") < F.col(f"{b}.{self._start}")) | (
            F.col(f"{a}.{self._start}") > F.col(f"{b}.{self._end}")
        )


class ColumnFilter(BaseFilter):
    """Engine extension: arbitrary user predicate over the pair frame.

    ``fn(a_struct_col, b_struct_col) -> boolean Column`` — the Spark
    face of the reference's ``BaseFilter.valid`` UDF seam
    (filters.py:18-30); stays JVM-side when built from F.* functions.
    """

    def __init__(self, fn, columns: set[str] | None = None) -> None:
        self._fn = fn
        self._columns = set(columns or ())

    def required_columns(self) -> set[str]:
        return self._columns

    def predicate(self, a: str, b: str, schema: T.StructType) -> Column:
        return self._fn(F.col(a), F.col(b))
