"""Bloom-filter benchmark decontamination: flag training documents
whose token n-grams hit a fixed-size bit-array summary of an
evaluation/benchmark corpus.

Why this exists next to :func:`~datamatch_spark.extras.decontam.decontaminate`:
the exact path broadcasts the eval side's distinct gram hashes — 8
bytes per gram, perfect while the eval side is benchmark-sized, but
linear in it. This variant replaces the broadcast TABLE with a
broadcast BITSET of fixed size (default 2^20 bits = 128 KiB no matter
how many grams the eval side holds), so the same plan decontaminates
against an arbitrarily large held-out corpus:

- **build** (eval side): explode grams -> k md5-derived bit positions
  -> ``groupBy(position >> 3)`` + ``bit_or`` of the in-byte masks.
  Map-side combine collapses each partition to <= m/8 rows before the
  exchange, and the driver collects at most m/8 (byte, bits) rows to
  assemble the packed array — never the gram set itself.
- **probe** (train side): explode grams -> the same k position
  columns (pure Column arithmetic, JVM-side) -> ONE Arrow-vectorized
  pandas UDF testing all k bits against the TorrentBroadcast bitset.
  No join and no shuffle of train gram strings at all; the only wide
  exchange is the final ``groupBy(id)`` over (id, 1) hits.

False positives are the documented trade (probability ~ fill_ratio^k
per probed gram; :meth:`BloomFilter.fp_rate` reports the exact figure
for the built filter). There are no false negatives: every gram the
exact path flags, this path flags too.

Positions are derived from ``md5(gram)`` hex slices — position ``j``
is ``int(md5hex[8j : 8j+8], 16) % m_bits`` — so the whole filter,
including its false positives, is reproducible bit-for-bit in any
engine with an md5 function. The driver's DuckDB oracle rebuilds the
position set in SQL and must reproduce the engine's flags exactly,
FPs included.

Reference provenance: the reference library has no decontamination
surface; this extends the corpus-hygiene family
(``extras/decontam.py``) that the rebuild adds for training-data
pipelines. Gram tokenization reuses ``dedup.shingles_expr`` so all
gram-set operators agree on what an n-gram is.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingles_expr

__all__ = ["BloomFilter", "bloom_positions", "build_bloom", "bloom_decontaminate"]

#: md5 yields 32 hex chars = four non-overlapping 8-char (32-bit)
#: slices; k beyond 4 would need a second digest per gram.
_MAX_K = 4


@dataclass(frozen=True, eq=False)
class BloomFilter:
    """A built filter: ``bits`` is the packed little-bit-endian array
    (``bits[p >> 3] & (1 << (p & 7))`` tests position ``p``)."""

    bits: np.ndarray
    m_bits: int
    k: int
    n_set: int

    @property
    def fill_ratio(self) -> float:
        return self.n_set / float(self.m_bits)

    @property
    def fp_rate(self) -> float:
        """Per-probed-gram false-positive probability of THIS filter
        (exact fill-ratio form, not the n-items estimate)."""
        return self.fill_ratio**self.k


def _check_params(m_bits: int, k: int) -> None:
    if not (1 <= k <= _MAX_K):
        raise ValueError(f"k must be in 1..{_MAX_K}, got {k}")
    if m_bits < 8:
        raise ValueError(f"m_bits must be >= 8, got {m_bits}")
    if m_bits > 1 << 32:
        # each position is one 32-bit md5 slice mod m — a larger m
        # would leave bits past 2^32 permanently unreachable
        raise ValueError(f"m_bits must be <= 2^32, got {m_bits}")


def _positions_from_hex(hexd: Column, m_bits: int, k: int) -> list[Column]:
    return [
        (
            F.conv(F.substring(hexd, 1 + 8 * j, 8), 16, 10).cast("long")
            % F.lit(m_bits)
        ).alias(f"p{j}")
        for j in range(k)
    ]


def bloom_positions(gram: Column, m_bits: int, k: int) -> list[Column]:
    """The k bit positions of a gram column: non-overlapping 32-bit
    big-endian slices of md5(gram) hex, mod ``m_bits`` (same
    conv/substring construction as dsir.py's bucket hash, proven
    DuckDB-reproducible via ``CAST('0x' || substr(md5(g), ..) AS
    BIGINT)``). Reference form for tests/oracles; the pipelines below
    use :func:`_positions_array` instead, which binds the digest once."""
    _check_params(m_bits, k)
    return _positions_from_hex(F.md5(gram), m_bits, k)


def _positions_array(gram_col: str, m_bits: int, k: int) -> Column:
    """array<bigint> of the k positions with md5 evaluated ONCE per
    gram: a staged projection gets re-inlined by CollapseProject
    (verified on the physical plan — the digest appeared k times), so
    the let-binding idiom from decontam._hashed_grams_expr is used —
    ``transform(array(md5(g)), h -> ...)`` binds the digest as the
    lambda variable, which is evaluated once per element by
    construction."""
    slices = ", ".join(
        f"cast(conv(substr(h, {1 + 8 * j}, 8), 16, 10) as bigint) % {m_bits}"
        for j in range(k)
    )
    return F.expr(f"transform(array(md5({gram_col})), h -> array({slices}))[0]")


def build_bloom(
    eval_df: DataFrame,
    text_col: str = "text",
    n: int = 5,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> BloomFilter:
    """Build the filter over ``eval_df``'s distinct token n-grams.

    Distributed byte-wise: positions fold to ``(p >> 3, bit_or of
    1 << (p & 7))`` with map-side combine, so the driver materializes
    at most ``m_bits / 8`` rows regardless of eval corpus size."""
    _check_params(m_bits, k)
    grams = eval_df.select(F.explode(shingles_expr(text_col, n)).alias("gram"))
    pos = grams.select(F.explode(_positions_array("gram", m_bits, k)).alias("p"))
    byte_rows = (
        pos.select(
            F.expr("shiftright(p, 3)").alias("byte_idx"),
            # python-API shiftleft demands a literal shift amount; the
            # SQL form accepts the column
            F.expr("shiftleft(1, cast(p % 8 as int))").alias("mask"),
        )
        .groupBy("byte_idx")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    arr = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
    if byte_rows:
        idx = np.array([r["byte_idx"] for r in byte_rows], dtype=np.int64)
        val = np.array([r["bits"] for r in byte_rows], dtype=np.uint8)
        arr[idx] = val
    n_set = int(np.unpackbits(arr).sum())
    return BloomFilter(bits=arr, m_bits=m_bits, k=k, n_set=n_set)


def _hit_udf(bits_bc):
    @F.pandas_udf("boolean")
    def hit(ps: pd.Series) -> pd.Series:
        bits = bits_bc.value
        if len(ps) == 0:
            return pd.Series([], dtype=bool)
        p = np.stack(ps.to_numpy()).astype(np.int64, copy=False)  # (rows, k)
        ok = (bits[p >> 3] & np.left_shift(1, (p & 7)).astype(np.uint8)) != 0
        return pd.Series(ok.all(axis=1))

    return hit


def bloom_decontaminate(
    train: DataFrame,
    eval_df: DataFrame | BloomFilter,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Flag training documents with any token ``n``-gram whose k Bloom
    bits are all set in the eval-side filter.

    Same output contract as :func:`decontam.decontaminate` — every
    train row preserved, ``(id, n_flagged_ngrams, contaminated)`` —
    with ``n_flagged_ngrams`` counting DISTINCT flagged train-doc
    grams (an upper bound on the exact count: superset semantics,
    never a miss). Pass a prebuilt :class:`BloomFilter` to reuse one
    filter across many train increments; passing a DataFrame builds it
    here with this call's (text_col, n, m_bits, k).
    """
    if isinstance(eval_df, BloomFilter):
        bloom = eval_df
        if bloom.m_bits != m_bits or bloom.k != k:
            raise ValueError(
                f"prebuilt filter has (m_bits={bloom.m_bits}, k={bloom.k}); "
                f"call asked for (m_bits={m_bits}, k={k}) — probe positions "
                "would not match the bits"
            )
    else:
        bloom = build_bloom(eval_df, text_col=text_col, n=n, m_bits=m_bits, k=k)
    spark = train.sparkSession
    bits_bc = spark.sparkContext.broadcast(bloom.bits)
    hit = _hit_udf(bits_bc)
    train_pos = train.select(
        F.col(id_col), F.explode(shingles_expr(text_col, n)).alias("gram")
    ).select(id_col, _positions_array("gram", m_bits, k).alias("ps"))
    hits = (
        train_pos.where(hit(F.col("ps")))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_flagged_ngrams"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_flagged_ngrams", F.lit(0)).alias("n_flagged_ngrams"),
            (F.coalesce("n_flagged_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )
    )
