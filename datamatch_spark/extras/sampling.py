"""Deterministic corpus sampling for training-data pipelines.

``df.sample()`` is seed-dependent per partition-split and not stable
under repartitioning, retries, or engine versions — useless for
reproducible corpus curation. These samplers key every decision off a
content hash (md5, available bit-identically in DuckDB for the
oracle), so the same row always gets the same verdict on any cluster
layout, any retry, any engine. Pure Column expressions; zero shuffle
(the filter pushes to the scan side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["deterministic_sample", "stratified_deterministic_sample"]

_BUCKETS = 10_000


def _bucket(key: Column, salt: str) -> Column:
    """Stable bucket in [0, 10000) from md5 of (salt, key)."""
    h = F.md5(F.concat_ws("\x1f", F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _BUCKETS


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per-row by content hash.

    Exactly reproducible: the kept set depends only on (key, salt,
    fraction), never on partitioning or execution order. Change
    ``salt`` to draw an independent sample.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    # round, don't truncate: int(0.57 * 10000) is 5699 under binary
    # floats, which would silently disagree with the documented rate
    # and any external (e.g. SQL) reproduction writing `< 5700`
    return df.where(_bucket(F.col(key_col), salt) < F.lit(_threshold(fraction)))


def _threshold(fraction: float) -> int:
    return int(round(fraction * _BUCKETS))


def stratified_deterministic_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. rebalance languages:
    ``{"en": 0.1, "de": 0.5}``). Strata absent from ``fractions`` get
    ``default_fraction``. Same reproducibility contract as
    ``deterministic_sample``; the per-stratum threshold is a CASE
    expression, so this is still a single scan-side filter."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for stratum {k!r} must be in [0, 1], got {v}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")
    # one flat CaseWhen (chained .when), not a nested tree per stratum
    thr: Column | None = None
    for k in sorted(fractions):
        cond = F.col(strata_col) == F.lit(k)
        val = F.lit(_threshold(fractions[k]))
        thr = F.when(cond, val) if thr is None else thr.when(cond, val)
    default = F.lit(_threshold(default_fraction))
    thr = default if thr is None else thr.otherwise(default)
    return df.where(_bucket(F.col(key_col), salt) < thr)
