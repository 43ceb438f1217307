"""Survivorship / golden-record construction — the merge step of the
entity-resolution lifecycle (block -> pair -> score -> cluster ->
**merge**), absent from the reference (whose pipeline ends at cluster
reports, /root/reference/datamatch/matchers.py:425-474): given the
record table and a cluster assignment (e.g. ``groups_from_pairs`` /
``connected_components`` output), produce ONE canonical row per
cluster with a per-column survivorship rule (the MDM vocabulary:
most-frequent, longest, most-recent-by, min/max, ...).

Every rule is DETERMINISTIC — ties are broken by value (and, for the
row-pick rules, by ``id_col``) — so the result is reproducible across
runs, partitionings and cluster widths, and replayable in plain SQL
(driver oracle ``golden_records``).

Scale shape: one ``groupBy(cluster)`` carrying ALL fused rules as
aggregate expressions (map-side partial aggregation; no windows, no
collects), plus one (cluster, value) pre-aggregation per
``most_frequent`` column joined back on the cluster key — every
shuffle is keyed by the cluster id, so the joins co-partition. Rules
compile to pure Column expressions (struct-ordered ``min``/``max``);
no Python UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["golden_records", "SURVIVORSHIP_RULES"]

#: rule vocabulary; ``latest:<col>`` / ``earliest:<col>`` carry the
#: ordering column after the colon.
SURVIVORSHIP_RULES = (
    "min",
    "max",
    "sum",
    "mean",
    "count_distinct",
    "longest",
    "shortest",
    "most_frequent",
    "latest:<order_col>",
    "earliest:<order_col>",
)


def _len_struct(c: str) -> F.Column:
    """(length, value) struct for longest/shortest; NULL values yield a
    NULL struct, which min/max aggregates skip."""
    v = F.col(c)
    return F.when(
        v.isNotNull(), F.struct(F.length(v.cast("string")).alias("l"), v.alias("v"))
    )


def _row_pick_struct(c: str, order_col: str, id_col: str) -> F.Column:
    """(order, id, value) struct for latest/earliest; rows where either
    the value or the ordering column is NULL never win (a row of
    unknown recency must not be selected as 'most recent')."""
    v = F.col(c)
    return F.when(
        v.isNotNull() & F.col(order_col).isNotNull(),
        F.struct(
            F.col(order_col).alias("o"), F.col(id_col).alias("i"), v.alias("v")
        ),
    )


def golden_records(
    df: DataFrame,
    id_col: str,
    assignment: DataFrame,
    rules: dict[str, str],
    cluster_col: str = "group_id",
) -> DataFrame:
    """One canonical row per cluster: ``(cluster_col, cluster_size,
    <one survived column per rules entry>)``.

    ``assignment`` maps ``id_col`` -> ``cluster_col`` (each record in at
    most one cluster — ``groups_from_pairs`` / renamed
    ``connected_components`` output has exactly this shape; singletons
    map to themselves there, so nothing is lost). Records absent from
    the assignment are excluded. Rules, per output column:

    - ``min`` / ``max`` / ``sum`` / ``mean`` / ``count_distinct`` —
      plain aggregates over non-NULL values.
    - ``longest`` / ``shortest`` — the non-NULL value of max/min string
      length; length ties break to the larger (resp. smaller) value.
    - ``most_frequent`` — the non-NULL modal value; frequency ties
      break to the larger value.
    - ``latest:<order_col>`` / ``earliest:<order_col>`` — the value
      from the cluster's row with the greatest (resp. least)
      ``(order_col, id_col)`` among rows where both the value and
      ``order_col`` are non-NULL.

    A column appears at most once (dict key); to survive one source
    column under two rules, alias it twice upstream
    (``df.withColumn("b", F.col("a"))``).
    """
    if not rules:
        raise ValueError("rules must name at least one column")
    if id_col in rules:
        raise ValueError(f"id_col {id_col!r} cannot carry a survivorship rule")
    if cluster_col in df.columns:
        raise ValueError(
            f"cluster_col {cluster_col!r} collides with a record column; "
            "rename one side"
        )
    for c in rules:
        if c not in df.columns:
            raise KeyError(c)
    for c in (id_col, cluster_col):
        if c not in assignment.columns:
            raise KeyError(f"assignment is missing column {c!r}")

    joined = df.join(
        assignment.select(id_col, cluster_col), on=id_col, how="inner"
    )

    aggs = [F.count(F.lit(1)).alias("cluster_size")]
    mode_cols: list[str] = []
    for c, rule in rules.items():
        if rule == "min":
            aggs.append(F.min(c).alias(c))
        elif rule == "max":
            aggs.append(F.max(c).alias(c))
        elif rule == "sum":
            aggs.append(F.sum(c).alias(c))
        elif rule == "mean":
            aggs.append(F.avg(c).alias(c))
        elif rule == "count_distinct":
            aggs.append(F.countDistinct(c).alias(c))
        elif rule == "longest":
            aggs.append(F.max(_len_struct(c)).getField("v").alias(c))
        elif rule == "shortest":
            aggs.append(F.min(_len_struct(c)).getField("v").alias(c))
        elif rule == "most_frequent":
            mode_cols.append(c)
        elif rule.startswith(("latest:", "earliest:")):
            kind, _, order_col = rule.partition(":")
            if order_col not in df.columns:
                raise KeyError(order_col)
            s = _row_pick_struct(c, order_col, id_col)
            agg = F.max(s) if kind == "latest" else F.min(s)
            aggs.append(agg.getField("v").alias(c))
        else:
            raise ValueError(
                f"unknown survivorship rule {rule!r} for column {c!r}; "
                f"one of {SURVIVORSHIP_RULES}"
            )

    out = joined.groupBy(cluster_col).agg(*aggs)
    for c in mode_cols:
        mode = (
            joined.where(F.col(c).isNotNull())
            .groupBy(cluster_col, c)
            .agg(F.count(F.lit(1)).alias("__n"))
            .groupBy(cluster_col)
            .agg(
                F.max(F.struct(F.col("__n"), F.col(c).alias("v")))
                .getField("v")
                .alias(c)
            )
        )
        out = out.join(mode, on=cluster_col, how="left")
    return out
