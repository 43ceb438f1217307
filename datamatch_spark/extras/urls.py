"""URL canonicalization, registered-domain extraction, and domain
blocklist filtering — the web-corpus hygiene trio that runs BEFORE any
heavier operator in a crawl pipeline: URL-keyed exact dedup and
per-domain stats both need a canonical form, and blocklisted domains
should be dropped at the scan.

Everything here is pure Column expressions (regexp + higher-order
array functions): the whole family stays inside whole-stage codegen
(no Python in the hot path) and every step is replicable in ANSI SQL
for the driver's DuckDB oracle. The blocklist join broadcasts (a
blocklist is a small dim table even at 100 TB corpus scale).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "canonicalize_url",
    "registered_domain",
    "filter_blocked_domains",
    "domain_stats",
    "cap_per_domain",
]

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"

# Parameters dropped by canonicalization: click/campaign trackers that
# fragment otherwise-identical URLs (the classic cause of exact-dedup
# misses on crawl data). Matched against "name=" or a bare "name".
_TRACKING_RE = "^(utm_[^=]*|fbclid|gclid)(=|$)"

# Minimal two-level public-suffix set (the common ccTLD registrations).
# A production deployment swaps in the full Mozilla public-suffix list
# as a broadcast lookup; the extraction logic is identical.
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.mx", "co.in", "co.nz",
    "com.cn", "com.sg", "co.za", "com.tr",
)


def canonicalize_url(col: Column) -> Column:
    """Canonical form of an absolute URL, as a pure Column expr:

    * fragment stripped;
    * scheme and host lowercased (path/query case preserved);
    * default port stripped (``:80`` for http, ``:443`` for https);
    * tracking query parameters removed (``utm_*``, ``fbclid``,
      ``gclid``), the ``?`` dropped when nothing survives.

    Rows that do not start with ``scheme://`` are returned UNCHANGED
    (refusal, not a guess — relative references and garbage lines are
    a filtering decision that belongs to the caller).
    """
    u = F.regexp_replace(col, "#.*", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, "^([^/?]*)", 1))
    tail = F.substring(rest, F.length(hostport) + 1, F.length(rest))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_extract(tail, "^([^?]*)", 1)
    query = F.substring(tail, F.length(path) + 2, F.length(tail))
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(_TRACKING_RE),
    )
    q2 = F.array_join(kept, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(F.length(q2) > 0, F.concat(F.lit("?"), q2)).otherwise(
            F.lit("")
        ),
    )
    return F.when(scheme == F.lit(""), col).otherwise(canon)


def registered_domain(col: Column) -> Column:
    """Registered (registrable) domain of a URL or bare host:
    ``news.site.co.uk`` -> ``site.co.uk``, ``www.example.com`` ->
    ``example.com``. IP hosts and one/two-label hosts pass through.
    Ports are excluded from the host. Uses ``TWO_LEVEL_SUFFIXES`` for
    the common two-level public suffixes (see note there)."""
    from_url = F.lower(
        F.regexp_extract(col, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)", 1)
    )
    host = F.when(from_url == F.lit(""), F.lower(
        F.regexp_extract(col, "^([^/:?#]*)", 1)
    )).otherwise(from_url)
    labels = F.split(host, "\\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-2)),
        F.try_element_at(labels, F.lit(-1)),
    )
    return (
        # NULL stays NULL (concat_ws ignores NULL args, so without the
        # guard a NULL URL would fall through to the otherwise branch
        # and come back as "" — silently pooling every NULL row into an
        # empty-string domain in domain_stats)
        F.when(host.isNull(), F.lit(None).cast("string"))
        .when(host.rlike("^[0-9.]+$"), host)
        .when(n <= 2, host)
        .when(
            last2.isin(*TWO_LEVEL_SUFFIXES),
            F.concat_ws(
                ".", F.try_element_at(labels, F.lit(-3)), last2
            ),
        )
        .otherwise(last2)
    )


def filter_blocked_domains(
    df: DataFrame,
    url_col: str,
    blocked,
    flag_col: str | None = None,
) -> DataFrame:
    """Drop (or flag) rows whose REGISTERED domain is blocklisted.

    ``blocked`` is either a small in-driver collection of domains
    (compiled to an ``isin`` — pure codegen, zero shuffle) or a
    single-column DataFrame (broadcast ``left_anti`` join — the right
    shape when the blocklist lives in a table; it is a small dim even
    against a 100 TB corpus). With ``flag_col`` (collection input
    only) rows are kept and flagged instead of dropped.
    """
    dom = registered_domain(F.col(url_col))
    if isinstance(blocked, DataFrame):
        if flag_col is not None:
            raise ValueError("flag_col requires a collection blocklist")
        b = blocked.select(
            F.lower(F.col(blocked.columns[0])).alias("__blocked_dom")
        ).distinct()
        return (
            df.withColumn("__dom", dom)
            .join(
                F.broadcast(b),
                F.col("__dom") == F.col("__blocked_dom"),
                "left_anti",
            )
            .drop("__dom")
        )
    doms = sorted({d.lower() for d in blocked})
    flag = dom.isin(*doms) if doms else F.lit(False)
    if flag_col is not None:
        return df.withColumn(flag_col, flag)
    return df.where(~flag)


def cap_per_domain(
    df: DataFrame,
    url_col: str,
    max_docs: int,
    id_col: str = "doc_id",
    salt: str = "cap",
    pre_shards: int | None = 16,
) -> DataFrame:
    """Per-domain frequency cap: keep at most ``max_docs`` rows per
    REGISTERED domain (link-farm / boilerplate-site suppression — the
    crawl-curation step after blocklisting). Returns the kept rows
    with a ``domain`` column appended.

    The kept set is chosen by ascending ``md5(salt, id)`` with ``id``
    as the tiebreak — deterministic under repartition/retry and
    engine-reproducible (the driver oracle replays the same rank in
    SQL), exactly like ``sampling.deterministic_sample``. Rows whose
    domain is NULL (NULL url) form their own capped group.

    Skew: a single ``row_number() OVER (PARTITION BY domain)`` puts a
    hot domain's entire row set in one task. With ``pre_shards`` (the
    default), rows are first ranked within (domain, md5-derived shard)
    and cut to ``max_docs`` there — any row in the domain's true
    bottom-``max_docs`` is necessarily in its shard's bottom-
    ``max_docs``, so the pre-cut is lossless — bounding the final
    per-domain window to ``pre_shards x max_docs`` rows no matter how
    hot the domain. Pass ``pre_shards=None`` for the single-window
    plan (fine when no domain dominates).
    """
    if max_docs < 1:
        raise ValueError(f"max_docs must be >= 1, got {max_docs}")
    if "domain" in df.columns:
        raise ValueError(
            "input already has a 'domain' column — rename it; "
            "cap_per_domain appends the registered domain under that name"
        )
    from pyspark.sql import Window

    dom = registered_domain(canonicalize_url(F.col(url_col)))
    h = F.md5(F.concat_ws("\x1f", F.lit(salt), F.col(id_col).cast("string")))
    out = df.withColumn("domain", dom).withColumn("__h", h)
    if pre_shards is not None:
        if pre_shards < 1:
            raise ValueError(f"pre_shards must be >= 1, got {pre_shards}")
        # shard from the SAME deterministic hash (no second digest):
        # first 8 hex chars mod pre_shards
        shard = (
            F.conv(F.substring(F.col("__h"), 1, 8), 16, 10).cast("long")
            % F.lit(pre_shards)
        )
        w1 = Window.partitionBy("domain", "__shard").orderBy("__h", id_col)
        out = (
            out.withColumn("__shard", shard)
            .withColumn("__r1", F.row_number().over(w1))
            .where(F.col("__r1") <= max_docs)
            .drop("__shard", "__r1")
        )
    w = Window.partitionBy("domain").orderBy("__h", id_col)
    return (
        out.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= max_docs)
        .drop("__h", "__r")
    )


def domain_stats(
    df: DataFrame,
    url_col: str,
    aggs: dict[str, Column] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-registered-domain corpus statistics: one row per domain with
    ``n_docs`` (rows) and ``n_urls`` (distinct canonical URLs — crawl
    breadth vs fetch volume), plus any caller aggregate Columns in
    ``aggs`` (e.g. ``{"avg_quality": F.avg("quality_score")}``).

    Single ``groupBy(domain)`` — counts and caller aggs combine
    map-side, so the shuffle carries one partial row per (task,
    domain). ``exact_distinct=False`` swaps the distinct-URL count to
    ``approx_count_distinct`` (HLL): at 100 TB the exact count is the
    only sub-aggregate that must expand per distinct value, and a hot
    domain (e.g. a link farm) concentrates that expansion on one key;
    the sketch makes the whole aggregate strictly one-pass. Exact is
    the default for oracle parity.
    """
    canon = canonicalize_url(F.col(url_col))
    n_urls = (
        F.count_distinct(F.col("__canon"))
        if exact_distinct
        else F.approx_count_distinct(F.col("__canon"))
    )
    return (
        df.withColumn("__dom", registered_domain(canon))
        .withColumn("__canon", canon)
        .groupBy(F.col("__dom").alias("domain"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            n_urls.alias("n_urls"),
            *(c.alias(n) for n, c in (aggs or {}).items()),
        )
    )
