"""Blocking indices: map each row to zero or more blocking-key strings.

A blocking index compiles to ``key_df(df, row_key) ->
DataFrame[row_key, BLOCK_KEY]``; candidate pairs are then an inner
equi-join on BLOCK_KEY (pairing.py) — the Spark-native equivalent of
the reference's bucket dictionaries (/root/reference/datamatch/
indices.py:28-77). Catalyst handles the join strategy; hot keys are
salted in pairing.py.

Key semantics preserved from the reference:

* keys are value tuples — ``ColumnsIndex('c')`` key ``(2,)`` equals
  ``ColumnsIndex('d')`` key ``(2,)`` and MultiIndex OR-mode merges such
  buckets (indices.py:174-178, test_indices.py:157-159). We therefore
  serialize keys to canonical type-tagged strings so equal values
  collide regardless of the source column: numerics are canonicalized
  through double (Python ``(2,) == (2.0,)``).
* a null in any key component ⇒ the row never pairs (reference: NaN
  dict keys form singleton buckets, indices.py:129-132) — here the key
  becomes NULL and inner joins drop it.
* ``index_elements`` blocks on the Cartesian product of array-cell
  elements across key columns (indices.py:104-106,120-127) — chained
  ``explode``.
"""

from __future__ import annotations

import logging
from abc import ABC, abstractmethod

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

logger = logging.getLogger(__name__)

__all__ = [
    "BaseIndex",
    "NoopIndex",
    "ColumnsIndex",
    "MultiIndex",
    "GeoGridIndex",
    "PhoneticIndex",
    "QGramIndex",
    "SuffixArrayIndex",
    "SortedNeighborhoodIndex",
    "BLOCK_KEY",
]

BLOCK_KEY = "block_key"
_FIELD_SEP = "\x1f"  # between components of one key tuple
_TUPLE_SEP = "\x1e"  # between sub-index keys in AND-mode composite keys

_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def _escape_seps(col: Column) -> Column:
    """Escape the separator bytes out of a string component so
    ``("a\\x1fb", "c")`` can never collide with ``("a", "b\\x1fc")``:
    backslash doubles first, then each separator becomes a 2-byte
    escape — injective, so distinct tuples stay distinct."""
    c = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit(_FIELD_SEP), F.lit("\\f"))
    return F.replace(c, F.lit(_TUPLE_SEP), F.lit("\\t"))


def typed_key_component(col: Column, dtype: T.DataType) -> Column:
    """Serialize one key component so equal *values* serialize equally.

    Ints and floats both go through double (``(2,) == (2.0,)`` in the
    reference's tuple keys); safe below 2^53 which covers realistic row
    keys. NULL propagates. Only the string branch can contain separator
    bytes, so only it pays the escaping.
    """
    if isinstance(dtype, _NUMERIC_TYPES):
        d = col.cast("double")
        # NaN would serialize to the SHARED string 'n:NaN' and survive
        # the isNotNull key filter — every NaN row would land in one
        # giant bucket (N² bogus pairs). The reference's NaN dict keys
        # form singleton buckets, i.e. never pair: map NaN to NULL so
        # the inner join drops it like a missing key.
        d = F.when(F.isnan(d), F.lit(None).cast("double")).otherwise(d)
        # -0.0 == 0.0 but casts to the DIFFERENT string '-0.0': equal
        # values must serialize to equal keys (the reference's tuple
        # keys hash (0.0,) and (-0.0,) to one bucket)
        d = F.when(d == 0.0, F.lit(0.0)).otherwise(d)
        return F.concat(F.lit("n:"), d.cast("string"))
    if isinstance(dtype, T.BooleanType):
        return F.concat(F.lit("b:"), col.cast("string"))
    if isinstance(dtype, T.DateType):
        return F.concat(F.lit("d:"), col.cast("string"))
    if isinstance(dtype, T.TimestampType):
        return F.concat(F.lit("t:"), col.cast("string"))
    return F.concat(F.lit("s:"), _escape_seps(col.cast("string")))


def _serialize_key(components: list[Column]) -> Column:
    """Join typed components; NULL if any component is NULL (concat semantics)."""
    if len(components) == 1:
        return components[0]
    parts: list[Column] = []
    for i, c in enumerate(components):
        if i:
            parts.append(F.lit(_FIELD_SEP))
        parts.append(c)
    return F.concat(*parts)


class BaseIndex(ABC):
    """Abstract blocking index.

    ``multi_bucket`` is True when one row may land in more than one
    bucket (then the pair join must dedupe (idx_a, idx_b)).
    ``dedup_only`` is True when the index's keys are only meaningful
    within one dataset (match mode must reject it).
    """

    multi_bucket: bool = False
    dedup_only: bool = False

    @abstractmethod
    def key_df(self, df: DataFrame, row_key: str) -> DataFrame:
        """Return DataFrame[row_key, BLOCK_KEY] with non-null keys."""
        raise NotImplementedError

    def key_expr(self, df: DataFrame):
        """ROW-LOCAL key expression (one bucket per row, computable
        inline), or None when the index needs the full ``key_df``
        machinery (explodes, ranks, aggregates). When non-None,
        keyed_side computes keys in the same projection as the rec
        struct — no keys↔recs join, which at corpus scale is a double
        shuffle the moment the key frame outgrows the broadcast cap."""
        return None

    def key_df_pair(
        self, dfa: DataFrame, dfb: DataFrame, row_key: str
    ) -> tuple[DataFrame, DataFrame] | None:
        """Match-mode key frames computed JOINTLY over both datasets,
        for indices whose per-dataset keys are not comparable across
        datasets (``dedup_only``) but which have a well-defined
        two-dataset formulation (sorted-neighborhood ranks the tagged
        union). None (the default) means per-side ``key_df`` is
        already correct."""
        return None

    def required_columns(self) -> set[str]:
        """Source columns this index reads (for column pruning)."""
        return set()

    def iter_leaves(self):
        """Yield the leaf indices of the (possibly composite) tree —
        the metrics sink walks this to find indices with per-index
        observability hooks (e.g. ``QGramIndex.stop_grams``)."""
        yield self


class NoopIndex(BaseIndex):
    """Single bucket — the full cross product. Test/small data only; at
    scale this is by definition quadratic (reference indices.py:80-88)."""

    def key_df(self, df: DataFrame, row_key: str) -> DataFrame:
        return df.select(F.col(row_key), F.lit("s:__all__").alias(BLOCK_KEY))

    def key_expr(self, df: DataFrame):
        return F.lit("s:__all__")


class ColumnsIndex(BaseIndex):
    """Block on the value tuple of one or more columns
    (reference indices.py:91-138)."""

    def __init__(
        self,
        cols: str | list[str],
        ignore_key_error: bool = False,
        index_elements: bool = False,
    ) -> None:
        self._cols = [cols] if isinstance(cols, str) else list(cols)
        self._ignore_key_error = ignore_key_error
        self._index_elements = index_elements
        self.multi_bucket = index_elements

    def required_columns(self) -> set[str]:
        return set(self._cols)

    def key_df(self, df: DataFrame, row_key: str) -> DataFrame:
        missing = [c for c in self._cols if c not in df.columns]
        if missing:
            if self._ignore_key_error:
                # zero buckets, mirroring ignore_key_error=True
                # (reference indices.py:135-137)
                return df.select(
                    F.col(row_key), F.lit(None).cast("string").alias(BLOCK_KEY)
                ).limit(0)
            raise KeyError(missing[0])
        schema = {f.name: f.dataType for f in df.schema.fields}
        if self._index_elements:
            out = df.select(row_key, *self._cols)
            el_cols = []
            for c in self._cols:
                if not isinstance(schema[c], T.ArrayType):
                    raise ValueError(f"column {c} is not an array column")
                el = f"__el_{c}"
                # chained explodes = Cartesian product of list elements
                out = out.withColumn(el, F.explode(F.col(c)))
                el_cols.append((el, schema[c].elementType))
            key = _serialize_key([typed_key_component(F.col(n), t) for n, t in el_cols])
            return (
                out.select(F.col(row_key), key.alias(BLOCK_KEY))
                .where(F.col(BLOCK_KEY).isNotNull())
                .dropDuplicates([row_key, BLOCK_KEY])
            )
        key = _serialize_key(
            [typed_key_component(F.col(c), schema[c]) for c in self._cols]
        )
        return df.select(F.col(row_key), key.alias(BLOCK_KEY)).where(
            F.col(BLOCK_KEY).isNotNull()
        )

    def key_expr(self, df: DataFrame):
        missing = [c for c in self._cols if c not in df.columns]
        if missing:
            if self._ignore_key_error:
                return None  # zero-bucket semantics need key_df's limit(0)
            raise KeyError(missing[0])
        if self._index_elements:
            return None  # explode → multi-bucket, not row-local
        schema = {f.name: f.dataType for f in df.schema.fields}
        return _serialize_key(
            [typed_key_component(F.col(c), schema[c]) for c in self._cols]
        )


class MultiIndex(BaseIndex):
    """Combine sub-indices (reference indices.py:141-178).

    OR mode (``combine_keys=False``): union of the children's
    (row, key) sets; buckets with equal keys across children merge.
    AND mode (``combine_keys=True``): composite keys — a pair must
    share a bucket under *every* child.
    """

    def __init__(self, indices: list[BaseIndex], combine_keys: bool = False) -> None:
        self._indices = list(indices)
        self._combine = combine_keys
        if combine_keys:
            self.multi_bucket = any(i.multi_bucket for i in self._indices)
        else:
            self.multi_bucket = True
        # a dedup-only child makes the composite dedup-only: its
        # per-dataset keys (e.g. SNI ranks) are incomparable across
        # datasets, and the composition has no joint two-dataset form
        self.dedup_only = any(
            getattr(i, "dedup_only", False) for i in self._indices
        )

    def required_columns(self) -> set[str]:
        out: set[str] = set()
        for i in self._indices:
            out |= i.required_columns()
        return out

    def iter_leaves(self):
        for i in self._indices:
            yield from i.iter_leaves()

    def key_df(self, df: DataFrame, row_key: str) -> DataFrame:
        kdfs = [ix.key_df(df, row_key) for ix in self._indices]
        if not self._combine:
            out = kdfs[0]
            for k in kdfs[1:]:
                out = out.unionByName(k)
            return out.dropDuplicates([row_key, BLOCK_KEY])
        out = kdfs[0]
        for i, k in enumerate(kdfs[1:], start=1):
            k = k.withColumnRenamed(BLOCK_KEY, f"__bk_{i}")
            out = out.join(k, on=row_key)
        parts: list[Column] = [F.col(BLOCK_KEY)]
        for i in range(1, len(kdfs)):
            parts.append(F.lit(_TUPLE_SEP))
            parts.append(F.col(f"__bk_{i}"))
        return out.select(F.col(row_key), F.concat(*parts).alias(BLOCK_KEY))


class GeoGridIndex(BaseIndex):
    """Lossless geospatial blocking for :class:`GeoSimilarity`
    (datamatch_spark.similarities): two rows whose great-circle
    distance is <= ``d_km`` are GUARANTEED to share at least one
    bucket, yet bucket population stays bounded by local point density
    — the scale path that replaces the quadratic compare-everything a
    naive geo matcher needs. No reference counterpart.

    Method (shifted-grid covering in the CHORD metric): points within
    haversine distance d are within 3D chord distance
    ``c = 2·sin(d / 2R)`` of each other on the unit sphere. Embed each
    (lat, lon) as (x, y, z) = (cosφ·cosλ, cosφ·sinλ, sinφ) and lay
    EIGHT axis-aligned grids of cell size ``2c``, each shifted by 0 or
    ``c`` per axis: in every dimension an interval of length c fits
    inside one cell of size 2c under at least one of the two shifts,
    so some grid of the 2³ combinations contains both points in one
    cell. Each row lands in exactly 8 buckets
    ``(grid_id, ⌊(x+sx·c)/2c⌋, ⌊(y+sy·c)/2c⌋, ⌊(z+sz·c)/2c⌋)`` —
    constant fan-out, no recall loss (superset-of-exact is
    pytest-pinned against a brute-force haversine check; the verify
    step is ``GeoSimilarity`` scoring as usual).

    Inputs are decimal-degree columns; NULL lat or lon never pairs
    (reference NaN semantics). Multi-bucket, so pairing.py dedupes
    (idx_a, idx_b). All key computation is pure Column trig +
    arithmetic — no UDF, no shuffle beyond the standard key explode.
    """

    multi_bucket = True
    EARTH_RADIUS_KM = 6371.0088

    def __init__(self, lat_col: str, lon_col: str, d_km: float) -> None:
        import math

        if not d_km > 0:
            raise ValueError(f"d_km must be > 0, got {d_km}")
        self._lat = lat_col
        self._lon = lon_col
        self._d_km = float(d_km)
        # chord length subtending d_km on the unit sphere
        self._c = 2.0 * math.sin(min(
            math.pi / 2.0, d_km / (2.0 * self.EARTH_RADIUS_KM)
        ))

    def required_columns(self) -> set[str]:
        return {self._lat, self._lon}

    def key_df(self, df: DataFrame, row_key: str) -> DataFrame:
        for c in (self._lat, self._lon):
            if c not in df.columns:
                raise KeyError(c)
        lat = F.col(self._lat).cast("double")
        lon = F.col(self._lon).cast("double")
        phi, lam = F.radians(lat), F.radians(lon)
        x = F.cos(phi) * F.cos(lam)
        y = F.cos(phi) * F.sin(lam)
        z = F.sin(phi)
        c = self._c
        keys = []
        for gid in range(8):
            sx, sy, sz = gid & 1, (gid >> 1) & 1, (gid >> 2) & 1
            cells = [
                F.floor((axis + F.lit(s * c)) / F.lit(2.0 * c)).cast("string")
                for axis, s in ((x, sx), (y, sy), (z, sz))
            ]
            keys.append(
                F.concat(
                    F.lit(f"gg{gid}:"),
                    cells[0], F.lit(","), cells[1], F.lit(","), cells[2],
                )
            )
        valid = (
            lat.isNotNull() & lon.isNotNull() & ~F.isnan(lat) & ~F.isnan(lon)
        )
        return df.where(valid).select(
            F.col(row_key), F.explode(F.array(*keys)).alias(BLOCK_KEY)
        )


class PhoneticIndex(BaseIndex):
    """Phonetic blocking (Christen 2012 §4.3): rows bucket on the
    Soundex code of a name column, so sound-alike spellings
    (smith/smyth, meyer/myer) become candidates. Uses Spark's built-in
    ``soundex`` (JVM-side, codegen'd — American Soundex, first letter +
    3 digits). NULL/empty keys never pair; non-alphabetic-leading
    values pass through soundex unchanged (Spark semantics) and block
    on themselves.
    """

    def __init__(self, col: str) -> None:
        self._col = col

    def required_columns(self) -> set[str]:
        return {self._col}

    def key_df(self, df: DataFrame, row_key: str) -> DataFrame:
        if self._col not in df.columns:
            raise KeyError(self._col)
        code = F.soundex(F.upper(F.col(self._col).cast("string")))
        return df.select(
            F.col(row_key),
            F.when(
                code.isNotNull() & (F.length(code) > 0),
                F.concat(F.lit("p:"), _escape_seps(code)),
            ).alias(BLOCK_KEY),
        ).where(F.col(BLOCK_KEY).isNotNull())

    def key_expr(self, df: DataFrame):
        if self._col not in df.columns:
            raise KeyError(self._col)
        code = F.soundex(F.upper(F.col(self._col).cast("string")))
        return F.when(
            code.isNotNull() & (F.length(code) > 0),
            F.concat(F.lit("p:"), _escape_seps(code)),
        )


class QGramIndex(BaseIndex):
    """Q-gram fuzzy blocking (Christen 2012 §4.4): a row lands in one
    bucket per distinct character q-gram of its (lowercased) key
    column, so two rows become candidates iff their keys share ANY
    q-gram — robust to typos that break exact-equality blocking
    (every single-character edit preserves all q-grams further than
    q−1 positions away).

    Multi-bucket by construction (pair dedup handled by pairing.py).
    Keys shorter than ``q`` get the whole string as their single gram
    (so short keys still block); NULL keys never pair (reference NaN
    semantics, indices.py:129-132).

    Stop-gram cap — the scale guard: a q-gram present in most of the
    corpus ("the", "ing", a constant key prefix) makes its bucket ~the
    whole dataset, and even a perfectly salted join then FAITHFULLY
    enumerates ~N²/2 pairs. Grams whose document frequency exceeds
    ``max_df`` (absolute) — or, when ``max_df`` is None,
    ``max(50, max_df_frac · N)`` computed without a driver round-trip
    (the floor keeps small fixtures un-pruned) — are dropped from the
    index, the standard posting-list pruning of ``ngram_jaccard_pairs``
    (extras/dedup.py). WHOLE-STRING grams of sub-q-length keys are
    exempt from the cap: for those rows the gram IS the key, so the
    bucket is plain equality blocking — dropping it would silently
    un-block frequent short keys (a hot equality block is the salted
    join's job, not the pruner's). The trade for long keys: a pair
    whose ONLY shared grams are stop-grams is lost; typo tolerance
    via rare grams is untouched (a stop-gram, being corpus-wide,
    carries no blocking information anyway). Pass ``max_df=None,
    max_df_frac=None`` for the uncapped exhaustive behavior;
    ``stop_grams(df, row_key)`` reports what a given cap drops, for
    the metrics sink.

    Plan note: the capped index evaluates the gram explode twice (once
    under the document-frequency aggregate — whose shuffle carries only
    (gram, count) after map-side partial aggregation — once for the
    output keys). Deliberate: gram generation is cheap CPU, while the
    alternative (materializing the key frame to reuse it) would turn a
    declarative index into an IO-writing side effect per call.
    """

    multi_bucket = True

    def __init__(
        self,
        col: str,
        q: int = 3,
        max_df: int | None = None,
        max_df_frac: float | None = 0.1,
    ) -> None:
        if q < 1:
            raise ValueError("q must be >= 1")
        if max_df is not None and max_df < 1:
            raise ValueError("max_df must be >= 1")
        if max_df_frac is not None and not (0.0 < max_df_frac <= 1.0):
            raise ValueError("max_df_frac must be in (0, 1]")
        self._col = col
        self._q = int(q)
        self._max_df = max_df
        self._max_df_frac = max_df_frac
        self._warned_cap = False

    def required_columns(self) -> set[str]:
        return {self._col}

    def _all_keys(self, df: DataFrame, row_key: str) -> DataFrame:
        """(row_key, BLOCK_KEY, __whole): one row per distinct
        (row, gram); ``__whole`` marks a sub-q key's whole-string gram
        (an equality-block occurrence, exempt from the stop-gram cap)."""
        if self._col not in df.columns:
            raise KeyError(self._col)
        q = self._q
        src = f"lower(cast(`{self._col}` as string))"
        # sequence over 1-based gram start positions; greatest(1, ...)
        # keeps sub-q-length keys as one whole-string gram
        grams = F.expr(
            f"transform(sequence(1, greatest(1, length({src}) - {q - 1})), "
            f"i -> substring({src}, i, {q}))"
        )
        return (
            df.select(
                F.col(row_key),
                F.explode(grams).alias("__g"),
                (F.expr(f"length({src})") <= q).alias("__whole"),
            )
            .where(F.col("__g").isNotNull() & (F.length("__g") > 0))
            .select(
                F.col(row_key),
                F.concat(F.lit("q:"), _escape_seps(F.col("__g"))).alias(BLOCK_KEY),
                F.col("__whole"),
            )
            .dropDuplicates([row_key, BLOCK_KEY])
        )

    def _hot_grams(self, df: DataFrame, keys: DataFrame) -> DataFrame | None:
        """(BLOCK_KEY, __df) of grams OVER the document-frequency cap,
        or None when uncapped. All lazy — the fractional cap joins a
        1-row count aggregate instead of collecting N to the driver."""
        if self._max_df is None and self._max_df_frac is None:
            return None
        dfreq = keys.groupBy(BLOCK_KEY).agg(F.count(F.lit(1)).alias("__df"))
        if self._max_df is not None:
            return dfreq.where(F.col("__df") > self._max_df)
        n = df.agg(F.count(F.lit(1)).alias("__n"))
        return (
            dfreq.join(F.broadcast(n))
            .where(
                F.col("__df")
                > F.greatest(
                    F.lit(50),
                    F.ceil(F.col("__n") * F.lit(self._max_df_frac)),
                )
            )
            .select(BLOCK_KEY, "__df")
        )

    def stop_grams(self, df: DataFrame, row_key: str) -> DataFrame:
        """(block_key, df) of the grams the configured cap drops —
        the observability half of posting-list pruning (mirror of
        ``shingle_stats``); empty frame when uncapped. Whole-string
        occurrences of a listed gram survive in ``key_df`` (equality
        exemption — see class docstring)."""
        keys = self._all_keys(df, row_key)
        hot = self._hot_grams(df, keys)
        if hot is None:
            return keys.select(
                F.col(BLOCK_KEY), F.lit(0).cast("long").alias("__df")
            ).limit(0)
        return hot

    def key_df(self, df: DataFrame, row_key: str) -> DataFrame:
        keys = self._all_keys(df, row_key)
        hot = self._hot_grams(df, keys)
        if hot is not None:
            if not self._warned_cap:
                # the recall trade must be visible by default: a pair
                # whose ONLY shared grams exceed the cap is silently
                # not a candidate (ADVICE r4). The WARNING is once per
                # index instance (key_df runs per side and per metrics
                # re-derivation) — the PRUNE itself must run on every
                # call, or the second side / a reused index silently
                # blocks uncapped (regression caught in review r5).
                self._warned_cap = True
                cap = (
                    f"max_df={self._max_df}"
                    if self._max_df is not None
                    else f"max_df_frac={self._max_df_frac} (floor 50)"
                )
                logger.warning(
                    "QGramIndex(col=%r, q=%d) will drop any q-gram whose "
                    "document frequency exceeds %s; pairs sharing only such "
                    "stop-grams are not blocked. Pass max_df=None, "
                    "max_df_frac=None for exhaustive blocking; "
                    "stop_grams(df, row_key) lists what the cap drops.",
                    self._col,
                    self._q,
                    cap,
                )
            # hot grams are few by construction (each has > cap rows),
            # so the anti-join side broadcasts. Whole-string (sub-q
            # key) occurrences are exempt: for them the gram IS the
            # key, i.e. equality blocking, which pruning must never
            # silently remove — a frequent short key is a hot BLOCK
            # (salting's job), not a stop-gram.
            pruned = keys.where(~F.col("__whole")).join(
                F.broadcast(hot.select(BLOCK_KEY)), on=BLOCK_KEY, how="left_anti"
            )
            keys = keys.where(F.col("__whole")).unionByName(pruned)
        return keys.drop("__whole")


class SuffixArrayIndex(BaseIndex):
    """Suffix-array blocking (Aizawa & Oyama, WIRI 2005; Christen 2012
    §4.5, "suffix-array based indexing"): a row lands in one bucket per
    suffix — ``min_len`` characters or longer — of its (lowercased) key
    column, so two rows become candidates iff one's suffix set
    intersects the other's. Complements :class:`QGramIndex`: suffixes
    are anchored at the string END, so the method is robust to PREFIX
    corruption and truncation ("christen"/"kristen" share "risten";
    "catherine"/"katherine" share "atherine") at far fewer postings
    per row than q-grams (O(len) suffixes vs O(len) grams but each
    suffix is much more selective). No reference counterpart
    (/root/reference/datamatch/indices.py stops at value-equality
    blocking); added to complete the classic blocking-method taxonomy
    (standard / sorted-neighborhood / q-gram / suffix / phonetic /
    LSH) this engine ships.

    The classic method's too-frequent-suffix removal is
    ``max_block_size``: suffixes whose document frequency exceeds it
    are dropped from blocking (OPT-IN, default ``None`` = exhaustive —
    pruning that silently costs recall must be asked for; a WARNING is
    logged once when active and ``stop_suffixes()`` lists exactly what
    the cap drops). Whole-string occurrences of sub-``min_len`` keys
    are equality blocks, exempt from the cap — a frequent short key is
    a hot BLOCK (salting's job in pairing.py), not a stop-suffix. NULL
    and empty keys never pair (reference NaN semantics,
    indices.py:129-132). Keys shorter than ``min_len`` block on the
    whole string, so short keys still pair (same convention as
    ``QGramIndex`` sub-q keys).

    Scale shape: one ``explode`` over ≤ ``len-min_len+1`` suffixes per
    row, then the standard BLOCK_KEY equi-join — multi-bucket, so
    pairing.py dedupes (idx_a, idx_b). The document-frequency cap is a
    lazy 1-aggregate + broadcast anti-join (hot suffixes are few by
    construction), never a driver collect.
    """

    multi_bucket = True

    def __init__(
        self,
        col: str,
        min_len: int = 4,
        max_block_size: int | None = None,
    ) -> None:
        if min_len < 1:
            raise ValueError(f"min_len must be >= 1, got {min_len}")
        if max_block_size is not None and max_block_size < 1:
            raise ValueError(
                f"max_block_size must be >= 1 or None, got {max_block_size}"
            )
        self._col = col
        self._min_len = min_len
        self._max_block_size = max_block_size
        self._warned_cap = False

    def required_columns(self) -> set[str]:
        return {self._col}

    def _all_keys(self, df: DataFrame, row_key: str) -> DataFrame:
        """(row_key, BLOCK_KEY, __whole): one row per distinct
        (row, suffix); ``__whole`` marks a sub-min_len key's
        whole-string suffix (equality-block occurrence, cap-exempt)."""
        if self._col not in df.columns:
            raise KeyError(self._col)
        m = self._min_len
        src = f"lower(cast(`{self._col}` as string))"
        # 1-based suffix start positions; greatest(1, ...) keeps
        # sub-min_len keys as one whole-string suffix
        suffixes = F.expr(
            f"transform(sequence(1, greatest(1, length({src}) - {m - 1})), "
            f"i -> substring({src}, i))"
        )
        return (
            df.select(
                F.col(row_key),
                F.explode(suffixes).alias("__s"),
                (F.expr(f"length({src})") <= m).alias("__whole"),
            )
            .where(F.col("__s").isNotNull() & (F.length("__s") > 0))
            .select(
                F.col(row_key),
                F.concat(F.lit("sa:"), _escape_seps(F.col("__s"))).alias(
                    BLOCK_KEY
                ),
                F.col("__whole"),
            )
            .dropDuplicates([row_key, BLOCK_KEY])
        )

    def _hot_suffixes(self, keys: DataFrame) -> DataFrame | None:
        """(BLOCK_KEY, __df) of suffixes OVER the cap, or None."""
        if self._max_block_size is None:
            return None
        return (
            keys.groupBy(BLOCK_KEY)
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") > self._max_block_size)
        )

    def stop_suffixes(self, df: DataFrame, row_key: str) -> DataFrame:
        """(block_key, df) of the suffixes the configured cap drops —
        the observability half of too-frequent-suffix removal; empty
        frame when uncapped. Whole-string occurrences of a listed
        suffix survive in ``key_df`` (equality exemption)."""
        keys = self._all_keys(df, row_key)
        hot = self._hot_suffixes(keys)
        if hot is None:
            return keys.select(
                F.col(BLOCK_KEY), F.lit(0).cast("long").alias("__df")
            ).limit(0)
        return hot

    def key_df(self, df: DataFrame, row_key: str) -> DataFrame:
        keys = self._all_keys(df, row_key)
        hot = self._hot_suffixes(keys)
        if hot is not None:
            if not self._warned_cap:
                self._warned_cap = True
                logger.warning(
                    "SuffixArrayIndex(col=%r, min_len=%d) will drop any "
                    "suffix whose document frequency exceeds "
                    "max_block_size=%d; pairs sharing only such suffixes "
                    "are not blocked. stop_suffixes(df, row_key) lists "
                    "what the cap drops.",
                    self._col,
                    self._min_len,
                    self._max_block_size,
                )
            pruned = keys.where(~F.col("__whole")).join(
                F.broadcast(hot.select(BLOCK_KEY)), on=BLOCK_KEY, how="left_anti"
            )
            keys = keys.where(F.col("__whole")).unionByName(pruned)
        return keys.drop("__whole")


class SortedNeighborhoodIndex(BaseIndex):
    """Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD 1995;
    Christen 2012 §4.5): sort all rows by ``cols`` and pair every two
    rows whose positions differ by less than ``window``. Catches
    near-boundary matches that value-equality blocking splits apart
    (typos in the blocking key, adjacent dates, …) at a guaranteed
    linear candidate count (≤ N·(window−1) pairs).

    Spark-native formulation: a row at global sort position ``r`` lands
    in the ``window`` consecutive buckets ``r … r+window−1``, so two
    rows share ≥1 bucket **iff** their positions differ by
    < ``window`` — sorted-neighborhood becomes a plain multi-bucket
    equality index and composes with the whole pairing machinery
    (salting, MultiIndex, dedup of multi-bucket pairs). The global
    position comes from ``global_rank`` (distributed two-phase rank —
    no single-task sort). Keys cost N·window rows and a pair found at
    distance d is emitted from window−d buckets before dedup; with the
    usual small windows (5–20) both are linear in N.

    Ordering is over the RAW column values (Spark/SQL column order,
    ties broken by ``row_key`` — a total order), NOT the serialized
    key strings. Rows with a NULL in any sort column never pair
    (reference NaN-key semantics, indices.py:129-132).

    Match mode (two datasets — the Hernández-Stolfo linkage case)
    ranks the TAGGED UNION of A and B once (``key_df_pair``; ties
    broken by (side, row_key)), emits window buckets from the shared
    rank, and the A×B join restricts pairs to cross-side by
    construction: a ∈ A and b ∈ B become candidates iff their
    positions in the merged sort differ by < ``window``. Per-dataset
    ``key_df`` ranks remain incomparable across datasets, so nesting
    this index inside a match-mode ``MultiIndex`` still raises.
    """

    multi_bucket = True
    dedup_only = True

    def __init__(self, cols: str | list[str], window: int = 5) -> None:
        if window < 2:
            raise ValueError("window must be >= 2 (window=1 pairs nothing)")
        self._cols = [cols] if isinstance(cols, str) else list(cols)
        self._window = int(window)

    def required_columns(self) -> set[str]:
        return set(self._cols)

    def _select_sortable(self, df: DataFrame, row_key: str) -> DataFrame:
        missing = [c for c in self._cols if c not in df.columns]
        if missing:
            raise KeyError(missing[0])
        sel = df.select(row_key, *self._cols)
        for c in self._cols:
            sel = sel.where(F.col(c).isNotNull())
        return sel

    def _window_buckets(self, ranked: DataFrame, row_key: str) -> DataFrame:
        offsets = F.array(*[F.lit(i) for i in range(self._window)])
        return ranked.select(
            F.col(row_key),
            F.col("__snr"),
            F.explode(offsets).alias("__off"),
        ).select(
            F.col(row_key),
            F.concat(
                F.lit("w:"), (F.col("__snr") + F.col("__off")).cast("string")
            ).alias(BLOCK_KEY),
        )

    def key_df(self, df: DataFrame, row_key: str) -> DataFrame:
        from .ranking import global_rank

        ranked = global_rank(
            self._select_sortable(df, row_key),
            [F.col(c) for c in self._cols] + [F.col(row_key)],
            "__snr",
        )
        return self._window_buckets(ranked, row_key)

    def key_df_pair(
        self, dfa: DataFrame, dfb: DataFrame, row_key: str
    ) -> tuple[DataFrame, DataFrame]:
        from .ranking import global_rank

        tagged = self._select_sortable(dfa, row_key).withColumn(
            "__side", F.lit(0)
        ).unionByName(
            self._select_sortable(dfb, row_key).withColumn("__side", F.lit(1))
        )
        ranked = global_rank(
            tagged,
            [F.col(c) for c in self._cols] + [F.col("__side"), F.col(row_key)],
            "__snr",
        )
        # ONE ranking pass over the union; the union frame is thin
        # (row_key + sort cols), so the extra localCheckpoint inside
        # global_rank is small. Buckets from the shared rank make
        # sorted-neighborhood a plain equality index again.
        keys_a = self._window_buckets(
            ranked.where(F.col("__side") == 0), row_key
        )
        keys_b = self._window_buckets(
            ranked.where(F.col("__side") == 1), row_key
        )
        return keys_a, keys_b
