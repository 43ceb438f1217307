"""Deduplication operators for large text corpora.

All stages are JVM-side DataFrame ops (explode/groupBy/join) — no
Python in the hot path. Scale notes per operator:

* exact:      one shuffle (groupBy hash). O(N).
* n-gram Jaccard: shingle-inverted-index self-join; the ``max_df``
  stop-shingle cap bounds the quadratic blowup of common shingles
  (standard posting-list pruning). Skew beyond the cap is handled by
  AQE; truly hot shingles are dropped and logged via
  ``shingle_stats``.
* MinHash-LSH: shingle hashing JVM-side, signatures as wrapping-uint64
  numpy matrix ops in ONE Arrow pandas UDF (no explode shuffle),
  banding via hash of signature slices, candidates from band-bucket
  self-join, signature-estimate prefilter, then EXACT hashed-shingle
  Jaccard verification — output is LSH-recall-bounded but
  precision-exact.
* SimHash: 64-bit sign-sum fingerprint; near-dup candidates via
  chunk pigeonhole banding (n_chunks = max_hamming+1 by default, which
  makes recall lossless), verified with bit_count(xor).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ..session import checkpoint_storage_level as _ckpt_level_d
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "GRAM_HASH_FNS",
    "shingles_expr",
    "content_fingerprint",
    "exact_duplicates",
    "shingle_stats",
    "ngram_jaccard_pairs",
    "ngram_jaccard_match",
    "minhash_signatures",
    "band_error",
    "auto_bands",
    "minhash_lsh_pairs",
    "minhash_lsh_match",
    "minhash_dedup_groups",
    "simhash",
    "simhash_near_pairs",
    "simhash_near_match",
]


def shingles_expr(text_col: str, n: int) -> Column:
    """Distinct word n-grams of column ``text_col`` (space tokens)."""
    return _shingles_expr(text_col, n)


def _shingles_sql(text_col: str, n: int) -> str:
    toks = f"split({text_col}, ' ')"
    if n == 1:
        return f"array_distinct({toks})"
    # guard: sequence(1, 0) would generate a DESCENDING [1, 0] and feed
    # slice() a zero start — short docs get an empty shingle set instead
    return (
        f"case when size({toks}) < {n} then array() "
        f"else array_distinct(transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({toks}, i, {n})))) end"
    )


def _shingles_expr(text_col: str, n: int) -> Column:
    return F.expr(_shingles_sql(text_col, n))


#: supported gram-hash functions for the hashing dedup family.
#: ``xxhash64`` (default) is the fast JVM path; ``md5`` derives the
#: 64-bit gram hash from the first 16 hex chars of md5(gram string) —
#: slower (materializes gram strings + a cryptographic hash per gram)
#: but reproducible in ANY engine with an md5 function, which makes the
#: whole MinHash/SimHash pipeline auditable end-to-end by an external
#: SQL oracle (the driver's DuckDB correctness gate uses it).
GRAM_HASH_FNS = ("xxhash64", "md5")


def _hex16_to_int64_sql(hh: str) -> str:
    """SQL fragment: signed-int64 reinterpretation of the first 16 hex
    chars of digest expression ``hh`` (big-endian first 8 md5 bytes).
    Built from two 32-bit ``conv`` halves because
    conv(16-hex-digit,16,10) yields unsigned decimals ≥ 2^63 that
    cannot cast to bigint; shiftleft wraps to the same two's-complement
    bits numpy's uint64→int64 view produces (parity pinned in tests
    against hashlib.md5). Takes the HEX, not the gram: interpreted
    higher-order-function lambdas get no common-subexpression
    elimination, so the digest must be staged once by the caller or
    every gram pays the cryptographic hash twice."""
    return (
        f"shiftleft(cast(conv(substr({hh},1,8),16,10) as bigint), 32) | "
        f"cast(conv(substr({hh},9,8),16,10) as bigint)"
    )


def _check_hash_fn(hash_fn: str) -> None:
    if hash_fn not in GRAM_HASH_FNS:
        raise ValueError(
            f"hash_fn must be one of {GRAM_HASH_FNS}, got {hash_fn!r}"
        )


def with_shingle_hashes(
    df: DataFrame, text_col: str, n: int, out_col: str,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Adds ``out_col``: distinct word-n-gram hashes (array<long>).

    ``hash_fn="xxhash64"`` (default, the corpus-scale hot path) never
    materializes shingle strings — tokens are hashed once, each n-gram
    hash mixes its n token hashes (multi-arg xxhash64), ~n× less string
    work. Two projections so the token-hash array is computed once
    (Catalyst does not collapse non-cheap aliases referenced
    repeatedly).

    ``hash_fn="md5"`` hashes the gram STRING via md5 (see
    ``GRAM_HASH_FNS``) — the deterministic cross-engine variant used by
    the driver's DuckDB oracle; same output schema. The outer
    array_distinct keeps set semantics under (vanishingly rare) 64-bit
    collisions of distinct grams, matching the xxhash64 path's
    distinct-over-hashes."""
    _check_hash_fn(hash_fn)
    if hash_fn == "md5":
        grams = _shingles_sql(text_col, n)
        # nested transform stages md5(g) ONCE per gram; inlining the
        # digest into both conv halves would hash every gram twice
        # (interpreted HOF lambdas have no CSE)
        return df.withColumn(
            out_col,
            F.expr(
                f"array_distinct(transform(transform({grams}, g -> md5(g)), "
                f"hh -> {_hex16_to_int64_sql('hh')}))"
            ),
        )
    tmp = f"__tokh_{out_col}"
    out = df.withColumn(
        tmp, F.expr(f"transform(split({text_col}, ' '), t -> xxhash64(t))")
    )
    if n == 1:
        return out.withColumn(out_col, F.array_distinct(F.col(tmp))).drop(tmp)
    args = ", ".join(f"{tmp}[i + {j}]" for j in range(n))
    gram = (
        f"case when size({tmp}) < {n} then cast(array() as array<bigint>) "
        f"else array_distinct(transform(sequence(0, size({tmp}) - {n}), "
        f"i -> xxhash64({args}))) end"
    )
    return out.withColumn(out_col, F.expr(gram)).drop(tmp)


def content_fingerprint(text_col: str) -> Column:
    """Canonical content fingerprint used by BOTH batch
    ``exact_duplicates`` and ``streaming.streaming_exact_dedup`` — one
    definition so the two paths can never disagree on what counts as
    an exact duplicate. NULL text yields a NULL fingerprint (callers
    decide NULL semantics)."""
    return F.md5(F.lower(F.col(text_col)))


def exact_duplicates(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """(canonical_id, doc_id) for every doc whose lowercased text hash
    collides with another; canonical = min id in the group."""
    h = df.select(F.col(id_col), content_fingerprint(text_col).alias("__h"))
    grp = h.groupBy("__h").agg(
        F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n")
    )
    return (
        h.join(grp.where(F.col("n") > 1), on="__h")
        .select("canonical_id", F.col(id_col).alias("doc_id"))
        .where(F.col("doc_id") != F.col("canonical_id"))
    )


def shingle_stats(df: DataFrame, id_col: str, text_col: str = "text", n: int = 3) -> DataFrame:
    sh = df.select(
        F.col(id_col), F.explode(_shingles_expr(text_col, n)).alias("shingle")
    )
    return sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = 1000,
) -> DataFrame:
    """(idx_a, idx_b, jaccard) for doc pairs whose distinct word-n-gram
    Jaccard similarity >= threshold. Inverted-index self-join;
    shingles occurring in more than ``max_df`` docs are dropped as
    stop-shingles (bounds the join blowup). Set sizes come from the
    UNPRUNED shingle sets while the intersection runs on the pruned
    posting lists, so affected pairs can only LOSE intersection mass —
    the reported jaccard is a lower bound of the true one and the
    threshold keeps precision. (Sizing on the pruned sets would shrink
    the union denominator and INFLATE scores above the true jaccard —
    two docs agreeing only on kept shingles would report 1.0.)"""
    sh = _ensure_width(df.select(F.col(id_col).alias("__id"), text_col)).select(
        "__id", F.explode(_shingles_expr(text_col, n)).alias("shingle")
    )
    # the tokenize+shingle+explode lineage feeds FOUR consumers (sizes
    # agg, stop-shingle counts, both self-join sides); materialize once
    # instead of re-running the most expensive stage 4x — mirrors the
    # minhash path's localCheckpoint of its per-doc frame
    sh = sh.localCheckpoint(storageLevel=_ckpt_level_d())
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("sz"))
    if max_df is not None:
        hot = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).where(
            F.col("df") > max_df
        )
        sh = sh.join(hot, on="shingle", how="left_anti")
    a = sh.select(F.col("__id").alias("idx_a"), "shingle")
    b = sh.select(F.col("__id").alias("idx_b"), "shingle")
    common = (
        a.join(b, on="shingle")
        .where(F.col("idx_a") < F.col("idx_b"))
        .groupBy("idx_a", "idx_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("__id").alias("idx_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("__id").alias("idx_b"), F.col("sz").alias("sz_b"))
    jac = (
        common.join(sa, on="idx_a")
        .join(sb, on="idx_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
                6,
            ),
        )
    )
    return jac.where(F.col("jaccard") >= threshold).select("idx_a", "idx_b", "jaccard")


def ngram_jaccard_match(
    df_a: DataFrame,
    df_b: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = 1000,
) -> DataFrame:
    """Cross-corpus n-gram Jaccard JOIN: ``(idx_a, idx_b, jaccard)``
    with ``idx_a`` from ``df_a``, ``idx_b`` from ``df_b`` and distinct
    word-n-gram Jaccard >= ``threshold`` — the two-table analogue of
    :func:`ngram_jaccard_pairs` (exact, no sketching; the brute-force
    baseline the MinHash/SimHash match modes are measured against).

    Stop-shingles are counted over the UNION of both sides' posting
    lists (the join blowup is the product of per-side postings, so a
    gram hot on either side is pruned); as in pairs mode, set sizes
    come from the unpruned sets, making the reported jaccard a lower
    bound and keeping precision. No ordering predicate is applied —
    every qualifying (a, b) cross pair appears exactly once, and an id
    present in both corpora may pair with itself."""

    def side(df: DataFrame) -> DataFrame:
        sh = _ensure_width(
            df.select(F.col(id_col).alias("__id"), text_col)
        ).select("__id", F.explode(_shingles_expr(text_col, n)).alias("shingle"))
        # feeds sizes agg + df counts + its join side: materialize once
        return sh.localCheckpoint(storageLevel=_ckpt_level_d())

    sha, shb = side(df_a), side(df_b)
    sizes_a = sha.groupBy("__id").agg(F.count(F.lit(1)).alias("sz_a"))
    sizes_b = shb.groupBy("__id").agg(F.count(F.lit(1)).alias("sz_b"))
    if max_df is not None:
        hot = (
            sha.select("shingle")
            .unionAll(shb.select("shingle"))
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_df)
        )
        sha = sha.join(hot, on="shingle", how="left_anti")
        shb = shb.join(hot, on="shingle", how="left_anti")
    common = (
        sha.select(F.col("__id").alias("idx_a"), "shingle")
        .join(shb.select(F.col("__id").alias("idx_b"), "shingle"), on="shingle")
        .groupBy("idx_a", "idx_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jac = (
        common.join(sizes_a.withColumnRenamed("__id", "idx_a"), on="idx_a")
        .join(sizes_b.withColumnRenamed("__id", "idx_b"), on="idx_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
                6,
            ),
        )
    )
    return jac.where(F.col("jaccard") >= threshold).select(
        "idx_a", "idx_b", "jaccard"
    )


def _splitmix64(x):
    """Vectorized splitmix64 finalizer (public-domain constant mix) —
    wrapping uint64 numpy arithmetic (overflow is the point; numpy
    emits a RuntimeWarning only for 0-d scalar inputs, silenced)."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _has_shingles(text_col: str, n: int) -> Column:
    """Cheap raw-text predicate equivalent to ``size(shingles) > 0``.

    NEVER filter on the computed shingle array: Catalyst pushes such a
    filter through the projection by SUBSTITUTING the whole nested-HOF
    shingle expression into the predicate, and interpreted HOF
    evaluation has no common-subexpression elimination — measured 280×
    slower (0.7s → 195s at 200k docs) than this token-count predicate,
    which pushes down to the scan."""
    return F.col(text_col).isNotNull() & (
        F.size(F.split(F.col(text_col), " ")) >= n
    )


def _ensure_width(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin-repartition ``df`` iff it is under-partitioned for
    the session's parallelism. The heavy per-row operators below
    (signatures, simhash sums, shingle explode) otherwise inherit the
    input's partitioning — a single-file parquet read or a
    localCheckpoint can be ONE partition, serializing all compute onto
    one core. At scale a real table is already wide and this is a
    no-op (no shuffle added)."""
    from ..session import effective_parallelism

    want = partitions or 2 * effective_parallelism(df.sparkSession)
    if df.rdd.getNumPartitions() >= max(2, want // 2):
        return df
    return df.repartition(want)


# padded-cell budget per signature sub-batch: 32M uint64 cells ≈
# 256 MB matrix + 32 MB mask. Without it, one long document pads the
# WHOLE Arrow batch to its width (10k rows × 1M shingles ≈ 80 GB).
_MINHASH_CELL_BUDGET = 32 << 20


def _minhash_matrix(sh: pd.Series, seeds: np.ndarray) -> np.ndarray:
    """(nrows × n_perm) uint64 MinHash signature matrix from a series
    of shingle-hash lists — wrapping-uint64 numpy, no Python per-hash
    loop (the only loops are per-row padding and per-permutation).

    Rows are processed in LENGTH-SORTED sub-batches whose padded size
    stays under ``_MINHASH_CELL_BUDGET``, so a single long outlier
    document cannot inflate the padding of every other row in the
    Arrow batch. Per-row signatures are independent — output is
    identical to the unsplit computation."""
    nrows = len(sh)
    lens = np.fromiter((len(x) for x in sh), dtype=np.int64, count=nrows)
    order = np.argsort(lens, kind="stable")
    sigs = np.empty((nrows, len(seeds)), dtype=np.uint64)
    pad = np.uint64(0xFFFFFFFFFFFFFFFF)
    vals = sh.to_numpy()
    start = 0
    while start < nrows:
        end = start + 1
        # ascending lengths: the slice's pad width is its LAST row's
        # length; grow while the padded cell count fits the budget
        while (
            end < nrows
            and (end - start + 1) * max(int(lens[order[end]]), 1)
            <= _MINHASH_CELL_BUDGET
        ):
            end += 1
        idx = order[start:end]
        maxl = max(int(lens[idx[-1]]), 1)
        M = np.zeros((len(idx), maxl), dtype=np.uint64)
        mask = np.zeros((len(idx), maxl), dtype=bool)
        for row, i in enumerate(idx):
            x = vals[i]
            k = len(x)
            if k:
                M[row, :k] = np.asarray(x, dtype=np.int64).astype(np.uint64)
                mask[row, :k] = True
        for p, seed in enumerate(seeds):
            h = _splitmix64(M ^ seed)
            h = np.where(mask, h, pad)
            sigs[idx, p] = h.min(axis=1)
        start = end
    return sigs


def _minhash_matrix_flat(
    flat: np.ndarray, starts: np.ndarray, lens: np.ndarray, seeds: np.ndarray
) -> np.ndarray:
    """`_minhash_matrix` over a FLAT Arrow values buffer + offsets —
    identical masked-min arithmetic and identical length-sorted
    ``_MINHASH_CELL_BUDGET`` sub-batching, but the padded matrix is
    built by one vectorized scatter instead of a per-row Python loop
    (and no per-row ndarray objects ever exist)."""
    nrows = len(lens)
    order = np.argsort(lens, kind="stable")
    sigs = np.empty((nrows, len(seeds)), dtype=np.uint64)
    pad = np.uint64(0xFFFFFFFFFFFFFFFF)
    start = 0
    while start < nrows:
        end = start + 1
        while (
            end < nrows
            and (end - start + 1) * max(int(lens[order[end]]), 1)
            <= _MINHASH_CELL_BUDGET
        ):
            end += 1
        idx = order[start:end]
        maxl = max(int(lens[idx[-1]]), 1)
        M = np.zeros((len(idx), maxl), dtype=np.uint64)
        mask = np.zeros((len(idx), maxl), dtype=bool)
        sub_lens = lens[idx]
        total = int(sub_lens.sum())
        if total:
            row_of = np.repeat(np.arange(len(idx)), sub_lens)
            col_of = np.arange(total) - np.repeat(
                np.concatenate([[0], np.cumsum(sub_lens)[:-1]]), sub_lens
            )
            src = np.repeat(starts[idx], sub_lens) + col_of
            M[row_of, col_of] = flat[src].astype(np.uint64)
            mask[row_of, col_of] = True
        for p, seed in enumerate(seeds):
            h = _splitmix64(M ^ seed)
            h = np.where(mask, h, pad)
            sigs[idx, p] = h.min(axis=1)
        start = end
    return sigs


def _band_hashes(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(nrows × bands) int64 band hashes: splitmix64 fold over each
    band's signature slice, seeded by the band index — replaces the
    former JVM path (cast 64 longs to string, concat, xxhash64), which
    was the minhash plan's codegen hot spot."""
    nrows, n_perm = sigs.shape
    r = n_perm // bands
    out = np.empty((nrows, bands), dtype=np.uint64)
    for b in range(bands):
        h = np.full(nrows, _splitmix64(np.uint64(b + 0x5EED)), dtype=np.uint64)
        for c in range(b * r, (b + 1) * r):
            h = _splitmix64(h ^ sigs[:, c])
        out[:, b] = h
    return out.astype(np.int64)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    n_perm: int = 64,
    partitions: int | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, sig array<long>) MinHash signatures.

    Shingles are token-rolling xxhash64 longs (with_shingle_hashes —
    no shingle strings); the n_perm permutation hashes are
    splitmix64(shingle_hash ^ seed_i) computed as wrapping-uint64 numpy
    matrix ops inside ONE Arrow pandas UDF — the 64-hashes-per-shingle
    blowup runs at numpy speed instead of 64 JVM hash calls per
    shingle, and there is NO explode/groupBy shuffle: signatures are a
    per-row map. Docs with no shingles produce no signature (parity
    with an explode+agg formulation)."""
    seeds = _splitmix64(np.arange(1, n_perm + 1, dtype=np.uint64))

    @pandas_udf("array<long>")
    def sig_udf(sh: pd.Series) -> pd.Series:
        if len(sh) == 0:
            return pd.Series([], dtype=object)
        return pd.Series(_minhash_matrix(sh, seeds).astype(np.int64).tolist())

    base = _ensure_width(
        df.select(F.col(id_col).alias("__id"), text_col), partitions
    ).where(_has_shingles(text_col, n))
    sh = with_shingle_hashes(base, text_col, n, "__sh", hash_fn)
    return sh.select(F.col("__id").alias(id_col), sig_udf(F.col("__sh")).alias("sig"))


def _sig_bands_udf(n_perm: int, bands: int):
    """ONE Arrow UDF computing the MinHash signature AND its band
    hashes (numpy splitmix64 folds) — no per-band string concat/cast
    JVM expression. Shared by the batch LSH pipeline and the streaming
    stateful near-dup operator."""
    if n_perm % bands != 0:
        # _band_hashes uses r = n_perm // bands: a non-dividing band
        # count would silently drop the last n_perm % bands signature
        # components from every band, losing recall with no warning.
        raise ValueError(
            f"bands ({bands}) must divide n_perm ({n_perm}); "
            f"{n_perm % bands} signature components would be unused"
        )
    seeds = _splitmix64(np.arange(1, n_perm + 1, dtype=np.uint64))

    @pandas_udf("struct<sig: array<long>, bands: array<long>>")
    def sig_bands_udf(sh: pd.Series) -> pd.DataFrame:
        if len(sh) == 0:
            return pd.DataFrame({"sig": [], "bands": []})
        sigs = _minhash_matrix(sh, seeds)
        bh = _band_hashes(sigs, bands)
        return pd.DataFrame(
            {"sig": sigs.astype(np.int64).tolist(), "bands": bh.tolist()}
        )

    return sig_bands_udf


def band_error(n_perm: int, bands: int, threshold: float) -> tuple[float, float]:
    """(false-positive area, false-negative area) of the LSH S-curve
    P(candidate | s) = 1-(1-s^r)^b against the step function at
    ``threshold`` — the standard banding-quality integrals (Leskovec,
    Rajaraman & Ullman, *Mining of Massive Datasets* §3.4). Numeric
    trapezoid over a fixed grid; deterministic."""
    r = n_perm // bands
    s = np.linspace(0.0, 1.0, 501)
    p = 1.0 - (1.0 - s**r) ** bands
    below = s < threshold
    # np.trapz was removed in NumPy 2.0 (renamed trapezoid)
    trapezoid = getattr(np, "trapezoid", None) or np.trapz
    fp = float(trapezoid(p[below], s[below]))
    fn = float(trapezoid(1.0 - p[~below], s[~below]))
    return fp, fn


def auto_bands(
    n_perm: int,
    threshold: float,
    fp_weight: float = 0.5,
    fn_weight: float = 0.5,
) -> int:
    """Band count b (a divisor of n_perm with rows per band
    r = n_perm/b >= 2) minimizing the weighted S-curve error
    ``fp_weight·FP_area + fn_weight·FN_area`` at ``threshold`` (the
    MMDS §3.4 / datasketch criterion). With the default equal weights
    this balances verify-stage candidate flood (FP) against missed
    near-threshold pairs (FN); recall-critical callers raise
    ``fn_weight``. Pairs AT the threshold boundary always have
    intermediate candidate probability — the S-curve is steep, not a
    step — and the exact-verify stage keeps precision exact either
    way. Raises when ``n_perm`` has no usable divisor (e.g. prime):
    one band of the full signature (the old silent fallback) demands
    an exact signature match and collapses recall to near-exact
    duplicates regardless of the requested threshold."""
    if fp_weight < 0 or fn_weight < 0 or (fp_weight == 0 and fn_weight == 0):
        raise ValueError(
            "fp_weight/fn_weight must be non-negative and not both zero "
            f"(got {fp_weight}, {fn_weight})"
        )
    best = None
    for b in range(2, n_perm // 2 + 1):
        if n_perm % b:
            continue
        fp, fn = band_error(n_perm, b, threshold)
        err = fp_weight * fp + fn_weight * fn
        if best is None or err < best[0]:
            best = (err, b)
    if best is None:
        raise ValueError(
            f"no usable band count for n_perm={n_perm}: it has no divisor "
            "b with n_perm/b >= 2; use a composite n_perm (e.g. a power of "
            "two) or pass bands= explicitly"
        )
    return best[1]


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    n_perm: int = 64,
    bands: int | None = None,
    threshold: float = 0.7,
    est_margin: float = 0.12,
    checkpoint_dir: str | None = None,
    band_fn_weight: float = 0.5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(idx_a, idx_b, jaccard) near-duplicate pairs: LSH banding for
    candidates, signature-estimate prefilter, exact hashed-shingle
    Jaccard for verification (precision-exact up to 64-bit hash
    collisions).

    ``bands`` defaults to the divisor of ``n_perm`` minimizing the
    weighted S-curve FP/FN error at ``threshold`` (``auto_bands``, the
    MMDS §3.4 criterion) — over-banding floods verification with
    sub-threshold candidates (the classic LSH cost cliff; measured
    3.7× wall at threshold 0.9 for +2% pairs), under-banding misses
    near-threshold pairs. ``band_fn_weight`` (0..1) tilts the choice:
    raise it for recall-critical jobs, at verification cost. Prime
    ``n_perm`` raises a ValueError rather than silently degrading to
    one full-signature band. The estimate prefilter
    (fraction of equal signature components >= threshold-est_margin)
    kills most false candidates with 64 long comparisons before the
    set-intersection pass; at 64 perms the estimate's σ ≈ 0.04, so the
    default margin costs <1% recall at the threshold.

    ``checkpoint_dir``: when given, the per-doc signature frame is
    committed as a parquet stage (StageManifest — same atomic-commit
    contract as the matcher's resumable checkpoints; at deployment
    scale this is the Iceberg-snapshot analogue), so a restarted dedup
    job skips signature computation; default is an in-memory
    localCheckpoint.

    ``hash_fn``: gram-hash function (``GRAM_HASH_FNS``); "md5" is the
    slower cross-engine-deterministic variant the driver's DuckDB
    oracle replicates end-to-end."""
    _check_hash_fn(hash_fn)
    bands = _resolve_bands(n_perm, threshold, bands, band_fn_weight)
    info = _minhash_info(
        df, id_col, text_col, n, n_perm, bands, checkpoint_dir, hash_fn
    )
    return _bucket_grouped_verified(info, None, n_perm, bands, threshold, est_margin)


def _resolve_bands(
    n_perm: int, threshold: float, bands: int | None, band_fn_weight: float
) -> int:
    """``bands`` passthrough, or the auto_bands S-curve choice with the
    shared band_fn_weight validation (one definition for pairs AND
    match mode)."""
    if bands is not None:
        return bands
    if not (0.0 <= band_fn_weight <= 1.0):
        raise ValueError(
            f"band_fn_weight must be in [0, 1], got {band_fn_weight} "
            "(it is the FN share of the banding error; its complement "
            "is the FP share)"
        )
    return auto_bands(n_perm, threshold, 1.0 - band_fn_weight, band_fn_weight)


def _banded(info: DataFrame, idx_alias: str) -> DataFrame:
    """(idx, band, bh) band-bucket keys of a signature frame — the only
    columns the candidate join shuffles (vectors/shingle sets dropped
    pre-shuffle)."""
    return info.select(
        F.col("__id").alias(idx_alias), F.posexplode("bands").alias("band", "bh")
    )


def _bucket_grouped_verified(
    info_a: DataFrame,
    info_b: DataFrame | None,
    n_perm: int,
    bands: int,
    threshold: float,
    est_margin: float,
) -> DataFrame:
    """(idx_a, idx_b, jaccard) — band-bucket-GROUPED candidate
    generation + verification in one shuffle (guide §8: decide with a
    grouped payload pass, never join payloads onto pair rows).

    The former join formulation exploded band keys, self-joined them,
    deduplicated the raw candidate stream (O(pairs x bands) rows) and
    then attached sig+sh to every pair via two wide joins — the second
    of which re-shuffles pairs CARRYING one side's payload (~850 B/row,
    the dominant minhash cost at scale). Here each row's payload moves
    exactly once per band membership: explode to (band, bh, id, sig,
    sh), hash-partition by bucket, and verify all in-bucket pairs
    vectorized in a mapInArrow kernel (signature-estimate prefilter as
    int64 component equality; exact jaccard via a per-bucket
    shingle-universe membership matmul — float64, so intersection
    counts are exact). A pair co-bucketed in several bands is verified
    once per band with identical bits and deduplicated on the NARROW
    output — cheaper than deduplicating the raw candidate stream and
    then paying the payload joins.

    Emits RAW (unrounded) jaccard; the caller applies the same JVM-side
    F.round + threshold filter as the join path, so the boundary
    semantics are bit-for-bit the historical ones."""
    from ..session import effective_parallelism

    dedup = info_b is None
    thr_est = threshold - est_margin

    def side(info, pos):
        return info.select(
            F.lit(pos).alias("__pos"),
            "__id",
            "sig",
            "sh",
            F.posexplode("bands").alias("band", "bh"),
        )

    members = side(info_a, 0)
    if not dedup:
        members = members.unionByName(side(info_b, 1))
    spark = info_a.sparkSession
    n_parts = 2 * effective_parallelism(spark)
    members = members.repartition(
        n_parts, F.col("band"), F.col("bh")
    ).sortWithinPartitions("band", "bh")

    id_type_a = dict(info_a.dtypes)["__id"]
    id_type_b = id_type_a if dedup else dict(info_b.dtypes)["__id"]
    schema = f"idx_a {id_type_a}, idx_b {id_type_b}, jaccard double"

    def verify(batches):
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        triu_cache: dict = {}

        def triu(n):
            if n <= 512:
                c = triu_cache.get(n)
                if c is None:
                    c = np.triu_indices(n, k=1)
                    triu_cache[n] = c
                return c
            return np.triu_indices(n, k=1)

        def score_pairs(ids, pi, pj, pband, S, BH, out):
            """first-band gate + est-prefilter + exact jaccard for
            position pairs (pi, pj) — fully batched across buckets, no
            per-bucket numpy."""
            if BH is not None and len(pi):
                # emit-from-first-matching-band: a pair co-bucketed in
                # several bands is produced ONLY by its lowest matching
                # band (band hashes recomputed from the signatures), so
                # every pair is verified and emitted exactly once
                # globally — no output dedup shuffle needed
                dup = np.zeros(len(pi), dtype=bool)
                for bp in range(bands - 1):
                    m = pband > bp
                    if m.any():
                        dup |= m & (BH[pi, bp] == BH[pj, bp])
                keep0 = ~dup
                pi, pj, pband = pi[keep0], pj[keep0], pband[keep0]
                if pi.size == 0:
                    return
            # estimate: equal-component count — gather whole signature
            # ROWS per side (contiguous 512 B reads), one vectorized
            # matrix compare
            keep = np.empty(len(pi), dtype=bool)
            for c0 in range(0, len(pi), 1 << 18):  # bound gather buffers
                c1 = min(len(pi), c0 + (1 << 18))
                eq = (S[pi[c0:c1]] == S[pj[c0:c1]]).sum(
                    axis=1, dtype=np.int16
                )
                keep[c0:c1] = (
                    eq.astype(np.float64) / float(n_perm)
                ) >= thr_est
            pi, pj = pi[keep], pj[keep]
            if pi.size == 0:
                return
            ia, ib = ids[pi], ids[pj]
            if dedup:
                # candidate orientation is BY VALUE (idx_a < idx_b),
                # matching the join path's filter
                swap = ia > ib
                ia, ib = np.where(swap, ib, ia), np.where(swap, ia, ib)
                pi, pj = np.where(swap, pj, pi), np.where(swap, pi, pj)
            # padded row-sorted shingle matrix, built once per frame
            SH, lens = out["sh_matrix"]
            la, lb = lens[pi], lens[pj]
            jac = np.empty(len(pi), dtype=np.float64)
            # size-class segments bound the L² broadcast by the class
            # width, not the frame-wide maximum document; pair-count
            # chunks inside a class bound the boolean cube's memory
            width = np.maximum(la, lb)
            order = np.argsort(width, kind="stable")
            bounds = np.searchsorted(
                width[order], [2**k + 1 for k in range(3, 32)]
            )
            seg_starts = np.concatenate([[0], bounds])
            seg_ends = np.concatenate([bounds, [len(order)]])
            for s, e in zip(seg_starts, seg_ends):
                if s == e:
                    continue
                L = int(width[order[e - 1]])
                chunk = max(1, (32 << 20) // max(L * L, 1))
                for cs in range(int(s), int(e), chunk):
                    ce = min(int(e), cs + chunk)
                    sel = order[cs:ce]
                    A = SH[pi[sel]][:, :L]
                    B = SH[pj[sel]][:, :L]
                    cols = np.arange(L)[None, :]
                    valid_a = cols < la[sel][:, None]
                    valid_b = cols < lb[sel][:, None]
                    inter = (
                        (
                            (A[:, :, None] == B[:, None, :])
                            & valid_b[:, None, :]
                        ).any(axis=2)
                        & valid_a
                    ).sum(axis=1)
                    jac[sel] = inter / (
                        la[sel] + lb[sel] - inter
                    ).astype(np.float64)
            out["a"].append(ia)
            out["b"].append(ib)
            out["j"].append(jac)

        def emit(tbl, starts):
            n_rows = tbl.num_rows
            if not n_rows or not len(starts):
                return
            ends = np.append(starts[1:], n_rows)
            pos = tbl.column("__pos").combine_chunks().to_numpy()
            band_arr = tbl.column("band").combine_chunks().to_numpy()
            # flat-buffer access: list<long> columns decode to ONE
            # values array + lengths — no per-row Python objects (the
            # pandas form built millions of tiny ndarrays per frame)
            sig_col = tbl.column("sig").combine_chunks()
            S = (
                sig_col.flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.int64, copy=False)
                .reshape(n_rows, n_perm)
            )
            sh_col = tbl.column("sh").combine_chunks()
            flat_sh = (
                sh_col.flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.int64, copy=False)
            )
            lens = pa.compute.list_value_length(sh_col).to_numpy().astype(
                np.int64
            )
            ids = tbl.column("__id").combine_chunks().to_numpy(
                zero_copy_only=False
            )
            # pad + row-sort the shingle sets once per frame (elements
            # are distinct per row; the pad sentinel never matches a
            # real element because every A-position is masked by its
            # own row length)
            Lmax = max(1, int(lens.max()) if len(lens) else 1)
            SH = np.full((n_rows, Lmax), np.iinfo(np.int64).max, np.int64)
            row_of = np.repeat(np.arange(n_rows), lens)
            col_of = (
                np.arange(int(lens.sum())) - np.repeat(
                    np.concatenate([[0], np.cumsum(lens)[:-1]]), lens
                )
            )
            if len(row_of):
                SH[row_of, col_of] = flat_sh
            SH.sort(axis=1)
            # recomputed band hashes power the first-band gate (they
            # are a pure function of the signature, so transport stays
            # payload-minimal)
            BH = (
                _band_hashes(S.view(np.uint64), bands) if bands > 1 else None
            )
            out = {"a": [], "b": [], "j": [], "sh_matrix": (SH, lens)}
            acc_i, acc_j, acc_b, acc = [], [], [], 0
            for s, e in zip(starts, ends):
                n = int(e - s)
                if n < 2:
                    continue
                if dedup:
                    ti, tj = triu(n)
                    gi, gj = ti + s, tj + s
                else:
                    low = s + np.flatnonzero(pos[s:e] == 0)
                    high = s + np.flatnonzero(pos[s:e] == 1)
                    if low.size == 0 or high.size == 0:
                        continue
                    gi = np.repeat(low, len(high))
                    gj = np.tile(high, len(low))
                acc_i.append(gi)
                acc_j.append(gj)
                acc_b.append(np.full(gi.size, band_arr[s], dtype=np.int32))
                acc += gi.size
                if acc >= 2_000_000:
                    score_pairs(
                        ids, np.concatenate(acc_i), np.concatenate(acc_j),
                        np.concatenate(acc_b), S, BH, out,
                    )
                    acc_i, acc_j, acc_b, acc = [], [], [], 0
            if acc:
                score_pairs(
                    ids, np.concatenate(acc_i), np.concatenate(acc_j),
                    np.concatenate(acc_b), S, BH, out,
                )
            if out["a"]:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.concatenate(out["a"])),
                        pa.array(np.concatenate(out["b"])),
                        pa.array(np.concatenate(out["j"]), type=pa.float64()),
                    ],
                    names=["idx_a", "idx_b", "jaccard"],
                )

        def group_starts(tbl):
            b = tbl.column("band").combine_chunks().to_numpy()
            h = tbl.column("bh").combine_chunks().to_numpy()
            same = np.ones(tbl.num_rows, dtype=bool)
            same[1:] = (b[1:] == b[:-1]) & (h[1:] == h[:-1])
            same[0] = False
            return np.flatnonzero(~same)

        carry = None
        for rb in batches:
            tbl = pa.Table.from_batches([rb])
            if carry is not None:
                tbl = pa.concat_tables([carry, tbl])
                carry = None
            if not tbl.num_rows:
                continue
            tbl = tbl.combine_chunks()
            starts = group_starts(tbl)
            last = int(starts[-1])
            carry = tbl.slice(last)
            yield from emit(tbl.slice(0, last), starts[:-1])
        if carry is not None and carry.num_rows:
            carry = carry.combine_chunks()
            yield from emit(carry, group_starts(carry))

    raw = members.mapInArrow(verify, schema=schema)
    # no dropDuplicates: the first-band gate guarantees one emission
    # per pair; rounding + the threshold compare stay JVM-side so the
    # boundary semantics are bit-for-bit the join path's
    return (
        raw.withColumn("jaccard", F.round("jaccard", 6))
        .where(F.col("jaccard") >= threshold)
        .select("idx_a", "idx_b", "jaccard")
    )


def _minhash_info(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    n_perm: int,
    bands: int,
    checkpoint_dir: str | None,
    hash_fn: str,
    stage_tag: str = "",
) -> DataFrame:
    """One materialized per-doc frame carrying everything downstream
    needs: shingle-hash set (exact verify), signature (estimate
    prefilter) and band hashes (candidate generation).

    r6: the signature+bands stage is a ``mapInArrow`` kernel working
    off the flat list buffer — the pandas-UDF form materialized one
    Python ndarray per row (2M objects at sf1) and padded the MinHash
    matrix with a per-row Python loop; here padding is one vectorized
    scatter per length-sorted sub-batch (same ``_MINHASH_CELL_BUDGET``
    bound, identical masked-min arithmetic, bit-identical output)."""
    base = _ensure_width(df.select(F.col(id_col).alias("__id"), text_col)).where(
        _has_shingles(text_col, n)
    )
    hashed = with_shingle_hashes(base, text_col, n, "sh", hash_fn).select(
        "__id", "sh"
    )
    id_type = dict(hashed.dtypes)["__id"]
    seeds = _splitmix64(np.arange(1, n_perm + 1, dtype=np.uint64))
    if n_perm % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide n_perm ({n_perm}); "
            f"{n_perm % bands} signature components would be unused"
        )

    def sig_bands(batches):
        import pyarrow as pa

        for rb in batches:
            nrows = rb.num_rows
            if nrows == 0:
                continue
            sh_col = rb.column(1)
            flat = (
                sh_col.flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.int64, copy=False)
            )
            lens = pa.compute.list_value_length(sh_col).to_numpy().astype(
                np.int64
            )
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            sigs = _minhash_matrix_flat(flat, starts, lens, seeds)
            bh = _band_hashes(sigs, bands)
            sig_arr = pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.astype(np.int64).ravel(), type=pa.int64()),
                n_perm,
            ).cast(pa.list_(pa.int64()))
            bh_arr = pa.FixedSizeListArray.from_arrays(
                pa.array(bh.ravel(), type=pa.int64()), bands
            ).cast(pa.list_(pa.int64()))
            yield pa.RecordBatch.from_arrays(
                [rb.column(0), sh_col, sig_arr, bh_arr],
                names=["__id", "sh", "sig", "bands"],
            )

    info = hashed.mapInArrow(
        sig_bands,
        schema=(
            f"__id {id_type}, sh array<bigint>, "
            "sig array<bigint>, bands array<bigint>"
        ),
    )
    if checkpoint_dir:
        from ..checkpointing import StageManifest

        # the stage key encodes every parameter that shapes the cached
        # frame — a rerun with different n/n_perm/bands OR different
        # source columns must MISS, not silently reuse incompatible
        # signatures (a text_col='title' cache must not serve a
        # text_col='body' run)
        import re as _re

        cols = _re.sub(r"\W+", "_", f"{id_col}__{text_col}")
        # non-default hash_fn is part of the cache identity; the
        # default keeps its historical key so existing caches still
        # hit. stage_tag separates the two sides of match mode (same
        # params + col names must not share one cache).
        hkey = "" if hash_fn == "xxhash64" else f"_h{hash_fn}"
        info = StageManifest(checkpoint_dir).materialize(
            f"minhash_info_n{n}_p{n_perm}_b{bands}_c{cols}{hkey}{stage_tag}",
            info,
            df.sparkSession,
        )
    else:
        info = info.localCheckpoint(storageLevel=_ckpt_level_d())
    return info


def _minhash_verify(
    cand: DataFrame,
    info_a: DataFrame,
    info_b: DataFrame,
    n_perm: int,
    threshold: float,
    est_margin: float,
) -> DataFrame:
    """Signature-estimate prefilter (n_perm long comparisons/pair) and
    exact hashed-shingle verification in ONE pass: two joins total,
    and Catalyst evaluates the cheap estimate filter below the
    set-intersection projection, so array_intersect only runs on
    estimate survivors."""
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / float(n_perm)
    )
    verified = (
        cand.join(
            info_a.select(
                F.col("__id").alias("idx_a"),
                F.col("sig").alias("sig_a"),
                F.col("sh").alias("sh_a"),
            ),
            on="idx_a",
        )
        .join(
            info_b.select(
                F.col("__id").alias("idx_b"),
                F.col("sig").alias("sig_b"),
                F.col("sh").alias("sh_b"),
            ),
            on="idx_b",
        )
        .where(est >= threshold - est_margin)
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
    )
    return verified.where(F.col("jaccard") >= threshold).select(
        "idx_a", "idx_b", "jaccard"
    )


def minhash_lsh_match(
    df_a: DataFrame,
    df_b: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_perm: int = 64,
    bands: int | None = None,
    threshold: float = 0.7,
    est_margin: float = 0.12,
    checkpoint_dir: str | None = None,
    band_fn_weight: float = 0.5,
    hash_fn: str = "xxhash64",
    side_tags: tuple[str, str] = ("mA", "mB"),
) -> DataFrame:
    """Cross-corpus MinHash-LSH near-duplicate join: ``(idx_a, idx_b,
    jaccard)`` pairs with ``idx_a`` from ``df_a`` and ``idx_b`` from
    ``df_b`` — the two-table analogue of :func:`minhash_lsh_pairs`
    (same shingling, signatures, banding, estimate prefilter and exact
    verification; identical parameter semantics).

    This is the document-level fuzzy-decontamination / crawl-overlap
    primitive a training-data pipeline runs between every new crawl
    and the existing training set: neither side is self-joined, and a
    pair appears regardless of id ordering (ids may even collide
    across tables — they name rows of different corpora).

    Scale story: both sides reduce to banded bucket keys before the
    only wide join; the join is band-local and bucket-local exactly as
    in self mode. With ``checkpoint_dir``, each side's signature frame
    is a separate parquet stage keyed by ``side_tags`` — so the static
    training-corpus side pre-computes once and every later run re-joins
    it for free. Stage identity is (params, column names, tag), NOT
    data content: a side whose DATA changes between runs (the new
    crawl) MUST get a fresh tag, e.g. ``side_tags=("crawl_2026_08_19",
    "corpus_v3")`` — reusing a tag against changed input silently
    replays the cached signatures (the StageManifest contract; same as
    re-running any resumable stage on edited input).
    """
    import re as _re

    _check_hash_fn(hash_fn)
    tag_a, tag_b = (_re.sub(r"\W+", "_", str(t)) for t in side_tags)
    if not tag_a or not tag_b or tag_a == tag_b:
        raise ValueError(
            f"side_tags must be two distinct non-empty labels, got {side_tags!r}"
        )
    bands = _resolve_bands(n_perm, threshold, bands, band_fn_weight)
    info_a = _minhash_info(
        df_a, id_col, text_col, n, n_perm, bands, checkpoint_dir, hash_fn,
        f"_{tag_a}",
    )
    info_b = _minhash_info(
        df_b, id_col, text_col, n, n_perm, bands, checkpoint_dir, hash_fn,
        f"_{tag_b}",
    )
    return _bucket_grouped_verified(
        info_a, info_b, n_perm, bands, threshold, est_margin
    )


def simhash(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 2,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, simhash long): 64-bit sign-sum fingerprint over shingle
    hashes — 64 conditional-sum aggregates, all map-side combinable."""
    sh = with_shingle_hashes(
        _ensure_width(df.select(F.col(id_col).alias("__id"), text_col)),
        text_col,
        n,
        "__sh",
        hash_fn,
    ).select("__id", F.explode("__sh").alias("h"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(64)
    ]
    sums = sh.groupBy("__id").agg(*aggs)
    sim = F.lit(0).cast("long")
    for b in range(64):
        sim = sim.bitwiseOR(
            F.when(F.col(f"s{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sums.select(F.col("__id").alias(id_col), sim.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 2,
    max_hamming: int = 3,
    n_chunks: int | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(idx_a, idx_b, hamming) pairs with simhash Hamming distance <=
    max_hamming. Candidates by chunk equality, verified with
    bit_count(xor).

    RECALL CONTRACT (pigeonhole): a pair at distance d shares at least
    one of the ``n_chunks`` equal-as-possible bit chunks iff
    d < n_chunks — recall is guaranteed only for
    ``max_hamming <= n_chunks - 1``. The default ``n_chunks =
    max_hamming + 1`` is therefore lossless for every legal
    ``max_hamming`` (≤ 63 over a 64-bit hash); pass a smaller
    ``n_chunks`` to trade recall for cheaper candidate generation
    (each chunk carries 64/n_chunks bits, so more chunks ⇒
    exponentially bigger buckets: at corpus scale keep max_hamming
    small — Manku et al. (WWW 2007) use k=3 over 64 bits)."""
    n_chunks = _check_simhash_params(max_hamming, n_chunks)
    sh = simhash(df, id_col, text_col, n, hash_fn)
    chunks = _simhash_chunks(sh, id_col, n_chunks)
    l = chunks.select(
        F.col("__id").alias("idx_a"), F.col("simhash").alias("sh_a"), "chunk", "cv"
    )
    r = chunks.select(
        F.col("__id").alias("idx_b"), F.col("simhash").alias("sh_b"), "chunk", "cv"
    )
    cand = (
        l.join(r, on=["chunk", "cv"])
        .where(F.col("idx_a") < F.col("idx_b"))
        .select("idx_a", "idx_b", "sh_a", "sh_b")
        .dropDuplicates(["idx_a", "idx_b"])
    )
    return _simhash_verify(cand, max_hamming)


def _check_simhash_params(max_hamming: int, n_chunks: int | None) -> int:
    if not 0 <= max_hamming <= 63:
        raise ValueError("max_hamming must be in [0, 63] for a 64-bit hash")
    if n_chunks is None:
        n_chunks = max_hamming + 1  # lossless by the pigeonhole bound
    if not 1 <= n_chunks <= 64:
        raise ValueError("n_chunks must be in [1, 64]")
    return n_chunks


def _simhash_verify(cand: DataFrame, max_hamming: int) -> DataFrame:
    ham = cand.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    )
    return ham.where(F.col("hamming") <= max_hamming).select(
        "idx_a", "idx_b", "hamming"
    )


def _simhash_chunks(sh: DataFrame, id_col: str, n_chunks: int) -> DataFrame:
    """(__id, simhash, chunk, cv): the fingerprint split into
    ``n_chunks`` equal-as-possible bit chunks (the pigeonhole candidate
    key, shared by pairs and match modes)."""
    base, rem = divmod(64, n_chunks)
    widths = [base + 1] * rem + [base] * (n_chunks - rem)
    offsets = [sum(widths[:i]) for i in range(n_chunks)]
    return sh.select(
        F.col(id_col).alias("__id"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), offsets[c])
                        # width 64 (n_chunks=1, i.e. max_hamming=0):
                        # (1<<64)-1 overflows a JVM long; -1 is the
                        # all-ones mask in two's complement
                        .bitwiseAND(
                            F.lit((1 << widths[c]) - 1 if widths[c] < 64 else -1)
                        )
                        .alias("cv"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("cc"),
    ).select("__id", "simhash", F.col("cc.chunk").alias("chunk"), F.col("cc.cv").alias("cv"))


def simhash_near_match(
    df_a: DataFrame,
    df_b: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 2,
    max_hamming: int = 3,
    n_chunks: int | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Cross-corpus SimHash near-dup JOIN: ``(idx_a, idx_b, hamming)``
    with ``idx_a`` from ``df_a``, ``idx_b`` from ``df_b`` and simhash
    Hamming distance <= ``max_hamming`` — the two-table analogue of
    :func:`simhash_near_pairs` (same fingerprint, same pigeonhole
    chunk candidacy with its recall contract, same bit_count(xor)
    verify), completing the match-mode symmetry next to
    :func:`minhash_lsh_match`.

    Per-document fingerprints are side-independent, so an id present
    in BOTH corpora pairs with itself at hamming 0 (crawl-overlap
    semantics); no ordering predicate is applied — every qualifying
    (a, b) cross pair is returned exactly once.

    Scale shape: each side aggregates its own 64 sign-sums (map-side
    combinable), the only cross-side exchange is the chunk-equality
    join on (chunk, cv) — bucket-sized build rows, never a full cross
    product — followed by the constant-time verify."""
    n_chunks = _check_simhash_params(max_hamming, n_chunks)
    cha = _simhash_chunks(
        simhash(df_a, id_col, text_col, n, hash_fn), id_col, n_chunks
    ).select(
        F.col("__id").alias("idx_a"), F.col("simhash").alias("sh_a"), "chunk", "cv"
    )
    chb = _simhash_chunks(
        simhash(df_b, id_col, text_col, n, hash_fn), id_col, n_chunks
    ).select(
        F.col("__id").alias("idx_b"), F.col("simhash").alias("sh_b"), "chunk", "cv"
    )
    cand = (
        cha.join(chb, on=["chunk", "cv"])
        .select("idx_a", "idx_b", "sh_a", "sh_b")
        .dropDuplicates(["idx_a", "idx_b"])
    )
    return _simhash_verify(cand, max_hamming)


def minhash_dedup_groups(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    n_perm: int = 64,
    bands: int | None = None,
    threshold: float = 0.7,
    est_margin: float = 0.12,
    checkpoint_dir: str | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """End-to-end text near-dedup: MinHash-LSH near-dup pairs →
    connected components over the near-dup graph → one canonical
    representative (minimum id) per duplicate group. The text-side
    sibling of ``simsearch.semantic_dedup``.

    Returns ``(id_col, group_id, keep)``; filter ``keep`` for the
    deduplicated corpus. Pair recall follows the banding S-curve of
    ``minhash_lsh_pairs`` (threshold-matched by default); precision is
    exact Jaccard up to 64-bit hash collisions. Transitivity caveat is
    inherent to graph dedup: chains of pairwise near-dups merge into
    one group even when the endpoints are < threshold similar.
    """
    from ..clustering import groups_from_pairs

    pairs = minhash_lsh_pairs(
        df, id_col, text_col, n=n, n_perm=n_perm, bands=bands,
        threshold=threshold, est_margin=est_margin,
        checkpoint_dir=checkpoint_dir, hash_fn=hash_fn,
    )
    return groups_from_pairs(df, id_col, pairs)


def keep_best_in_groups(
    groups: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality_score",
) -> DataFrame:
    """Quality-aware keeper selection: re-derive ``keep`` over a
    ``(id_col, group_id)`` membership table (the shape
    ``clustering.groups_from_pairs`` / ``minhash_dedup_groups`` emit)
    so each duplicate group keeps its HIGHEST-``score_col`` member
    (ties -> lowest id) instead of the minimum-id canonical — the
    keeper a training-data pipeline actually wants: drop the truncated
    or boilerplate copy, keep the cleanest one.

    ``scores`` maps ``id_col`` to ``score_col`` (e.g.
    ``text.with_quality``); members missing from ``scores`` or with a
    NULL score never win unless the whole group lacks scores (then the
    lowest id wins). ``id_col`` must be numeric (the tie-break negates
    it).

    Scale: one map-side-combinable ``max_by`` aggregate over the skinny
    (group_id, id, score) projection — no window sort, no shuffle of
    document payloads; the keeper table is one row per group and joins
    back on ``group_id``.
    """
    mem = (
        groups.select("group_id", id_col)
        .join(
            scores.select(F.col(id_col), F.col(score_col).alias("__s")),
            on=id_col,
            how="left",
        )
        # NaN sorts ABOVE +inf in Spark's ordering, so an unguarded NaN
        # score would always win max_by; fold NaN to NULL (nanvl) and
        # NULL to -inf so both mean "never wins"
        .withColumn(
            "__s",
            F.coalesce(
                F.nanvl(F.col("__s").cast("double"), F.lit(None).cast("double")),
                F.lit(float("-inf")),
            ),
        )
    )
    keepers = mem.groupBy("group_id").agg(
        F.max_by(F.col(id_col), F.struct(F.col("__s"), -F.col(id_col))).alias(
            "__keeper"
        )
    )
    return (
        groups.select(id_col, "group_id")
        .join(keepers, on="group_id")
        .select(
            F.col(id_col),
            F.col("group_id"),
            (F.col(id_col) == F.col("__keeper")).alias("keep"),
        )
    )
