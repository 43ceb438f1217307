"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — exact brute-force top-k: broadcast the (small)
  query set against the corpus; the dot product is a JVM
  ``aggregate(zip_with(...))`` fold — no Python, no shuffle except the
  final per-query top-k window.
* ``lsh_topk`` — random-hyperplane LSH bucketing (sign-bit codes from
  seeded deterministic hyperplanes): candidates share the bucket code;
  at scale this turns the N×Q scan into a bucket equi-join. Recall is
  measured against brute force in tests.
* ``ivf_topk`` — inverted-file (IVF) ANN: a deterministic mini-k-means
  coarse quantizer trained on a driver-side sample; corpus rows are
  assigned to their nearest centroid (one Arrow matmul UDF), queries
  probe their ``nprobe`` nearest cells, candidates come from a cell
  equi-join. The standard recall lever is ``nprobe``; the bucket join
  replaces the N×Q scan exactly like ``lsh_topk``.
* ``embedding_near_dup_pairs`` — cosine near-duplicate pairs within a
  partitioning column (e.g. label or a coarse LSH bucket).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "cosine",
    "cosine_topk",
    "lsh_topk",
    "ivf_topk",
    "embedding_near_dup_pairs",
]


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns (double math)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return dot / (na * nb)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    margin: int = 8,
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, cos, rank). Excludes
    self-matches.

    Scale shape: the (small, broadcast) query matrix hits each corpus
    partition as one BLAS matmul inside ``mapInPandas``; each partition
    emits only its local top-(k+margin) per query (combiner pattern),
    so the shuffle is O(partitions × queries × k), never the full
    score matrix. The final window ranks the union exactly (rounded
    cos DESC, neighbor_id ASC); ``margin`` absorbs round-induced ties
    at the local cut."""
    import pandas as pd

    spark = corpus.sparkSession
    qrows = queries.select(id_col, vec_col).collect()
    if not qrows:
        return corpus.sparkSession.createDataFrame(
            [], f"query_id long, neighbor_id long, cos double, rank int"
        )
    qids = [r[0] for r in qrows]
    Q = np.asarray([list(r[1]) for r in qrows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
    bc = spark.sparkContext.broadcast((qids, Qn))
    take = k + margin
    id_type = dict(corpus.dtypes)[id_col]

    def part(batches):
        bqids, bQn = bc.value
        nq = len(bqids)
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            C = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                Cn = C / np.maximum(
                    np.linalg.norm(C, axis=1, keepdims=True), 1e-300
                )
                S = Cn @ bQn.T  # batch × nq
            out_q, out_n, out_c = [], [], []
            m = min(take, S.shape[0])
            for j in range(nq):
                s = S[:, j]
                if m < S.shape[0]:
                    cut = np.argpartition(-s, m - 1)[:m]
                else:
                    cut = np.arange(S.shape[0])
                for i in cut:
                    if ids[i] == bqids[j]:
                        continue
                    out_q.append(bqids[j])
                    out_n.append(ids[i])
                    out_c.append(s[i])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos": out_c}
            )

    cand = corpus.mapInPandas(
        part, schema=f"query_id {id_type}, neighbor_id {id_type}, cos double"
    )
    cand = cand.withColumn("cos", F.round("cos", 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def _code_udf(planes: np.ndarray):
    """Sign-bit LSH code as a long: ONE Arrow-batched matmul against
    the plane matrix, sign bits packed with a dot against powers of
    two — replaces the former per-plane ``aggregate(zip_with(...))``
    JVM folds, which scale linearly with n_planes (measured at 200k ×
    64-dim: 8 planes HOF 2.0s ≈ UDF; 16/24 planes HOF 8.5/7.7s vs UDF
    0.83s — the matmul is transfer-dominated and flat in n_planes)."""
    P = planes.T.copy()  # dim × n_planes
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64)).astype(np.float64)

    @pandas_udf("long")
    def code(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        V = np.asarray(vecs.tolist(), dtype=np.float64)
        bits = (V @ P) > 0
        return pd.Series((bits @ weights).astype(np.int64))

    return code


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: exact cosine within the query's LSH bucket(s).
    The bucket equi-join replaces the full N×Q scan — the scale path.
    ``multiprobe`` also probes every 1-bit-flip bucket of the query's
    code (n_planes+1 probes), the standard recall lever: the query
    side (small) is exploded, the corpus is still touched via an
    equi-join."""
    dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    code = _code_udf(planes)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        code(F.col(vec_col)).alias("__code"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        code(F.col(vec_col)).alias("__code"),
    )
    if multiprobe:
        probes = F.array(
            F.col("__code"),
            *[
                F.col("__code").bitwiseXOR(F.shiftleft(F.lit(1).cast("long"), i))
                for i in range(n_planes)
            ],
        )
        q = q.select(
            "query_id", "__qv", F.explode(probes).alias("__code")
        )
    scored = (
        c.join(q, on="__code")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cos", F.round(cosine(F.col("__qv"), F.col("__cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _train_centroids(
    corpus: DataFrame,
    vec_col: str,
    n_cells: int,
    sample_size: int,
    iters: int,
    seed: int,
) -> np.ndarray:
    """Deterministic mini-k-means (Lloyd on a fixed-seed sample) over
    L2-normalized vectors — the IVF coarse quantizer. The sample is a
    bounded collect (documented contract, like cosine_topk's query
    set); training cost is O(sample × cells × iters) on the driver,
    independent of corpus size."""
    rows = corpus.select(vec_col).limit(sample_size).collect()
    X = np.asarray([list(r[0]) for r in rows], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
    rng = np.random.RandomState(seed)
    n_cells = min(n_cells, len(X))
    C = X[rng.choice(len(X), size=n_cells, replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)  # cosine on unit vectors
        for j in range(n_cells):
            members = X[assign == j]
            if len(members):
                m = members.mean(axis=0)
                C[j] = m / max(np.linalg.norm(m), 1e-300)
    return C


def _cell_udf(C: np.ndarray, nprobe: int):
    """(vec) -> array<int> of the nprobe nearest centroid ids — one
    Arrow matmul per batch."""
    Ct = C.T.copy()

    @pandas_udf("array<int>")
    def cells(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        V = np.asarray(vecs.tolist(), dtype=np.float64)
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
        S = V @ Ct
        k = min(nprobe, S.shape[1])
        top = np.argpartition(-S, k - 1, axis=1)[:, :k]
        return pd.Series([row.astype(np.int32).tolist() for row in top])

    return cells


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 64,
    nprobe: int = 4,
    sample_size: int = 20_000,
    train_iters: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via an inverted file: exact cosine within the
    ``nprobe`` nearest coarse-quantizer cells of each query. Corpus
    rows live in exactly ONE cell; the cell equi-join replaces the
    full N×Q scan. Recall rises with nprobe (nprobe = n_cells ⇒
    exact). Returns (query_id, neighbor_id, cos, rank)."""
    C = _train_centroids(corpus, vec_col, n_cells, sample_size, train_iters, seed)
    corpus_cell = _cell_udf(C, 1)
    query_cells = _cell_udf(C, nprobe)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        corpus_cell(F.col(vec_col))[0].alias("__cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(query_cells(F.col(vec_col))).alias("__cell"),
    )
    scored = (
        c.join(q, on="__cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("__qv"), F.col("__cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """(idx_a, idx_b, cos) pairs with cosine >= threshold. With
    ``block_col`` the self-join is per-block (e.g. label or an LSH
    bucket); without, it is a full O(N²) scan — small corpora only."""
    a = df.select(
        F.col(id_col).alias("idx_a"),
        F.col(vec_col).alias("__va"),
        *( [F.col(block_col)] if block_col else [] ),
    )
    b = df.select(
        F.col(id_col).alias("idx_b"),
        F.col(vec_col).alias("__vb"),
        *( [F.col(block_col)] if block_col else [] ),
    )
    joined = a.join(b, on=block_col) if block_col else a.crossJoin(b)
    out = (
        joined.where(F.col("idx_a") < F.col("idx_b"))
        .withColumn("cos", F.round(cosine(F.col("__va"), F.col("__vb")), 6))
        .where(F.col("cos") >= threshold)
    )
    return out.select("idx_a", "idx_b", "cos")
