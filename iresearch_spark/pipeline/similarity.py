"""Similarity search over embedding columns (array<float>).

- ``cosine_pairs`` / ``cosine_topk``: exact brute-force baselines as pure
  DataFrame ops (`zip_with` dot product in float64, broadcast query side) —
  SQL-oracle comparable.
- ``lsh_ann_topk``: the scale path — random-hyperplane LSH bucketing so each
  query only scans its probe buckets (candidates ∝ n/2^bits per probe), then
  exact re-rank within candidates. At 100 TB the bucket join replaces the
  O(n·q) crossJoin; recall is tested against the brute-force baseline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_pairs(
    emb: DataFrame, query_pred, threshold: float = 0.25
) -> DataFrame:
    """All (query, candidate) pairs with cosine >= threshold; query side =
    rows matching ``query_pred`` (broadcast)."""
    q = emb.filter(query_pred).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    cos = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", F.round(cos, 4).alias("cosine"))
        .filter(F.round(cos, 4) >= threshold)
    )


def cosine_topk(emb: DataFrame, query_pred, k: int = 10) -> DataFrame:
    """Exact top-k by (rounded cosine desc, cid) per query vector."""
    q = emb.filter(query_pred).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    cos = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", F.round(cos, 4).alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "cid", "cosine", "rnk")
    )


def _l2_normalized(emb: DataFrame) -> DataFrame:
    """vec_id + unit-norm embedding: cosine NN == L2 NN on the unit sphere,
    which is what the IVF quantizer must be trained on."""
    n = _norm(F.col("embedding"))
    return emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x.cast("double") / n
        ).alias("embedding"),
    )


def _unit_rows(series) -> np.ndarray:
    """Stack an Arrow array-column batch into a unit-normalized (n, dim)
    float64 matrix."""
    X = np.stack(series.to_numpy()).astype(np.float64)
    n = np.linalg.norm(X, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return X / n


def train_ivf_centroids(
    emb: DataFrame, nlist: int = 16, iters: int = 3, dim: int = 64
) -> np.ndarray:
    """Distributed Lloyd iterations for the IVF coarse quantizer over
    UNIT-NORM vectors. Init = the nlist vectors with the lowest
    xxhash64(vec_id) (parallelism-invariant). Each iteration is ONE
    mapInPandas pass: every Arrow batch assigns its vectors to cells with a
    numpy matmul against the broadcast centroid matrix and emits per-cell
    partial (count, sum) rows — nlist x (dim+1) doubles per batch — which
    the driver reduces. No nlist x dim literal expression trees, so nlist
    can be 4k+ (the Catalyst-literal variant stops compiling around there)."""
    seed_rows = (
        _l2_normalized(emb)
        .select("vec_id", "embedding", F.xxhash64("vec_id").alias("h"))
        .orderBy("h", "vec_id")
        .limit(nlist)
        .collect()
    )
    cents = np.array([list(r["embedding"]) for r in seed_rows], dtype=np.float64)
    sc = emb.sparkSession.sparkContext
    # every Lloyd iteration scans the vectors — persist across iterations
    src = emb.select("embedding").persist()
    for _ in range(iters):
        bc = sc.broadcast(cents)

        def partials(batches):
            C = bc.value
            c_sq = (C * C).sum(axis=1)
            for pdf in batches:
                if pdf.empty:
                    continue
                X = _unit_rows(pdf["embedding"])
                cell = np.argmin(-2.0 * (X @ C.T) + c_sq[None, :], axis=1)
                sums = np.zeros((C.shape[0], X.shape[1]), dtype=np.float64)
                np.add.at(sums, cell, X)
                counts = np.bincount(cell, minlength=C.shape[0])
                yield pd.DataFrame(
                    {
                        "cell": np.arange(C.shape[0], dtype=np.int32),
                        "cnt": counts.astype(np.int64),
                        "sums": list(sums),
                    }
                )

        rows = src.mapInPandas(
            partials, schema="cell int, cnt long, sums array<double>"
        ).collect()
        tot = np.zeros((nlist, cents.shape[1]), dtype=np.float64)
        cnt = np.zeros(nlist, dtype=np.int64)
        for r in rows:
            tot[r["cell"]] += np.asarray(r["sums"], dtype=np.float64)
            cnt[r["cell"]] += r["cnt"]
        new = cents.copy()
        nz = cnt > 0
        new[nz] = tot[nz] / cnt[nz, None]
        cents = new
        bc.unpersist()
    src.unpersist(blocking=False)
    return cents


def _ivf_udfs(spark_context, cents: np.ndarray, nprobe: int):
    """(cell_of, probes_of) pandas UDFs over a broadcast centroid matrix."""
    bc = spark_context.broadcast(cents)

    @F.pandas_udf("int")
    def cell_of(embedding: pd.Series) -> pd.Series:
        C = bc.value
        if embedding.empty:
            return pd.Series([], dtype="int32")
        X = _unit_rows(embedding)
        d = -2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    @F.pandas_udf("array<int>")
    def probes_of(embedding: pd.Series) -> pd.Series:
        C = bc.value
        if embedding.empty:
            return pd.Series([], dtype=object)
        X = _unit_rows(embedding)
        d = -2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
        order = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype(np.int32)))

    return cell_of, probes_of


def ivf_topk(
    emb: DataFrame, query_pred, k: int = 10, nlist: int = 16, nprobe: int = 4,
    iters: int = 3, dim: int = 64, centroids: "np.ndarray | None" = None,
) -> DataFrame:
    """IVF approximate NN: coarse k-means quantizer partitions the corpus
    into nlist cells; each query scans only its nprobe nearest cells, then
    exact cosine re-ranks candidates. The scale path when the LSH signature
    family fits poorly: candidates ∝ n * nprobe / nlist, and the cell join
    replaces the O(n·q) crossJoin. Cell assignment and probe ordering run
    in Arrow-batched numpy kernels against a broadcast centroid matrix."""
    # train-once-query-many: pass pre-trained ``centroids`` (from
    # train_ivf_centroids) to skip the Lloyd passes per query
    cents = (
        centroids
        if centroids is not None
        else train_ivf_centroids(emb, nlist, iters, dim)
    )
    cell_of, probes_of = _ivf_udfs(
        emb.sparkSession.sparkContext, cents, nprobe
    )
    c = emb.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    ).withColumn("cell", cell_of(F.col("cv")))
    q = (
        emb.filter(query_pred)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
        .withColumn("cell", F.explode(probes_of(F.col("qv"))))
    )
    cos = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    scored = (
        q.join(c, "cell")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", F.round(cos, 4).alias("cosine"))
        .dropDuplicates(["qid", "cid"])
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "cid", "cosine", "rnk")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def lsh_ann_topk(
    emb: DataFrame, query_pred, k: int = 10, bits: int = 8, probes: int = 2,
    dim: int = 64,
) -> DataFrame:
    """Approximate NN: random-hyperplane signature bucketing + exact re-rank.

    Each vector lands in one bucket (its sign signature); each query probes
    its own bucket plus ``probes-1`` single-bit flips (by ascending |margin|,
    deterministic). Join on bucket bounds candidate count; exact cosine +
    row_number picks top-k within candidates.
    """
    probes = min(probes, bits + 1)
    H = _hyperplanes(dim, bits)
    bc = emb.sparkSession.sparkContext.broadcast(H)

    def _margins(embedding: pd.Series) -> np.ndarray:
        X = np.stack(embedding.to_numpy()).astype(np.float64)
        return X @ bc.value.T  # (n, bits) signed margins

    # one matmul per Arrow batch instead of ``bits`` chained Catalyst
    # aggregate-expressions per row (which dominated the scan cost)
    @F.pandas_udf("int")
    def bucket_of(embedding: pd.Series) -> pd.Series:
        if embedding.empty:
            return pd.Series([], dtype="int32")
        M = _margins(embedding)
        w = (1 << np.arange(bits, dtype=np.int64))[None, :]
        return pd.Series(((M >= 0) * w).sum(axis=1).astype(np.int32))

    @F.pandas_udf("array<int>")
    def probe_buckets(embedding: pd.Series) -> pd.Series:
        """Own bucket + ``probes-1`` single-bit flips by ascending |margin|
        (multiprobe LSH: the least-confident bits are the likeliest to
        differ for true neighbours)."""
        if embedding.empty:
            return pd.Series([], dtype=object)
        M = _margins(embedding)
        w = 1 << np.arange(bits, dtype=np.int64)
        own = ((M >= 0) * w[None, :]).sum(axis=1)
        flip_order = np.argsort(np.abs(M), axis=1, kind="stable")
        out = np.empty((M.shape[0], probes), dtype=np.int64)
        out[:, 0] = own
        for j in range(1, probes):
            out[:, j] = own ^ w[flip_order[:, j - 1]]
        return pd.Series(list(out.astype(np.int32)))

    c = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cv"),
        bucket_of(F.col("embedding")).alias("bucket"),
    )
    q = emb.filter(query_pred).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.explode(probe_buckets(F.col("embedding"))).alias("bucket"),
    )
    cos = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    scored = (
        q.join(c, "bucket")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", F.round(cos, 4).alias("cosine"))
        .dropDuplicates(["qid", "cid"])
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "cid", "cosine", "rnk")
    )
