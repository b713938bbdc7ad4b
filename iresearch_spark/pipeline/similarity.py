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


def _sq_dist(vec, centroid_lit):
    return F.aggregate(
        F.zip_with(
            vec, centroid_lit,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
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


def train_ivf_centroids(
    emb: DataFrame, nlist: int = 16, iters: int = 3, dim: int = 64
) -> np.ndarray:
    """Deterministic distributed Lloyd iterations for the IVF coarse
    quantizer over UNIT-NORM vectors. Init = the nlist vectors with the
    lowest xxhash64(vec_id) (parallelism-invariant); each iteration is one
    groupBy over cell assignments (posexplode -> per-dim mean), all
    DataFrame ops."""
    emb = _l2_normalized(emb)
    seed_rows = (
        emb.select("vec_id", "embedding", F.xxhash64("vec_id").alias("h"))
        .orderBy("h", "vec_id")
        .limit(nlist)
        .collect()
    )
    cents = np.array([list(r["embedding"]) for r in seed_rows], dtype=np.float64)
    for _ in range(iters):
        cent_lits = [
            F.array(*[F.lit(float(v)) for v in row]) for row in cents
        ]
        dists = F.array(*[_sq_dist(F.col("embedding"), c) for c in cent_lits])
        assigned = emb.select(
            (F.array_position(dists, F.array_min(dists)) - 1).alias("cell"),
            F.posexplode("embedding").alias("pos", "x"),
        )
        rows = (
            assigned.groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = cents.copy()
        for r in rows:
            new[int(r["cell"]), int(r["pos"])] = float(r["m"])
        cents = new
    return cents


def ivf_topk(
    emb: DataFrame, query_pred, k: int = 10, nlist: int = 16, nprobe: int = 4,
    iters: int = 3, dim: int = 64,
) -> DataFrame:
    """IVF approximate NN: coarse k-means quantizer partitions the corpus
    into nlist cells; each query scans only its nprobe nearest cells, then
    exact cosine re-ranks candidates. The scale path when the LSH signature
    family fits poorly: candidates ∝ n * nprobe / nlist, and the cell join
    replaces the O(n·q) crossJoin."""
    cents = train_ivf_centroids(emb, nlist, iters, dim)
    cent_lits = [F.array(*[F.lit(float(v)) for v in row]) for row in cents]
    dists = F.array(*[_sq_dist(F.col("embedding"), c) for c in cent_lits])
    norm_cells = _l2_normalized(emb).select(
        "vec_id",
        (F.array_position(dists, F.array_min(dists)) - 1).alias("cell"),
    )
    c = emb.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    ).join(norm_cells.withColumnRenamed("vec_id", "cid"), "cid")
    # query probes its nprobe nearest cells (sorted squared distances)
    idx = F.sequence(F.lit(0), F.lit(nlist - 1))
    order = F.transform(
        F.slice(
            F.array_sort(
                F.zip_with(dists, idx, lambda d_, i: F.struct(
                    d_.alias("d"), i.alias("i")))
            ),
            1, nprobe,
        ),
        lambda s: s["i"],
    )
    probe = _l2_normalized(emb.filter(query_pred)).select(
        "vec_id", F.explode(order).alias("cell")
    )
    q = (
        emb.filter(query_pred)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
        .join(probe.withColumnRenamed("vec_id", "qid"), "qid")
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
    H = _hyperplanes(dim, bits)
    hp = [F.array(*[F.lit(float(v)) for v in row]) for row in H]

    def bucket_of(vec):
        b = F.lit(0)
        for i, plane in enumerate(hp):
            b = b + F.when(_dot(vec, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        return b

    c = emb.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cv"),
        bucket_of(F.col("embedding")).alias("bucket"),
    )
    q0 = emb.filter(query_pred).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        bucket_of(F.col("embedding")).alias("qbucket"),
    )
    # probe buckets: own bucket + single-bit flips 0..probes-2
    probe_list = [F.col("qbucket")] + [
        F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(max(0, probes - 1))
    ]
    q = q0.select("qid", "qv", F.explode(F.array(*probe_list)).alias("bucket"))
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
