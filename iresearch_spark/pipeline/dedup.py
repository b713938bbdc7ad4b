"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Exact + n-gram Jaccard are pure DataFrame ops with DuckDB SQL oracles.
MinHash/SimHash use vectorized pandas UDF kernels (deterministic seeded hash
families) — their oracle is the exact-Jaccard op (LSH candidates must be a
superset of high-Jaccard pairs at matching thresholds; tested in pytest),
and the driver records a rows-only check.

Scale design: exact dedup is a hash aggregate (one shuffle on the digest);
n-gram pairing joins on (bucket, gram) so hot grams are bounded by the
candidate-bucket key; MinHash LSH shuffles on (band, band_hash) — the
classic scalable path, no O(n^2) anywhere.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iresearch_spark.analysis import CODE_TOKEN_PATTERN

_MERSENNE = np.uint64((1 << 61) - 1)


def _tokens(col: str = "text"):
    return F.regexp_extract_all(
        F.lower(F.coalesce(F.col(col), F.lit(""))), F.lit(CODE_TOKEN_PATTERN), F.lit(0)
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by content digest; keeps the min doc_id."""
    return (
        docs.select("doc_id", F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("digest"))
        .groupBy("digest")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


def _trigrams():
    t = _tokens()
    n = F.size(t)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(2), F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", F.element_at(t, i), F.element_at(t, i + 1), F.element_at(t, i + 2)
            ),
        )
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.15) -> DataFrame:
    """Token-trigram Jaccard similarity for candidate pairs within the same
    ``source`` bucket (the deterministic candidate rule, SQL-expressible).
    Returns pairs with jaccard >= threshold."""
    g = docs.select(
        "doc_id", F.col("source").alias("bucket"), _trigrams().alias("grams")
    ).withColumn("n_grams", F.size("grams"))
    flat = g.select("doc_id", "bucket", "n_grams", F.explode("grams").alias("gram"))
    a = flat.alias("a")
    b = flat.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_grams").alias("na"),
            F.col("b.n_grams").alias("nb"),
        )
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")).cast("double")
    return inter.select(
        "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
    ).filter(F.round(jac, 4) >= threshold)


def _hash_tokens_u64(tokens: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit token hash (FNV-1a over utf-8), vectorized enough:
    unique-ify first so the Python loop runs over the vocabulary only."""
    uniq, inv = np.unique(tokens, return_inverse=True)
    out = np.empty(uniq.size, dtype=np.uint64)
    for i, s in enumerate(uniq):
        h = np.uint64(0xCBF29CE484222325)
        for byt in s.encode():
            h = np.uint64((int(h) ^ byt) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out[inv]


def minhash_lsh_pairs(
    docs: DataFrame, num_hashes: int = 64, bands: int = 16, threshold: float = 0.15
) -> DataFrame:
    """MinHash signatures + banded LSH candidate pairs with estimated Jaccard.

    shingle(token set) -> minhash (num_hashes seeded affine hashes over a
    Mersenne prime) -> band -> bucket join; estimate = fraction of agreeing
    hash slots. Returns (doc_a, doc_b, est_jaccard >= threshold).
    """
    rows = bands
    assert num_hashes % bands == 0
    rng = np.random.default_rng(1234)
    A = rng.integers(1, int(_MERSENNE) - 1, size=num_hashes, dtype=np.uint64)
    B = rng.integers(0, int(_MERSENNE) - 1, size=num_hashes, dtype=np.uint64)
    r = num_hashes // bands

    def sigs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        tok_re = re.compile(CODE_TOKEN_PATTERN)
        for pdf in batches:
            ids, band_idx, band_hash, sig_list = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = np.unique(np.array(tok_re.findall((text or "").lower()), dtype=object))
                if toks.size == 0:
                    continue
                h = _hash_tokens_u64(toks)
                # sig[i] = min_j (A[i]*h[j] + B[i] mod p)
                prod = (A[:, None] * h[None, :] + B[:, None]) % _MERSENNE
                sig = prod.min(axis=1)
                for bidx in range(bands):
                    chunk = sig[bidx * r : (bidx + 1) * r]
                    bh = np.uint64(0xCBF29CE484222325)
                    for v in chunk:
                        bh = np.uint64(
                            (int(bh) ^ int(v)) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF
                        )
                    ids.append(doc_id)
                    band_idx.append(bidx)
                    band_hash.append(np.int64(bh >> np.uint64(1)))
                    sig_list.append(sig.astype(np.int64).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "band": pd.Series(band_idx, dtype="int32"),
                    "band_hash": pd.Series(band_hash, dtype="int64"),
                    "sig": sig_list,
                }
            )

    sig_df = docs.select("doc_id", "text").mapInPandas(
        sigs, schema="doc_id long, band int, band_hash long, sig array<long>"
    )
    a = sig_df.alias("a")
    b = sig_df.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: (x == y).cast("int")),
            lambda z: z == 1,
        )
    )
    est = agree / F.lit(float(num_hashes))
    return cand.select(
        "doc_a", "doc_b", F.round(est, 4).alias("est_jaccard")
    ).filter(est >= threshold)


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """64-bit SimHash over tf-weighted token hashes (near-dup fingerprint)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        tok_re = re.compile(CODE_TOKEN_PATTERN)
        bit_idx = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = np.array(tok_re.findall((text or "").lower()), dtype=object)
                if toks.size == 0:
                    ids.append(doc_id)
                    hashes.append(0)
                    continue
                uniq, cnts = np.unique(toks, return_counts=True)
                h = _hash_tokens_u64(uniq)
                bits = ((h[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(
                    np.int64
                )
                acc = ((bits * 2 - 1) * cnts[:, None]).sum(axis=0)
                sh = np.uint64(0)
                for i in range(64):
                    if acc[i] > 0:
                        sh |= np.uint64(1) << np.uint64(i)
                ids.append(doc_id)
                hashes.append(np.int64(sh >> np.uint64(1)))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "simhash": pd.Series(hashes, dtype="int64"),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        kernel, schema="doc_id long, simhash long"
    )
