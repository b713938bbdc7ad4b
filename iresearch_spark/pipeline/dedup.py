"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Exact + n-gram Jaccard are pure DataFrame ops with DuckDB SQL oracles.
MinHash/SimHash use vectorized pandas UDF kernels (deterministic seeded hash
families); with ``hash_mode="md5"`` the hash family is md5-derived and the
whole pipeline (signatures, band keys, candidate pairs, estimates) has an
exact DuckDB SQL twin — the driver's oracle. The default "sip" mode keeps
the faster SipHash base; its guarantee (LSH candidates are a superset of
high-Jaccard pairs at matching thresholds) is pytest-gated.

Scale design: exact dedup is a hash aggregate (one shuffle on the digest);
n-gram pairing joins on (bucket, gram) so hot grams are bounded by the
candidate-bucket key; MinHash LSH shuffles on (band, band_hash) — the
classic scalable path, no O(n^2) anywhere.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iresearch_spark.analysis import CODE_TOKEN_PATTERN

_MERSENNE = np.uint64((1 << 61) - 1)

# --- md5 hash mode -----------------------------------------------------
# ``hash_mode="md5"`` swaps the SipHash base hash for md5-derived integers
# so the whole MinHash/SimHash pipeline has an exact DuckDB SQL twin
# (DuckDB: ('0x' || substr(md5(s), 1, k))::BIGINT). All md5-mode modular
# arithmetic runs in the 31-bit Mersenne field so every product stays
# < 2^62 — EXACT in numpy uint64, Spark BIGINT and DuckDB BIGINT alike
# (no 2^64 wraparound, which SQL integers cannot reproduce).
_P31 = np.uint64(2147483647)  # 2^31 - 1
_BAND_FOLD_M = 1000003
_SHINGLE_SEP = "\x1f"  # chr(31) on the SQL side


def md5_minhash_constants(num_hashes: int = 64):
    """Seeded affine coefficients for the md5 minhash mode; the driver's
    oracle SQL embeds these same values as a literal table."""
    rng = np.random.default_rng(20260817)
    A = rng.integers(1, int(_P31), size=num_hashes, dtype=np.uint64)
    B = rng.integers(0, int(_P31), size=num_hashes, dtype=np.uint64)
    return A, B


def band_fold_coeffs(r: int) -> list[int]:
    """Positional coefficients M^(r-1-j) mod p for the md5-mode band fold:
    band_key = sum_j ((slot_j * coeff_j) mod p) mod p."""
    return [pow(_BAND_FOLD_M, r - 1 - j, int(_P31)) for j in range(r)]


def _hash_strings_md5(strs: np.ndarray, hex_chars: int) -> np.ndarray:
    """First ``hex_chars`` hex digits of md5, as uint64 — memoized over the
    batch's distinct strings (vocabulary << token stream)."""
    codes, uniq = pd.factorize(pd.Series(strs, dtype=object), sort=False)
    vals = np.fromiter(
        (
            int(hashlib.md5(u.encode("utf-8")).hexdigest()[:hex_chars], 16)
            for u in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    return vals[codes]


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


def _gram_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, bucket, grams array, n_grams) — one row per doc.

    The token array is materialized as a NAMED column in its own projection
    before the trigram transform references it: inlining the regexp
    expression next to ``transform`` makes Catalyst re-evaluate the tokenize
    per produced element (measured ~10x on this exact shape — same trap the
    index build hit, see build.py)."""
    toks = docs.select(
        "doc_id", F.col("source").alias("bucket"), _tokens().alias("toks")
    )
    n = F.size("toks")
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(2), F.lit(0)))
    grams = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                F.element_at("toks", i),
                F.element_at("toks", i + 1),
                F.element_at("toks", i + 2),
            ),
        )
    )
    return toks.select("doc_id", "bucket", grams.alias("grams")).withColumn(
        "n_grams", F.size("grams")
    )


def _ngram_candidates(flat: DataFrame, threshold: float) -> DataFrame:
    """PREFIX-FILTERED candidate pairs (All-Pairs/PPJoin prefix trick):
    order grams globally by (df asc, gram) and join only each doc's first
    ``n - ceil(t*n) + 1`` rarest grams. Complete for Jaccard >= t
    (a qualifying pair shares a prefix gram under any fixed global order),
    and a universal boilerplate gram — df == corpus size — falls OUT of
    every non-trivial prefix, killing the O(df^2) hot-gram join blowup
    that the naive gram join suffers at scale. A PPJoin length filter
    (Jaccard >= t forces t·|B| <= |A| for |A| <= |B|) prunes cross-size
    pairs inside the join condition before any verification."""
    from pyspark.sql import Window

    # the global order only has to be FIXED, not dense: (df, gram) is a
    # total order, so no global-rank window (which would be one task)
    gram_df = flat.groupBy("gram").agg(F.count("*").alias("gdf"))
    w = Window.partitionBy("doc_id").orderBy(F.asc("gdf"), F.asc("gram"))
    prefix_len = F.col("n_grams") - F.ceil(
        F.lit(float(threshold)) * F.col("n_grams")
    ) + F.lit(1)
    prefix = (
        flat.join(gram_df, "gram")
        .withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= prefix_len)
        .select("doc_id", "bucket", "gram", "n_grams")
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    t = F.lit(float(threshold))
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter: min(na,nb) >= t * max(na,nb)
            & (
                F.least(F.col("a.n_grams"), F.col("b.n_grams"))
                >= t * F.greatest(F.col("a.n_grams"), F.col("b.n_grams"))
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.15) -> DataFrame:
    """Token-trigram Jaccard similarity for candidate pairs within the same
    ``source`` bucket (the deterministic candidate rule, SQL-expressible).
    Returns pairs with jaccard >= threshold. Candidates come from the
    prefix filter (:func:`_ngram_candidates`); the exact intersection is
    then computed only for surviving pairs with one ``array_intersect``
    per pair (no second gram explode/shuffle).

    The tokenized gram table is persisted for the run: it feeds the df
    counts, the prefix rows, and both verify sides — without the cache the
    regexp tokenize + trigram transform lineage re-runs four times. At real
    scale this persist is a parquet staging write."""
    gram_sets = _gram_sets(docs).persist()
    flat = gram_sets.select(
        "doc_id", "bucket", "n_grams", F.explode("grams").alias("gram")
    )
    cand = _ngram_candidates(flat, threshold)
    ga = gram_sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("grams").alias("grams_a"),
        F.col("n_grams").alias("na"),
    )
    gb = gram_sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("grams").alias("grams_b"),
        F.col("n_grams").alias("nb"),
    )
    inter_n = F.size(F.array_intersect("grams_a", "grams_b"))
    jac = inter_n / (F.col("na") + F.col("nb") - inter_n).cast("double")
    # threshold on the UNROUNDED jaccard: the prefix filter guarantees
    # recall only for true jac >= t, so thresholding on round(jac, 4) would
    # admit pairs in [t - 5e-5, t) that candidate generation may have missed
    # (rounding is display-only)
    result = (
        cand.join(ga, "doc_a")
        .join(gb, "doc_b")
        .withColumn("jac_raw", jac)
        .filter(F.col("jac_raw") >= threshold)
        .select("doc_a", "doc_b", F.round(F.col("jac_raw"), 4).alias("jaccard"))
    )
    result = result.localCheckpoint(eager=True)
    gram_sets.unpersist(blocking=False)
    return result


def _hash_tokens_u64(tokens: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit token hash, vectorized (pandas SipHash kernel with
    its fixed default key — stable across sessions and partitions)."""
    return pd.util.hash_array(
        np.asarray(tokens, dtype=object), categorize=False
    ).astype(np.uint64)


def _flat_doc_tokens(
    pdf: pd.DataFrame,
    shingle: int = 1,
    hash_mode: str = "sip",
    md5_hex: int = 16,
):
    """Batch -> (doc_ids, flat hash array, per-doc slice starts).

    One vectorized tokenize over the whole Arrow batch; docs with fewer than
    ``shingle`` tokens are dropped. With ``shingle`` > 1 the hashes are mixed
    k-token shingle hashes (the discriminative unit for near-dup detection —
    single-token sets of same-domain documents overlap almost completely).
    Returns (kept_doc_ids, hashes, starts) where
    ``hashes[starts[i]:starts[i+1]]`` are doc i's hashes.

    ``hash_mode="md5"`` hashes the shingle STRING (tokens joined on chr(31))
    with md5 truncated to ``md5_hex`` hex digits, so the values are
    reproducible in DuckDB SQL; "sip" (default) FNV-mixes per-token SipHash —
    faster, no SQL twin.
    """
    toks = pdf["text"].fillna("").str.lower().str.findall(CODE_TOKEN_PATTERN)
    counts = toks.str.len().to_numpy(np.int64)
    keep = counts >= shingle
    toks, counts = toks[keep], counts[keep]
    doc_ids = pdf["doc_id"].to_numpy(np.int64)[keep]
    if doc_ids.size == 0:
        return doc_ids, np.empty(0, np.uint64), np.zeros(1, np.int64)
    flat = toks.explode().to_numpy(dtype=object)
    if shingle > 1:
        # shingle windows over the flat array; windows crossing doc
        # boundaries are cut off by the shrunken per-doc counts below
        n = flat.size
        if hash_mode == "md5":
            mixed = flat[0 : n - shingle + 1].copy()
            for j in range(1, shingle):
                mixed = mixed + _SHINGLE_SEP
                mixed = mixed + flat[j : n - shingle + 1 + j]
        else:
            th = _hash_tokens_u64(flat)
            mixed = np.zeros(n - shingle + 1, dtype=np.uint64)
            prime = np.uint64(0x100000001B3)
            for j in range(shingle):
                end = n - shingle + 1 + j
                mixed = (mixed ^ th[j:end]) * prime
        counts = counts - (shingle - 1)
        ends = np.cumsum(counts + (shingle - 1))
        starts_orig = ends - (counts + (shingle - 1))
        idx = (
            np.repeat(starts_orig, counts)
            + np.arange(int(counts.sum()), dtype=np.int64)
            - np.repeat(np.concatenate([[0], np.cumsum(counts)])[:-1], counts)
        )
        hashes = (
            _hash_strings_md5(mixed[idx], md5_hex)
            if hash_mode == "md5"
            else mixed[idx]
        )
    else:
        hashes = (
            _hash_strings_md5(flat, md5_hex)
            if hash_mode == "md5"
            else _hash_tokens_u64(flat)
        )
    starts = np.concatenate([[0], np.cumsum(counts)])
    return doc_ids, hashes, starts


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.15,
    shingle: int = 3,
    hash_mode: str = "sip",
    expand: str = "pairs",
    collapse: object = "auto",
) -> DataFrame:
    """MinHash signatures + banded LSH candidate pairs with estimated Jaccard.

    shingle(k consecutive tokens) -> minhash (num_hashes seeded affine hashes
    over a Mersenne prime) -> band -> bucket join; estimate = fraction of
    agreeing hash slots, i.e. estimated Jaccard over shingle sets. Returns
    (doc_a, doc_b, est_jaccard >= threshold).

    Two-level plan (same shape as :func:`simhash_pairs` — dedup corpora are
    full of exact duplicates, so this matters more here than anywhere):

    1. **Collapse identical signatures.** g exact-duplicate docs put g
       identical band hashes in EVERY band; a document-level band join makes
       that O(g^2 * bands) candidates before dedup. Candidates are therefore
       generated over one row per DISTINCT signature (keyed by its
       representative = min doc_id); identical-signature groups never enter
       the band join — they expand directly with est_jaccard = 1.0 (all
       slots agree).
    2. **Banded join + verify over distinct signatures**, then expansion
       back to documents: ``expand="pairs"`` (default) emits every
       qualifying document pair (output-faithful; output itself is O(g^2)
       per duplicate group); ``expand="star"`` is the 10^9-doc shape —
       member->representative edges within a signature group and
       representative->representative across groups, O(docs + sig-pairs)
       edges with the same connected components.

    ``hash_mode="md5"`` runs the identical pipeline in the 31-bit Mersenne
    field over md5 shingle hashes reduced mod 2^31-1 (15 hex digits = 60
    bits of md5, then the modular reduction — full ~31-bit hash space, no
    28-bit birthday collisions, every product < 2^62) — bit-exact
    reproducible in DuckDB SQL (the driver's oracle twin); "sip" is the
    faster default.

    ``collapse`` is a pure plan hint — every mode returns identical pairs:

    - ``"auto"`` (default): one cheap aggregate decides; corpora without
      duplicate signatures skip the group shuffle entirely.
    - ``True``: collapse unconditionally, skipping the detection job — the
      right call when the corpus is known duplicate-heavy (a dedup corpus
      usually is), refunding one job wave per run.
    - ``False``: never collapse (the band join still finds identical
      signatures — they collide in every band — so results are unchanged,
      but candidate generation is O(g^2 * bands) per duplicate group; only
      for corpora known to be duplicate-free).
    """
    assert num_hashes % bands == 0
    if expand not in ("pairs", "star"):
        raise ValueError(f"expand must be 'pairs' or 'star', got {expand!r}")
    if collapse not in ("auto", True, False):
        raise ValueError(
            f"collapse must be 'auto', True or False, got {collapse!r}"
        )
    r = num_hashes // bands
    if hash_mode == "md5":
        A, B = md5_minhash_constants(num_hashes)
        p = _P31
        fold_cs = np.array(band_fold_coeffs(r), dtype=np.uint64)
    else:
        rng = np.random.default_rng(1234)
        A = rng.integers(1, int(_MERSENNE) - 1, size=num_hashes, dtype=np.uint64)
        B = rng.integers(0, int(_MERSENNE) - 1, size=num_hashes, dtype=np.uint64)
        p = _MERSENNE

    def sigs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, hashes, starts = _flat_doc_tokens(
                pdf, shingle, hash_mode, md5_hex=15
            )
            if hash_mode == "md5":
                # reduce the 60-bit truncated md5 into the 31-bit field
                # BEFORE the affine pass: h' < 2^31 keeps A*h' + B < 2^62
                # (uint64/BIGINT-exact), and the ~31-bit space avoids the
                # birthday collisions a 28-bit truncation hits at ~16k
                # distinct shingles
                hashes = hashes % p
            if doc_ids.size == 0:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype="int64"),
                        "sig": pd.Series([], dtype=object),
                        "band_hashes": pd.Series([], dtype=object),
                    }
                )
                continue
            # sig[d, i] = min over doc d's token hashes of (A[i]*h + B[i]) % p;
            # one vector pass per hash function (num_hashes passes total)
            reduce_at = starts[:-1]
            sig = np.empty((doc_ids.size, num_hashes), dtype=np.uint64)
            for i in range(num_hashes):
                v = (A[i] * hashes + B[i]) % p
                sig[:, i] = np.minimum.reduceat(v, reduce_at)
            banded = sig.reshape(doc_ids.size, bands, r)
            if hash_mode == "md5":
                # positional fold mod p: every product < 2^62, exact in
                # uint64 and in the SQL twin's BIGINT alike
                bh = ((banded * fold_cs[None, None, :]) % p).sum(axis=2) % p
                sig_i64 = sig.astype(np.int64)
                bh_i64 = bh.astype(np.int64)
            else:
                # per-band FNV fold over the band's r slots (mod-2^64
                # wraparound is fine here: no SQL twin for sip mode)
                bh = np.full(
                    (doc_ids.size, bands), 0xCBF29CE484222325, dtype=np.uint64
                )
                prime = np.uint64(0x100000001B3)
                for j in range(r):
                    bh = (bh ^ banded[:, :, j]) * prime
                sig_i64 = (sig >> np.uint64(1)).astype(np.int64)
                bh_i64 = (bh >> np.uint64(1)).astype(np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "sig": list(sig_i64),
                    "band_hashes": list(bh_i64),
                }
            )

    sig_df = docs.select("doc_id", "text").mapInPandas(
        sigs,
        schema="doc_id long, sig array<long>, band_hashes array<long>",
    )
    # signature-group view: one shuffle on the full signature (band hashes
    # are a function of the signature, so equal sigs share every band) —
    # feeds the distinct-signature band join AND both expansion sides:
    # persist for the run (at real scale: a parquet staging write).
    #
    # The group shuffle is pure overhead on corpora WITHOUT duplicate
    # signatures, so a cheap aggregate decides first: count-distinct over a
    # 64-bit hash of the signature shuffles 8-byte keys instead of ~0.5 KB
    # signature rows. Distinct hashes imply distinct signatures, so the
    # skip can never be taken wrongly (a hash collision just means we run
    # the collapse on an all-distinct corpus — correct, merely slower).
    from pyspark.sql import Window

    sig_df = sig_df.persist()
    do_collapse = collapse
    if collapse == "auto":
        stats = sig_df.agg(
            F.count("*").alias("n"),
            F.countDistinct(F.xxhash64("sig")).alias("d"),
        ).collect()[0]
        do_collapse = stats["d"] != stats["n"]
    if not do_collapse:
        # every doc is its own representative; the within-group expansion
        # below is vacuously empty under n_members == 1
        mem = sig_df.withColumn("rep", F.col("doc_id")).withColumn(
            "n_members", F.lit(1)
        )
    else:
        w = Window.partitionBy("sig")
        mem = (
            sig_df.withColumn("rep", F.min("doc_id").over(w))
            .withColumn("n_members", F.count("*").over(w))
        )
    mem = mem.persist()
    groups = mem.filter(F.col("doc_id") == F.col("rep"))
    # narrow bucket rows (3 ints) per DISTINCT signature for the candidate
    # join; signatures joined back only for surviving representative pairs
    buckets = groups.select(
        "rep", F.posexplode("band_hashes").alias("band", "band_hash")
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.rep") < F.col("b.rep")),
        )
        .select(
            F.col("a.rep").alias("rep_a"),
            F.col("b.rep").alias("rep_b"),
        )
        .dropDuplicates(["rep_a", "rep_b"])
    )
    ga = groups.select(F.col("rep").alias("rep_a"), F.col("sig").alias("sig_a"))
    gb = groups.select(F.col("rep").alias("rep_b"), F.col("sig").alias("sig_b"))
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: (x == y).cast("int")),
            lambda z: z == 1,
        )
    )
    est = agree / F.lit(float(num_hashes))
    rep_pairs = (
        cand.join(ga, "rep_a")
        .join(gb, "rep_b")
        .filter(est >= threshold)
        .select("rep_a", "rep_b", F.round(est, 4).alias("est_jaccard"))
    )
    one = F.round(F.lit(1.0), 4).alias("est_jaccard")
    if expand == "pairs":
        # cross-signature: members of rep_a's group x members of rep_b's;
        # each doc belongs to exactly one representative, so expansion
        # cannot duplicate a pair
        ma = mem.select(F.col("rep").alias("rep_a"), F.col("doc_id").alias("da"))
        mb = mem.select(F.col("rep").alias("rep_b"), F.col("doc_id").alias("db"))
        cross = (
            rep_pairs.join(ma, "rep_a")
            .join(mb, "rep_b")
            .select(
                F.least("da", "db").alias("doc_a"),
                F.greatest("da", "db").alias("doc_b"),
                "est_jaccard",
            )
        )
        # identical signatures agree on every slot: est_jaccard = 1.0,
        # no band join needed; singletons never reach the self-join
        mm = mem.filter(F.col("n_members") >= 2).select("rep", "doc_id")
        within = (
            mm.alias("x")
            .join(
                mm.alias("y"),
                (F.col("x.rep") == F.col("y.rep"))
                & (F.col("x.doc_id") < F.col("y.doc_id")),
            )
            .select(
                F.col("x.doc_id").alias("doc_a"),
                F.col("y.doc_id").alias("doc_b"),
                one,
            )
        )
    else:  # star — the 10^9-doc shape: O(docs + sig-pairs) edges
        cross = rep_pairs.select(
            F.least("rep_a", "rep_b").alias("doc_a"),
            F.greatest("rep_a", "rep_b").alias("doc_b"),
            "est_jaccard",
        )
        within = (
            mem.filter(F.col("doc_id") != F.col("rep"))
            .select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b"), one)
        )
    result = cross.unionByName(within)
    # materialize the pair set (bounded by LSH collisions, tiny vs corpus),
    # severing the result's lineage from mem so the cache can be freed now
    result = result.localCheckpoint(eager=True)
    mem.unpersist(blocking=False)
    sig_df.unpersist(blocking=False)
    return result


def simhash_signatures(docs: DataFrame, hash_mode: str = "sip") -> DataFrame:
    """64-bit SimHash over tf-weighted token hashes (near-dup fingerprint).

    ``hash_mode="md5"`` draws the per-token bit source from the first 16 hex
    digits of md5(token) — the identical signature is computable in DuckDB
    SQL (('0x'||substr(md5(t),1,16))::UBIGINT bit tests), giving the driver
    a value-exact oracle; "sip" is the faster default.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_idx = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            all_ids = pdf["doc_id"].to_numpy(np.int64)
            doc_ids, hashes, starts = _flat_doc_tokens(
                pdf, 1, hash_mode, md5_hex=16
            )
            out = np.zeros(all_ids.size, dtype=np.int64)
            if doc_ids.size:
                # per-flat-token ±1 bit votes, summed per doc with reduceat
                bits = (
                    (hashes[:, None] >> bit_idx[None, :]) & np.uint64(1)
                ).astype(np.int64)
                votes = bits * 2 - 1
                acc = np.add.reduceat(votes, starts[:-1], axis=0)
                sh = ((acc > 0).astype(np.uint64) << bit_idx[None, :]).sum(
                    axis=1, dtype=np.uint64
                )
                lookup = dict(zip(doc_ids.tolist(), (sh >> np.uint64(1)).astype(np.int64).tolist()))
                out = np.array([lookup.get(i, 0) for i in all_ids.tolist()], dtype=np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(all_ids, dtype="int64"),
                    "simhash": pd.Series(out, dtype="int64"),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        kernel, schema="doc_id long, simhash long"
    )


def _band_combo_keys(blocks: int, keep: int, col: str = "simhash"):
    """Manku-style multi-table keys (Manku/Jain/Das Sarma, WWW'07 §3): split
    the 64-bit signature into ``blocks`` equal slices and emit one key per
    ``keep``-subset of slices (the concatenation of those slices' bits).
    Pigeonhole: a pair with hamming <= blocks-keep differs in at most
    blocks-keep slices, so it agrees on ALL slices of at least one subset
    and collides on that table's key."""
    from itertools import combinations

    width = 64 // blocks
    mask = (1 << width) - 1
    slices = [
        F.shiftright(F.col(col), i * width).bitwiseAND(F.lit(mask))
        for i in range(blocks)
    ]
    keys = []
    for combo in combinations(range(blocks), keep):
        key = F.lit(0).cast("long")
        for j, i in enumerate(combo):
            key = key.bitwiseOR(F.shiftleft(slices[i], j * width))
        keys.append(key)
    return keys


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    expand: str = "pairs",
    blocks: int | None = None,
    hash_mode: str = "sip",
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance, banded over
    DISTINCT signatures.

    Two-level plan (the scale shape; cf. Manku/Jain/Das Sarma WWW'07):

    1. **Collapse identical signatures.** Boilerplate/near-empty documents
       produce identical 64-bit signatures in huge groups; joining at the
       document level makes every such group a quadratic hot bucket. The
       banded candidate join therefore runs over ``groupBy(simhash)``
       output — one row per DISTINCT signature — so candidate-join cost is
       bounded by distinct-signature counts, independent of how many
       documents share a signature.
    2. **Banded candidate join** on (band, slice value): splitting the
       signature into ``bands`` equal slices guarantees every signature
       pair with hamming <= bands-1 collides on at least one slice;
       popcount(xor) verifies exactly. All JVM-side expressions.
    3. **Expansion back to documents.** ``expand="pairs"`` (default)
       emits every qualifying document pair — faithful to brute force, but
       inherently quadratic in group size when g docs share a signature
       (the OUTPUT is g*(g-1)/2 rows; no join stage is quadratic beyond
       that output). ``expand="star"`` is the 10^9-document shape: within
       an identical-signature group it links members to the group's
       representative (min doc_id), and across signature groups it links
       representative to representative — O(docs + signature-pairs) edges
       with the same connected components (dedup clusters) as "pairs".

    ``blocks``: when set (> max_hamming), use Manku multi-table keys
    instead of single-slice bands — C(blocks, blocks-max_hamming) tables
    keyed on (blocks-max_hamming)*(64/blocks) bits each. E.g. blocks=6,
    max_hamming=3 gives 20 tables of ~32-bit keys: bucket population drops
    from distinct_sigs/2^16 to distinct_sigs/2^32, the knob to turn when
    distinct-signature volume makes single-slice buckets hot.
    """
    if expand not in ("pairs", "star"):
        raise ValueError(f"expand must be 'pairs' or 'star', got {expand!r}")
    # signatures feed the group collapse and both expansion sides — persist
    # so the tokenize+vote kernel runs once (at real scale: a staging write)
    sig = simhash_signatures(docs, hash_mode).persist()
    groups = sig.groupBy("simhash").agg(
        F.min("doc_id").alias("rep"), F.count("*").alias("n_members")
    )
    if blocks is not None:
        if blocks <= max_hamming:
            raise ValueError(
                f"blocks={blocks} must exceed max_hamming={max_hamming}"
            )
        keys = _band_combo_keys(blocks, blocks - max_hamming)
    else:
        if max_hamming > bands - 1:
            raise ValueError(
                f"bands={bands} only guarantees recall for hamming <= "
                f"{bands - 1}"
            )
        width = 64 // bands
        mask = (1 << width) - 1
        keys = [
            F.shiftright(F.col("simhash"), i * width).bitwiseAND(F.lit(mask))
            for i in range(bands)
        ]
    buckets = groups.select(
        "simhash", F.posexplode(F.array(*keys)).alias("band", "bval")
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    sig_pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.simhash") < F.col("b.simhash")),
        )
        .filter(ham <= max_hamming)
        .select(
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
            ham.alias("hamming"),
        )
        .dropDuplicates(["sig_a", "sig_b"])
    )
    multi = groups.filter(F.col("n_members") >= 2)
    if expand == "pairs":
        # cross-signature: members of sig_a x members of sig_b
        ma = sig.select(F.col("simhash").alias("sig_a"), F.col("doc_id").alias("da"))
        mb = sig.select(F.col("simhash").alias("sig_b"), F.col("doc_id").alias("db"))
        cross = (
            sig_pairs.join(ma, "sig_a")
            .join(mb, "sig_b")
            .select(
                F.least("da", "db").alias("doc_a"),
                F.greatest("da", "db").alias("doc_b"),
                "hamming",
            )
        )
        # within-group (hamming 0): members of multi-doc signature groups
        # only — singletons never reach the self-join (semi-join prune; AQE
        # picks broadcast when the multi-group side is small)
        mm = sig.join(multi.select("simhash"), "simhash", "semi")
        within = (
            mm.alias("x")
            .join(
                mm.alias("y"),
                (F.col("x.simhash") == F.col("y.simhash"))
                & (F.col("x.doc_id") < F.col("y.doc_id")),
            )
            .select(
                F.col("x.doc_id").alias("doc_a"),
                F.col("y.doc_id").alias("doc_b"),
                F.lit(0).alias("hamming"),
            )
        )
    else:  # star
        ra = groups.select(F.col("simhash").alias("sig_a"), F.col("rep").alias("doc_a"))
        rb = groups.select(F.col("simhash").alias("sig_b"), F.col("rep").alias("doc_b"))
        cross = (
            sig_pairs.join(ra, "sig_a")
            .join(rb, "sig_b")
            .select(
                F.least("doc_a", "doc_b").alias("doc_a"),
                F.greatest("doc_a", "doc_b").alias("doc_b"),
                "hamming",
            )
        )
        within = (
            sig.join(multi, "simhash")
            .filter(F.col("doc_id") != F.col("rep"))
            .select(
                F.col("rep").alias("doc_a"),
                F.col("doc_id").alias("doc_b"),
                F.lit(0).alias("hamming"),
            )
        )
    result = cross.unionByName(within).dropDuplicates(["doc_a", "doc_b"])
    result = result.localCheckpoint(eager=True)
    sig.unpersist(blocking=False)
    return result
