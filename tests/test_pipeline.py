"""Training-data pipeline ops: dedup (exact / MinHash-LSH / SimHash /
n-gram Jaccard) behavioral tests against hand-constructed near-duplicates.

The LSH/SimHash ops have no SQL oracle (driver records rows-only); these
tests are their correctness gate: known near-dups must be found, unrelated
docs must not collide, and the MinHash Jaccard estimate must track the
exact shingle Jaccard.
"""

import numpy as np
import pandas as pd
import pytest

from iresearch_spark.pipeline.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
)

WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]


def _mk_doc(rng: np.random.Generator, n: int) -> str:
    return " ".join(rng.choice(WORDS, size=n).tolist())


@pytest.fixture(scope="module")
def docs_df(spark):
    rng = np.random.default_rng(7)
    texts = [_mk_doc(rng, 120) for _ in range(20)]
    # doc 100 = exact copy of doc 0; doc 101 = doc 1 with a small edit
    texts_all = texts + [texts[0], texts[1].replace("alpha", "zulu", 3)]
    ids = list(range(20)) + [100, 101]
    pdf = pd.DataFrame(
        {"doc_id": ids, "text": texts_all, "lang": "en", "source": "s0",
         "n_chars": [len(t) for t in texts_all]}
    )
    return spark.createDataFrame(pdf)


def test_exact_dedup_finds_copy(docs_df):
    out = exact_dedup(docs_df).toPandas()
    dup_groups = out[out["n_copies"] > 1]
    assert len(dup_groups) == 1
    assert int(dup_groups["keep_doc_id"].iloc[0]) == 0
    assert int(dup_groups["n_copies"].iloc[0]) == 2


@pytest.mark.parametrize("hash_mode", ["sip", "md5"])
def test_minhash_lsh_finds_near_dups(docs_df, hash_mode):
    pairs = minhash_lsh_pairs(docs_df, 64, 16, 0.5, hash_mode=hash_mode).toPandas()
    found = {(int(a), int(b)) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (0, 100) in found  # exact copy: est_jaccard == 1.0
    exact = pairs[(pairs.doc_a == 0) & (pairs.doc_b == 100)]
    assert float(exact["est_jaccard"].iloc[0]) == 1.0
    assert (1, 101) in found  # small edit: high but < 1
    near = float(pairs[(pairs.doc_a == 1) & (pairs.doc_b == 101)]["est_jaccard"].iloc[0])
    assert 0.5 <= near < 1.0


def test_minhash_estimate_tracks_exact_jaccard(docs_df):
    est = minhash_lsh_pairs(docs_df, 128, 32, 0.3).toPandas()
    exact = ngram_jaccard_pairs(docs_df, 0.0).toPandas()
    exact_map = {
        (int(a), int(b)): float(j)
        for a, b, j in zip(exact.doc_a, exact.doc_b, exact.jaccard)
    }
    checked = 0
    for a, b, e in zip(est.doc_a, est.doc_b, est.est_jaccard):
        # ngram_jaccard uses DISTINCT trigram sets too — comparable universe
        j = exact_map.get((int(a), int(b)), 0.0)
        assert abs(e - j) < 0.25, (a, b, e, j)
        checked += 1
    assert checked >= 2


def test_minhash_no_spurious_collisions(docs_df):
    pairs = minhash_lsh_pairs(docs_df, 64, 8, 0.9).toPandas()
    found = {(int(a), int(b)) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    # only the planted duplicates survive 0.9 — no unrelated collisions
    assert (0, 100) in found
    assert found <= {(0, 100), (1, 101)}


def test_minhash_pairs_identical_group_no_quadratic_candidates(spark):
    """10^4 exact-duplicate documents share one MinHash signature, which
    puts one identical band hash in EVERY band: a document-level band join
    would generate O(g^2 * bands) candidates. The candidate join runs over
    DISTINCT signatures (grouped by full signature, keyed by the min-doc_id
    representative), so the identical group never enters it; star expansion
    emits O(docs) member->representative edges."""
    import time

    n = 10_000
    base = (
        "def main prints hello world and returns the spark session "
        "builder with a config value"
    )
    pdf = pd.DataFrame(
        {
            "doc_id": range(n + 2),
            "text": [base] * n
            + [
                "alpha bravo charlie delta echo foxtrot golf hotel india",
                "completely unrelated other tokens entirely different here",
            ],
        }
    )
    docs = spark.createDataFrame(pdf)
    t0 = time.perf_counter()
    star = minhash_lsh_pairs(docs, 64, 16, 0.5, expand="star").toPandas()
    elapsed = time.perf_counter() - t0
    # est_jaccard == 1.0 requires all 64 slots equal == identical signature,
    # so these are exactly the within-group star edges
    within = star[star.est_jaccard == 1.0]
    assert len(within) == n - 1
    assert set(within.doc_a) == {0}  # min doc_id is the representative
    assert set(within.doc_b) == set(range(1, n))
    # a quadratic candidate stage would emit ~8*10^8 band collisions and
    # blow the runtime; the distinct-signature plan finishes in seconds
    assert elapsed < 60, f"took {elapsed:.0f}s — quadratic stage suspected"


def test_minhash_collapse_modes_identical_pairs(docs_df):
    """collapse is a pure plan hint: 'auto' (aggregate decides), True
    (unconditional collapse, no detection job) and False (pre-collapse
    plan — identical signatures still collide in every band) must all
    return exactly the same pairs on a corpus WITH duplicate signatures."""

    def canon(df):
        pdf = df.toPandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        return list(map(tuple, pdf[["doc_a", "doc_b", "est_jaccard"]].values))

    auto = canon(minhash_lsh_pairs(docs_df, 64, 16, 0.5))
    forced = canon(minhash_lsh_pairs(docs_df, 64, 16, 0.5, collapse=True))
    off = canon(minhash_lsh_pairs(docs_df, 64, 16, 0.5, collapse=False))
    assert auto == forced == off
    assert len(auto) > 0  # the planted duplicates are found in every mode
    with pytest.raises(ValueError):
        minhash_lsh_pairs(docs_df, 64, 16, 0.5, collapse="yes")


def test_minhash_pairs_star_same_components_as_pairs(docs_df):
    """star expansion must produce the same connected components (dedup
    clusters) as full pair expansion, and pairs mode must emit every
    within-group pair with est_jaccard exactly 1.0."""

    def components(edges):
        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[rb] = ra
        groups: dict[int, set] = {}
        for x in parent:
            groups.setdefault(find(x), set()).add(x)
        return {frozenset(g) for g in groups.values() if len(g) > 1}

    pairs = minhash_lsh_pairs(docs_df, 64, 16, 0.5).toPandas()
    star = minhash_lsh_pairs(docs_df, 64, 16, 0.5, expand="star").toPandas()
    assert components(zip(pairs.doc_a, pairs.doc_b)) == components(
        zip(star.doc_a, star.doc_b)
    )
    exact = pairs[(pairs.doc_a == 0) & (pairs.doc_b == 100)]
    assert len(exact) == 1 and float(exact.est_jaccard.iloc[0]) == 1.0


@pytest.mark.parametrize("hash_mode", ["sip", "md5"])
def test_simhash_copy_identical_and_near_dup_close(docs_df, hash_mode):
    sh = (
        simhash_signatures(docs_df, hash_mode)
        .toPandas()
        .set_index("doc_id")["simhash"]
    )
    assert int(sh[0]) == int(sh[100])
    ham_near = bin(int(sh[1]) ^ int(sh[101])).count("1")
    assert ham_near <= 16
    # median hamming distance of unrelated pairs stays high
    hams = [
        bin(int(sh[i]) ^ int(sh[j])).count("1")
        for i in range(10)
        for j in range(i + 1, 10)
    ]
    assert np.median(hams) > ham_near


def test_simhash_emits_row_for_empty_doc(spark):
    pdf = pd.DataFrame({"doc_id": [1, 2], "text": ["alpha bravo", ""]})
    out = simhash_signatures(spark.createDataFrame(pdf)).toPandas()
    assert sorted(out["doc_id"]) == [1, 2]
    assert int(out.set_index("doc_id").loc[2, "simhash"]) == 0


@pytest.mark.parametrize("hash_mode", ["sip", "md5"])
def test_simhash_pairs_complete_vs_bruteforce(docs_df, hash_mode):
    """Banded Hamming join must return EXACTLY the brute-force popcount
    pairs for hamming <= bands-1 (pigeonhole completeness)."""
    from iresearch_spark.pipeline.dedup import simhash_pairs

    sigs = simhash_signatures(docs_df, hash_mode).toPandas()
    sig_of = dict(zip(sigs.doc_id, sigs.simhash))
    want = set()
    ids = sorted(sig_of)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(int(sig_of[a]) ^ int(sig_of[b])).count("1") <= 3:
                want.add((a, b))
    got_pdf = simhash_pairs(
        docs_df, max_hamming=3, bands=4, hash_mode=hash_mode
    ).toPandas()
    got = {(int(a), int(b)) for a, b in zip(got_pdf.doc_a, got_pdf.doc_b)}
    assert got == want
    assert (0, 100) in got  # the exact copy (hamming 0)


def test_simhash_pairs_rejects_impossible_threshold(docs_df):
    from iresearch_spark.pipeline.dedup import simhash_pairs

    with pytest.raises(ValueError):
        simhash_pairs(docs_df, max_hamming=4, bands=4)


def test_simhash_pairs_manku_blocks_match_banded(docs_df):
    """Manku multi-table keys (blocks=6 -> C(6,3)=20 tables of 32-bit keys)
    must return the same exact pair set as single-slice bands."""
    from iresearch_spark.pipeline.dedup import simhash_pairs

    banded = simhash_pairs(docs_df, max_hamming=3, bands=4).toPandas()
    manku = simhash_pairs(docs_df, max_hamming=3, blocks=6).toPandas()
    key = lambda p: sorted(zip(p.doc_a, p.doc_b, p.hamming))  # noqa: E731
    assert key(banded) == key(manku)


def test_simhash_pairs_identical_group_no_quadratic_candidates(spark):
    """10^4 documents sharing one signature: the banded candidate join runs
    over DISTINCT signatures, so candidate volume stays O(distinct^2/2^16)
    — not O(docs^2). star expansion emits O(docs) edges with the same
    connected components."""
    import time

    from iresearch_spark.pipeline.dedup import simhash_pairs

    n = 10_000
    pdf = pd.DataFrame({
        "doc_id": range(n + 2),
        # n+0..n-1: identical boilerplate; n, n+1: distinct fillers
        "text": ["lorem ipsum dolor sit amet boilerplate header"] * n
        + ["alpha bravo charlie delta echo", "foxtrot golf hotel india"],
    })
    docs = spark.createDataFrame(pdf)
    t0 = time.perf_counter()
    star = simhash_pairs(docs, max_hamming=3, bands=4, expand="star").toPandas()
    elapsed = time.perf_counter() - t0
    # star: one edge per non-representative member (+ any cross edges)
    within = star[star.hamming == 0]
    assert len(within) == n - 1
    assert set(within.doc_a) == {0}  # min doc_id is the representative
    assert set(within.doc_b) == set(range(1, n))
    # a quadratic candidate stage would emit ~5*10^7 pairs and blow the
    # runtime; the distinct-signature plan finishes in seconds
    assert elapsed < 60, f"took {elapsed:.0f}s — quadratic stage suspected"


def test_simhash_pairs_star_same_components_as_pairs(docs_df):
    """star expansion must produce the same connected components (dedup
    clusters) as full pair expansion."""
    from iresearch_spark.pipeline.dedup import simhash_pairs

    def components(edges):
        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[rb] = ra
        groups: dict[int, set] = {}
        for x in parent:
            groups.setdefault(find(x), set()).add(x)
        return {frozenset(g) for g in groups.values() if len(g) > 1}

    pairs = simhash_pairs(docs_df, max_hamming=3, bands=4).toPandas()
    star = simhash_pairs(docs_df, max_hamming=3, bands=4, expand="star").toPandas()
    assert components(zip(pairs.doc_a, pairs.doc_b)) == components(
        zip(star.doc_a, star.doc_b)
    )


def test_ngram_prefix_filter_matches_naive(docs_df, spark):
    """Prefix-filtered ngram_jaccard_pairs must return the identical pair
    set as a brute-force all-pairs computation."""
    from iresearch_spark.analysis import CODE_TOKEN_PATTERN
    import re

    pdf = docs_df.toPandas()
    grams = {}
    for r in pdf.itertuples(index=False):
        toks = re.findall(CODE_TOKEN_PATTERN, (r.text or "").lower())
        grams[r.doc_id] = {
            " ".join(toks[i: i + 3]) for i in range(len(toks) - 2)
        }
    want = {}
    ids = sorted(grams)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(grams[a] & grams[b])
            if inter:
                j = round(inter / (len(grams[a]) + len(grams[b]) - inter), 4)
                if j >= 0.15:
                    want[(a, b)] = j
    got_pdf = ngram_jaccard_pairs(docs_df, 0.15).toPandas()
    got = {
        (int(a), int(b)): float(j)
        for a, b, j in zip(got_pdf.doc_a, got_pdf.doc_b, got_pdf.jaccard)
    }
    assert got == want
    assert (0, 100) in got and got[(0, 100)] == 1.0


def test_ngram_prefix_bounds_universal_gram(spark):
    """A boilerplate gram shared by EVERY doc must not explode the candidate
    join: with distinct remainders, the universal gram is common (max df) so
    it never enters any prefix, and candidates stay ~0 instead of O(n^2)."""
    from pyspark.sql import functions as F

    from iresearch_spark.pipeline.dedup import _gram_sets, _ngram_candidates

    n = 60
    rows = []
    for i in range(n):
        # shared 3-token boilerplate + unique tail
        rows.append(
            (i, f"license header apache unique{i}a unique{i}b unique{i}c "
                f"unique{i}d unique{i}e", "en", "s0", 0)
        )
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    docs = spark.createDataFrame(pdf)
    flat = _gram_sets(docs).select(
        "doc_id", "bucket", "n_grams", F.explode("grams").alias("gram")
    )
    n_cand = _ngram_candidates(flat, 0.5).count()
    assert n_cand < n  # naive same-gram join would give n*(n-1)/2 = 1770
    # and the full op returns no >=0.5 pairs (docs share only boilerplate)
    assert ngram_jaccard_pairs(docs, 0.5).count() == 0


def test_winnowing_guarantee_and_density(spark):
    """Winnowing invariant (Schleimer et al. 2003): two docs sharing a run
    of >= w + k - 1 tokens share at least one fingerprint; selection
    density stays well under 1 fingerprint per shingle."""
    from iresearch_spark.pipeline.text import winnowing_fingerprints

    shared = " ".join(f"common{i}" for i in range(12))  # >= w+k-1 = 8 tokens
    rows = [
        (0, f"aaa bbb {shared} ccc ddd eee fff", "en", "s0", 0),
        (1, f"xxx yyy zzz www {shared} qqq rrr", "en", "s0", 0),
        (2, "totally different words here nothing shared at all "
            "one two three four five six", "en", "s0", 0),
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    )
    fp = winnowing_fingerprints(docs, k=5, w=4).toPandas()
    by_doc = {d: set(g["fingerprint"]) for d, g in fp.groupby("doc_id")}
    assert by_doc[0] & by_doc[1], "shared 12-token run must share a fingerprint"
    assert not (by_doc[0] & by_doc[2])
    assert not (by_doc[1] & by_doc[2])
    # density: far fewer fingerprints than shingles (22 tokens -> 18 shingles)
    assert len(by_doc[0]) < 12


def test_bpe_estimate_counts(spark):
    from iresearch_spark.pipeline.text import bpe_token_estimate

    docs = spark.createDataFrame(
        pd.DataFrame(
            [(0, "it's 2024, hello-world foo", "en", "s0", 0),
             (1, None, "en", "s0", 0)],
            columns=["doc_id", "text", "lang", "source", "n_chars"],
        )
    )
    out = bpe_token_estimate(docs).toPandas().set_index("doc_id")
    # it|'s| |2024|,| hello|-|world| foo -> pretokens: "it","'s","2024",
    # ","," hello","-","world"(with space), " foo"
    assert out.loc[0, "n_pretokens"] == 8
    assert out.loc[1, "n_pretokens"] == 0 and out.loc[1, "est_chars_div4"] == 0
