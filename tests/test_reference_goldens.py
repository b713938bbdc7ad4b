"""End-to-end parity on the REFERENCE'S OWN golden corpora (r4 verdict #4).

The reference's BM25 query tests hard-code expected doc orders over
`tests/resources/simple_sequential_order.json` and siblings
(`bm25_test.cpp:528-600` and onward). Those tests index each JSON string
value as an exact `string_field` WITHOUT the norm feature, so the scorer
takes the normless fallback (`bm25.cpp:488-490`: |doc| pretended 1, REAL
avg_dl from field stats) — our ``BM25(norm="none")``. The equal-tf
goldens (by_term, multi-segment, prefix) can't distinguish that branch
from plain BM15 (b=0) and keep the original BM15 engine; the by_range
goldens further down CAN distinguish (mixed tf + mixed idf) and pin the
dl=1 branch exactly. Expected orders are asserted VERBATIM from the C++
arrays.

The reference reads its resources at test time; we do the same (read-only)
and skip cleanly if the reference tree is absent.

europarl.subset.txt (delim_doc_generator: one doc per tab-delimited line,
`doc_generator.cpp:262-296`) provides the real-language corpus goldens:
build determinism across input partitioning and WAND/exhaustive
bit-identity on natural text.
"""

import json
import os
import zlib

import pytest

from iresearch_spark.index import build_index
from iresearch_spark.search import (
    Or,
    Phrase,
    Prefix,
    SearchEngine,
    TermF,
    TermRange,
)
from iresearch_spark.search.scorers import BM25

REF = "/root/reference/tests/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference resources not available"
)

# BM15 == the no-norm branch the reference's string_field corpus takes
# (no norm feature -> norm_const = k, no length normalization)
BM15 = BM25(b=0.0)


def _load(name: str):
    with open(os.path.join(REF, name), "rb") as fh:
        return json.load(fh)


def _parity_path(seq: int) -> str:
    """A path whose crc32 segment assignment (segment_expr: crc32 of
    repo\\0path\\0commit, repo='r' commit='c', % 2) matches seq % 2 — the
    reference test's even/odd two-segment split — while keeping paths
    lexicographically ordered by seq (doc ids follow path order)."""
    for salt in range(64):
        path = f"{seq:02d}_{salt}"
        if zlib.crc32(f"r\x00{path}\x00c".encode()) % 2 == seq % 2:
            return path
    raise AssertionError("no parity salt found")  # pragma: no cover


def _seq_order(engine, filt, k=None):
    rows = engine.search(filt, k=k).collect()
    return [int(r["path"].split("_")[0].split(".")[0]) for r in rows]


@pytest.fixture(scope="module")
def order_engine(spark, tmp_path_factory):
    """simple_sequential_order.json, ONE segment (bm25_test.cpp:528-560
    add_segment(gen)): each doc's `field` array joined into one token
    stream — dl = number of values, tf = value multiplicity, exactly the
    repeated string_field inserts."""
    docs = _load("simple_sequential_order.json")
    d = str(tmp_path_factory.mktemp("idx_golden_order"))
    rows = [
        ("r", f"{doc['seq']:02d}.json", "c", "json", " ".join(doc["field"]))
        for doc in docs
    ]
    schema = (
        "repo string, path string, commit string, lang string, "
        "content string"
    )
    build_index(spark, spark.createDataFrame(rows, schema), d,
                num_segments=1)
    return SearchEngine(spark, d, scorer=BM15)


@pytest.fixture(scope="module")
def order_engine_2seg(spark, tmp_path_factory):
    """The even/odd two-segment split of bm25_test.cpp:605-660: segment 0
    holds even seq, segment 1 odd seq (paths salted so the crc32
    assignment reproduces the reference's segment layout)."""
    docs = _load("simple_sequential_order.json")
    d = str(tmp_path_factory.mktemp("idx_golden_order2"))
    rows = [
        ("r", _parity_path(doc["seq"]), "c", "json", " ".join(doc["field"]))
        for doc in docs
    ]
    schema = (
        "repo string, path string, commit string, lang string, "
        "content string"
    )
    build_index(spark, spark.createDataFrame(rows, schema), d,
                num_segments=2)
    return SearchEngine(spark, d, scorer=BM15)


def test_by_term_order_golden(order_engine):
    """bm25_test.cpp test_query by_term: term '7' -> seq {0, 1, 5, 7}
    (tf 3 > tf 2 > tf 1 ties broken by doc order)."""
    got = _seq_order(order_engine, TermF(term="7"))
    assert got == [0, 1, 5, 7]


def test_by_term_order_golden_wand_topk(order_engine):
    """The same golden through the top-k WAND path."""
    got = _seq_order(order_engine, TermF(term="7"), k=4)
    assert got == [0, 1, 5, 7]


def test_by_term_multi_segment_golden(order_engine_2seg):
    """bm25_test.cpp 'by term multi-segment, same term': term '6' -> seq
    {0, 2, 5} — equal scores (tf=1 everywhere, GLOBAL stats), ordered by
    (segment, doc): evens first."""
    got = _seq_order(order_engine_2seg, TermF(term="6"))
    assert got == [0, 2, 5]


def test_disjunction_multi_segment_golden(order_engine_2seg):
    """bm25_test.cpp 'by_term disjunction multi-segment, different terms':
    Or(term '6', term '8') -> seq {3, 7, 0, 2, 5} — '8' (df=2) out-idfs
    '6' (df=3); ties by (segment, doc)."""
    q = Or(
        children=(
            TermF(term="6"),
            TermF(term="8"),
        )
    )
    got = _seq_order(order_engine_2seg, q)
    assert got == [3, 7, 0, 2, 5]


@pytest.fixture(scope="module")
def sequential_engine_2seg(spark, tmp_path_factory):
    """simple_sequential.json (32 docs) under the same even/odd split —
    the by_prefix golden's corpus. String fields 'same' (every doc) and
    'prefix' (10 docs) are indexed; numbers are stored-only in the
    reference lambda and stay unindexed here."""
    docs = _load("simple_sequential.json")
    d = str(tmp_path_factory.mktemp("idx_golden_seq"))
    rows = [
        (
            "r",
            _parity_path(doc["seq"]),
            "c",
            "json",
            doc["same"],  # 'content' stands in for the 'same' field
            doc.get("prefix"),
        )
        for doc in docs
    ]
    schema = (
        "repo string, path string, commit string, lang string, "
        "content string, prefix string"
    )
    build_index(
        spark,
        spark.createDataFrame(rows, schema),
        d,
        num_segments=2,
        fields=[("content", "code"), ("prefix", "code")],
    )
    return SearchEngine(spark, d, scorer=BM15)


def test_by_prefix_empty_golden(sequential_engine_2seg):
    """bm25_test.cpp 'by_prefix empty multi-segment': Prefix('') over the
    'prefix' field -> seq {0,8,20,28, 3,15,23,25, 30,31} — the nine
    unique-valued docs tie at df=1 (segment-then-doc order), the shared
    'abcy' pair (df=2, smaller idf) ranks last."""
    got = _seq_order(
        sequential_engine_2seg, Prefix(field_name="prefix", prefix="")
    )
    assert got == [0, 8, 20, 28, 3, 15, 23, 25, 30, 31]


# ---------------------------------------------------------------- europarl


@pytest.fixture(scope="module")
def europarl_rows():
    rows = []
    with open(
        os.path.join(REF, "europarl.subset.txt"), encoding="utf-8"
    ) as fh:
        for i, line in enumerate(fh):
            if i >= 400:
                break
            parts = line.rstrip("\n").split("\t")
            title, date, body = (parts + ["", "", ""])[:3]
            rows.append(("europarl", f"{i:05d}.txt", date or "c", "txt",
                         f"{title} {body}"))
    assert len(rows) == 400
    return rows


def test_europarl_build_determinism(spark, europarl_rows, tmp_path):
    """Real-language text (delim_doc_generator corpus): identical manifest
    content hashes regardless of input partitioning — the determinism
    invariant on the reference's own natural-text corpus."""
    from iresearch_spark.index import read_manifest

    schema = (
        "repo string, path string, commit string, lang string, "
        "content string"
    )
    hashes = []
    for parts in (3, 11):
        d = str(tmp_path / f"idx_euro_{parts}")
        build_index(
            spark,
            spark.createDataFrame(europarl_rows, schema).repartition(parts),
            d,
            num_segments=4,
        )
        man = read_manifest(d)
        hashes.append(
            tuple(sorted((s["segment_id"], s["content_hash"])
                         for s in man.segments))
        )
    assert hashes[0] == hashes[1]


def test_europarl_wand_bit_identity(spark, europarl_rows, tmp_path):
    """WAND == exhaustive on natural-language postings (hot english terms
    'the'/'of' + a min_match pair) — the synthetic-corpus bit-identity
    suite re-run on the reference's real text."""
    from iresearch_spark.search import TermsF

    schema = (
        "repo string, path string, commit string, lang string, "
        "content string"
    )
    d = str(tmp_path / "idx_euro_wand")
    build_index(
        spark,
        spark.createDataFrame(europarl_rows, schema),
        d,
        num_segments=2,
    )
    eng = SearchEngine(spark, d)
    queries = [
        TermF(term="european"),
        Or(children=(TermF(term="the"), TermF(term="european"))),
        TermsF(terms=("the", "of", "european"), min_match=2),
    ]
    for q in queries:
        w = [tuple(r) for r in eng.search(q, k=10, wand=True).collect()]
        e = [tuple(r) for r in eng.search(q, k=10, wand=False).collect()]
        assert w == e, q


# ------------------------------------------------- by_range BM25 goldens


@pytest.fixture(scope="module")
def norm_engine(spark, order_engine):
    """The same single-segment order index scored by FULL default BM25
    (k=1.2, b=0.75, Norm2 dl) — the with-norms golden block of
    bm25_test.cpp:60-230 (irs::BM25{K(), B(), true} with the norm feature
    installed; the reference's Norm2-branch expectations apply: dl = value
    count per doc, exactly what our build's token-count dl records)."""
    return SearchEngine(spark, order_engine.index_dir, scorer=BM25())


def test_bm25_norm2_range_excl_incl_golden(norm_engine):
    """bm25_test.cpp:144 with norms: by_range ('6','8'] -> {7, 3, 0, 1, 5}
    — idf ('8' rarer than '7') and length normalization both bite."""
    q = TermRange(min_term="6", max_term="8",
                  include_min=False, include_max=True)
    assert _seq_order(norm_engine, q) == [7, 3, 0, 1, 5]


def test_bm25_norm2_range_incl_incl_golden(norm_engine):
    """bm25_test.cpp:196 NORM2 branch: by_range ['6','8'] ->
    {0, 7, 5, 3, 2, 1} (the legacy-Norm branch expects 7 first; Norm2's
    integer token-count dl is what our docmeta stores)."""
    q = TermRange(min_term="6", max_term="8",
                  include_min=True, include_max=True)
    assert _seq_order(norm_engine, q) == [0, 7, 5, 3, 2, 1]


@pytest.fixture(scope="module")
def normless_engine(spark, order_engine):
    """bm25_test.cpp test_query's EXACT scorer: the corpus indexes freq
    but no norm feature, so `bm25.cpp:488-490` pretends |doc| = 1 while
    avg_dl still comes from the real field stats — our
    ``BM25(norm="none")``. (BM15 = b=0 coincides on equal-tf cases but
    diverges on the [6,8] golden below: b=0 kills the avg_dl term the
    dl=1 branch keeps.)"""
    return SearchEngine(
        spark, order_engine.index_dir, scorer=BM25(norm="none")
    )


def test_normless_range_exclusive_both_golden(normless_engine):
    """bm25_test.cpp:939 (no-norm corpus): by_range ('6','8') -> only term
    '7' -> {0, 1, 5, 7}."""
    q = TermRange(min_term="6", max_term="8",
                  include_min=False, include_max=False)
    assert _seq_order(normless_engine, q) == [0, 1, 5, 7]


@pytest.mark.parametrize("limit", [0, 1])
def test_normless_range_scored_terms_limit_golden(normless_engine, limit):
    """bm25_test.cpp:992: by_range ['8','9') under scored_terms_limit 0
    and 1 -> {3, 7} either way."""
    q = TermRange(min_term="8", max_term="9",
                  include_min=True, include_max=False,
                  scored_terms_limit=limit)
    assert _seq_order(normless_engine, q) == [3, 7]


def test_normless_range_excl_incl_golden(normless_engine):
    """bm25_test.cpp:1044: by_range ('6','8'] -> {7, 3, 0, 1, 5} — tf
    saturation lets doc 3's rarer '8' outrank doc 0's tf=3 of '7'
    (TFIDF's sqrt(tf) orders these [7,0,1,3,5]; the divergence pins the
    saturating branch)."""
    q = TermRange(min_term="6", max_term="8",
                  include_min=False, include_max=True)
    assert _seq_order(normless_engine, q) == [7, 3, 0, 1, 5]


def test_normless_range_incl_incl_golden(normless_engine):
    """bm25_test.cpp:1095: by_range ['6','8'] -> {7, 0, 5, 3, 2, 1} — the
    one golden that separates the dl=1 fallback from plain BM15: under
    b=0 doc 0's tf=3 of '7' would overtake doc 7's rarer '8', and doc 1
    (tf=2) would overtake doc 2's single rarer '6'."""
    q = TermRange(min_term="6", max_term="8",
                  include_min=True, include_max=True)
    assert _seq_order(normless_engine, q) == [7, 0, 5, 3, 2, 1]


def test_normless_phrase_single_slot_golden(normless_engine):
    """bm25_test.cpp:1143: by_phrase of the single slot '7' ->
    {0, 1, 5, 7}."""
    assert _seq_order(normless_engine, Phrase(terms=("7",))) == [0, 1, 5, 7]


# ------------------------------------------------- wildcard (utf8 corpus)


@pytest.fixture(scope="module")
def utf8_engine(spark, tmp_path_factory):
    """simple_sequential_utf8.json (32 docs, one segment) with the string
    fields indexed under the identity analyzer — the reference indexes
    them as untokenized string_field values
    (`wildcard_filter_test.cpp:354-362`, generic_json_field_factory), so
    each value is exactly one term and the LIKE pattern semantics
    (including backslash escapes and multi-byte UTF-8) are exercised on
    reference-identical term bytes."""
    from iresearch_spark.search import Wildcard  # noqa: F401 (fixture doc)

    docs = _load("simple_sequential_utf8.json")
    d = str(tmp_path_factory.mktemp("idx_golden_utf8"))
    rows = [
        (
            "r",
            f"{doc['seq']:02d}.json",
            "c",
            "json",
            doc.get("same"),  # content: carries the manifest content hash
            doc.get("name"),
            doc.get("same"),
            doc.get("duplicated"),
            doc.get("prefix"),
            doc.get("utf8"),
        )
        for doc in docs
    ]
    schema = (
        "repo string, path string, commit string, lang string, "
        "content string, name string, same string, duplicated string, "
        "prefix string, utf8 string"
    )
    build_index(
        spark,
        spark.createDataFrame(rows, schema),
        d,
        num_segments=1,
        fields=[
            ("name", "identity"),
            ("same", "identity"),
            ("duplicated", "identity"),
            ("prefix", "identity"),
            ("utf8", "identity"),
        ],
    )
    return SearchEngine(spark, d, scorer=BM15)


def _seq_set(engine, filt):
    rows = engine.search(filt, k=None).collect()
    return {int(r["path"].split(".")[0]) for r in rows}


def test_wildcard_match_all_goldens(utf8_engine):
    """wildcard_filter_test.cpp:380-401 'match all': every pattern below
    matches all 32 docs' same='xyz'."""
    from iresearch_spark.search import Wildcard

    everyone = set(range(32))
    for pat in ("%", "___", "%_", "_%", "x_%", "__z", "%_z", "x%_",
                "x_z", "x%z", "_yz", "%yz", "xyz", "xyz%"):
        got = _seq_set(utf8_engine, Wildcard(field_name="same", pattern=pat))
        assert got == everyone, pat


def test_wildcard_match_nothing_goldens(utf8_engine):
    """wildcard_filter_test.cpp:404-408 + invalid field/prefix rows: the
    escaped-wildcard patterns are literal and match nothing; '_' cannot
    match a 3-char value; NULL field values index NO term, so the empty
    pattern matches nothing. The reference returns empty for an unknown
    field (schemaless model); this engine is schema-aware and raises — a
    deliberate, pinned divergence."""
    from iresearch_spark.search import Wildcard

    for field, pat in (
        ("prefix", r"ab\%"),
        ("same", r"x\_z"),
        ("same", r"x\%z"),
        ("same", "_"),
        ("duplicated", ""),
        ("same", "xyz_invalid%"),
    ):
        got = _seq_set(utf8_engine, Wildcard(field_name=field, pattern=pat))
        assert got == set(), (field, pat)
    with pytest.raises(KeyError):
        _seq_set(utf8_engine, Wildcard(field_name="same1", pattern="xyz%"))


def test_wildcard_escape_goldens(utf8_engine):
    """wildcard_filter_test.cpp:410-434: backslash escape semantics on
    prefix values J=r'ab\\%' and K=r'ab\\\\%' — escaped-backslash+wildcard
    hits both, escaped-backslash+escaped-%% hits J only, two escaped
    backslashes+wildcard hits K only (doc ids 10/11 -> seq 9/10)."""
    from iresearch_spark.search import Wildcard

    cases = [
        (r"ab\\%", {9, 10}),
        (r"ab\\\%", {9}),
        (r"ab\\\\%", {10}),
    ]
    for pat, want in cases:
        got = _seq_set(utf8_engine, Wildcard(field_name="prefix", pattern=pat))
        assert got == want, pat


def test_wildcard_pattern_set_goldens(utf8_engine):
    """wildcard_filter_test.cpp:447-509: the hard-coded match sets over
    'duplicated', 'prefix' and 'name' (reference doc ids are 1-based
    insertion order; seq = id - 1)."""
    from iresearch_spark.search import Wildcard

    cases = [
        ("duplicated", "v_z%", {1, 2, 7, 13, 16, 18, 23}),
        ("duplicated", "v%c", {1, 2, 7, 13, 16, 18, 23}),
        ("duplicated", "v%%%%%c", {1, 2, 7, 13, 16, 18, 23}),
        ("duplicated", "%c", {1, 2, 7, 13, 16, 18, 23}),
        ("duplicated", "%_c", {1, 2, 7, 13, 16, 18, 23}),
        ("duplicated", "vcz%", {1, 2, 7, 13, 16, 18, 23}),
        ("duplicated", "vcz%%%%%", {1, 2, 7, 13, 16, 18, 23}),
        ("duplicated", "a%", {0, 4, 10, 20, 26, 30}),
        ("prefix", "%c%", {0, 3, 8, 20, 25, 30, 31}),
        ("prefix", "%%c%%", {0, 3, 8, 20, 25, 30, 31}),
        ("prefix", "b%", {8, 23}),
        ("prefix", "abc%", {0, 3, 20, 25, 30, 31}),
        ("prefix", "a%d%", {0, 3, 15, 25}),
        ("name", "!%", {27}),
    ]
    for field, pat, want in cases:
        got = _seq_set(utf8_engine, Wildcard(field_name=field, pattern=pat))
        assert got == want, (field, pat)


def test_wildcard_utf8_goldens(utf8_engine):
    """wildcard_filter_test.cpp:512-528: multi-byte UTF-8 patterns —
    '%й' matches 'пуй' (seq 0) and 'вий' (seq 25); 'в%й' matches 'вий'
    only."""
    from iresearch_spark.search import Wildcard

    cases = [
        ("%й", {0, 25}),
        ("%%й", {0, 25}),
        ("в%й", {25}),
        ("в%%й", {25}),
    ]
    for pat, want in cases:
        got = _seq_set(utf8_engine, Wildcard(field_name="utf8", pattern=pat))
        assert got == want, pat


# ----------------------------------------- by_edit_distance (levenshtein)


@pytest.fixture(scope="module")
def lev_engine(spark, tmp_path_factory):
    """levenshtein_sequential.json (34 docs, one segment), field 'title'
    under the identity analyzer — the corpus of
    `levenshtein_filter_test.cpp` test_filter (:328-518); reference doc
    ids are 1-based insertion order, seq = id - 1."""
    docs = _load("levenshtein_sequential.json")
    d = str(tmp_path_factory.mktemp("idx_golden_lev"))
    rows = [
        ("r", f"{doc['seq']:02d}.json", "c", "json", doc["title"],
         doc["title"])
        for doc in docs
    ]
    schema = (
        "repo string, path string, commit string, lang string, "
        "content string, title string"
    )
    build_index(spark, spark.createDataFrame(rows, schema), d,
                num_segments=1, fields=[("title", "identity")])
    return SearchEngine(spark, d, scorer=BM15)


def _fz(term, dist, limit=1024, transpose=False, prefix=""):
    from iresearch_spark.search import Fuzzy

    return Fuzzy(field_name="title", term=term, max_distance=dist,
                 scored_terms_limit=limit, with_transpositions=transpose,
                 prefix=prefix)


def test_edit_distance_match_set_goldens(lev_engine):
    """levenshtein_filter_test.cpp:375-440 — plain Levenshtein match sets
    at distances 0-4 (limit 1024 and 0 agree everywhere here)."""
    cases = [
        (_fz("", 0), set()),
        (_fz("aa", 0), {26}),
        (_fz("ababab", 0), {16}),
        (_fz("", 1), {27, 28}),
        (_fz("aa", 1), {26, 27}),
        (_fz("ababab", 1), {16}),
        (_fz("", 2), {26, 27, 28}),
        (_fz("aa", 2), {26, 27, 28, 29, 31}),
        (_fz("ababab", 2), {16}),
        (_fz("", 3), {26, 27, 28, 29, 30}),
        (_fz("aaaa", 3, limit=10),
         {4, 6, 12, 15, 16, 17, 18, 20, 26, 27, 29, 31}),
        (_fz("aaaa", 3, limit=0),
         {4, 6, 12, 15, 16, 17, 18, 20, 26, 27, 29, 31}),
        (_fz("ababab", 3), {2, 4, 6, 12, 13, 14, 15, 16, 31}),
        (_fz("", 4), {26, 27, 28, 29, 30, 31}),
        (_fz("ababab", 4),
         {2, 3, 4, 5, 6, 9, 12, 13, 14, 15, 16, 17, 18, 20, 26, 29, 31, 33}),
    ]
    for filt, want in cases:
        got = _seq_set(lev_engine, filt)
        assert got == want, filt


def test_edit_distance_terms_limit_restricts_matches_goldens(lev_engine):
    """levenshtein_filter_test.cpp:383-397 + :196-221: a positive
    scored_terms_limit routes through top_terms_collector — only the best
    `limit` terms by (similarity boost, term bytes) MATCH at all. Both
    length-1 terms tie at boost 0 for target '', so the larger bytes win:
    limit 1 keeps 'b' (doc 29 -> seq 28) over 'a'."""
    assert _seq_set(lev_engine, _fz("", 1, limit=1)) == {28}
    assert _seq_set(lev_engine, _fz("", 2, limit=1)) == {28}
    assert _seq_set(lev_engine, _fz("", 2, limit=2)) == {27, 28}
    # limit 0 = match everything the automaton accepts
    assert _seq_set(lev_engine, _fz("", 2, limit=0)) == {26, 27, 28}


def test_edit_distance_damerau_goldens(lev_engine):
    """levenshtein_filter_test.cpp:470-512 — Damerau-Levenshtein match
    sets (adjacent transposition costs 1)."""
    cases = [
        (_fz("aa", 0, transpose=True), {26}),
        (_fz("", 1, transpose=True), {27, 28}),
        (_fz("aa", 1, transpose=True), {26, 27}),
        (_fz("ababab", 1, transpose=True), {16}),
        (_fz("aa", 2, transpose=True), {26, 27, 28, 29, 31}),
        (_fz("ababab", 2, transpose=True), {16, 17}),
        (_fz("", 3, transpose=True), {26, 27, 28, 29, 30}),
        (_fz("ababab", 3, transpose=True),
         {2, 4, 6, 12, 13, 14, 15, 16, 17, 31}),
    ]
    for filt, want in cases:
        got = _seq_set(lev_engine, filt)
        assert got == want, filt


def test_edit_distance_prefix_goldens(lev_engine):
    """levenshtein_filter_test.cpp:344-368 — Options::prefix: matched
    terms carry the prefix verbatim, the distance applies to the rest."""
    cases = [
        (_fz("", 0, prefix="aaaw"), {31}),
        (_fz("w", 0, prefix="aaa"), {31}),
        (_fz("w", 0, transpose=True, prefix="aaa"), {31}),
        (_fz("", 0, prefix=""), set()),
        (_fz("aa", 1, prefix="aaabbba"), {8, 9}),
        (_fz("", 1, prefix=""), {27, 28}),
        (_fz("ca", 2, prefix="b"), {28, 29}),
        (_fz("aa", 2, prefix="aa"), {4, 6, 12, 15, 18, 26, 31}),
        (_fz("", 3, prefix="aaa"), {4, 6, 12, 15, 18, 31}),
        (_fz("", 3, transpose=True, prefix="aaa"), {4, 6, 12, 15, 18, 31}),
    ]
    for filt, want in cases:
        got = _seq_set(lev_engine, filt)
        assert got == want, filt


# ------------------------------------------------- by_ngram_similarity


@pytest.fixture(scope="module")
def ngram_engine(spark, tmp_path_factory):
    """ngram_similarity.json (16 docs, one segment): each doc's `field`
    array of bigrams joined into one token stream — the corpus of
    `ngram_similarity_filter_tests.cpp`; here doc seq is 1-based already
    and equals the reference doc id."""
    docs = _load("ngram_similarity.json")
    d = str(tmp_path_factory.mktemp("idx_golden_ngram"))
    rows = [
        ("r", f"{doc['seq']:02d}.json", "c", "json", " ".join(doc["field"]))
        for doc in docs
    ]
    schema = (
        "repo string, path string, commit string, lang string, "
        "content string"
    )
    build_index(spark, spark.createDataFrame(rows, schema), d,
                num_segments=1)
    return SearchEngine(spark, d, scorer=BM15)


def test_ngram_similarity_match_set_goldens(ngram_engine):
    """ngram_similarity_filter_tests.cpp hard-coded match sets: LCS-based
    match degree over the query gram sequence, threshold gating — the
    no-match, no-serial-match, one-match (a lone 'ss' at 1/6 >= 0.1),
    missed-last/missed-first (absent terms still count in the
    denominator) and lower-threshold cases, verbatim."""
    from iresearch_spark.search import NGramSimilarity

    cases = [
        (("ee", "we", "qq", "rr", "ff", "never_match"), 0.1, set()),
        (("ee", "ss", "pa", "rr"), 0.5, set()),
        (("ee", "ss", "qq", "rr", "ff", "never_match"), 0.1,
         {1, 3, 5, 6, 7, 8, 9, 10, 12}),
        (("at", "tl", "la", "as", "ll", "never_match"), 0.5,
         {1, 2, 5, 8, 11, 12, 13}),
        (("never_match", "at", "tl", "la", "as", "ll"), 0.5,
         {1, 2, 5, 8, 11, 12, 13}),
        (("at", "tl", "la", "as", "ll", "never_match"), 0.33,
         set(range(1, 15))),
        (("at", "never_match", "la", "as", "ll"), 0.333,
         {1, 2, 3, 4, 5, 6, 7, 8, 11, 12, 13, 14}),
    ]
    for terms, thr, want in cases:
        got = _seq_set(
            ngram_engine, NGramSimilarity(terms=terms, threshold=thr)
        )
        assert got == want, (terms, thr)


# ------------------------------------------------------- by_phrase (variadic)


@pytest.fixture(scope="module")
def phrase_engine(spark, tmp_path_factory):
    """phrase_sequential.json under the reference test's analyzed field
    (`phrase_filter_tests.cpp:62-64` + `doc_generator.hpp:617-636`): the
    `text` analyzer with locale C and NO stopwords — registered here via
    register_analyzer, the reference's REGISTER_ANALYZER-with-options.
    One segment; path = doc name."""
    from functools import partial

    from iresearch_spark.analysis.analyzers import (
        register_analyzer,
        text_analyzer,
    )

    register_analyzer(
        "text_nostop", partial(text_analyzer, stopwords=frozenset())
    )
    docs = _load("phrase_sequential.json")
    d = str(tmp_path_factory.mktemp("idx_golden_phrase"))
    rows = [
        ("r", f"{doc['name']}.json", "c", "json", doc["phrase"])
        for doc in docs
    ]
    schema = (
        "repo string, path string, commit string, lang string, "
        "content string"
    )
    build_index(spark, spark.createDataFrame(rows, schema), d,
                num_segments=1, analyzer="text_nostop")
    return SearchEngine(spark, d, scorer=BM15)


def _name_set(engine, filt):
    rows = engine.search(filt, k=None).collect()
    return {r["path"].split(".")[0] for r in rows}


def test_phrase_single_slot_goldens(phrase_engine):
    """phrase_filter_tests.cpp:103-2117 — single-slot phrases collapse to
    the underlying leaf (term / prefix / wildcard / fuzzy / term-set /
    range), expected name sets verbatim."""
    from iresearch_spark.search import Fuzzy, TermsF, Wildcard

    fox_docs = {"A", "G", "I", "K", "L", "N", "S", "T", "V"}
    fo_docs = fox_docs | {"D", "H", "U", "W", "X", "Y"}
    cases = [
        (Phrase(terms=("fox",)), fox_docs),
        (Phrase(terms=(Prefix(prefix="fo"),)), fo_docs),
        (Phrase(terms=(Wildcard(pattern="fo%"),)), fo_docs),
        (Phrase(terms=(Wildcard(pattern="%ox"),)), fox_docs),
        (Phrase(terms=(Wildcard(pattern="f%x"),)), fox_docs),
        (Phrase(terms=(Wildcard(pattern="f_x"),)), fox_docs),
        (Phrase(terms=(Wildcard(pattern="fo_"),)), fox_docs),
        (Phrase(terms=(Wildcard(pattern="fox"),)), fox_docs),
        (Phrase(terms=(Fuzzy(term="fox", max_distance=0),)), fox_docs),
        (Phrase(terms=(Fuzzy(term="fol", max_distance=1),)), fox_docs),
        (Phrase(terms=(TermsF(terms=("fox",)),)), fox_docs),
        (Phrase(terms=(TermsF(terms=("fox", "that")),)),
         fox_docs | {"B", "D"}),
        (Phrase(terms=(TermRange(min_term="x0", max_term="x0"),)),
         {"X0", "X4"}),
        (Phrase(terms=(TermRange(min_term="x0", max_term="x2"),)),
         {"X0", "X1", "X2", "X3", "X4", "X5"}),
        (Phrase(terms=(TermRange(min_term="x0", max_term="x2",
                                 include_min=False),)),
         {"X1", "X2", "X3", "X4", "X5"}),
        (Phrase(terms=(TermRange(min_term="x0", max_term="x2",
                                 include_max=False),)),
         {"X0", "X1", "X3", "X4"}),
        (Phrase(terms=(TermRange(min_term="x0", max_term="x2",
                                 include_min=False, include_max=False),)),
         {"X1", "X3", "X4"}),
    ]
    for filt, want in cases:
        assert _name_set(phrase_engine, filt) == want, filt


def test_phrase_variadic_goldens(phrase_engine):
    """phrase_filter_tests.cpp:3327-4292 — three-slot phrases with a
    prefix / wildcard / fuzzy / range part in each position, expected
    name sets verbatim (e.g. 'qui* brown fox' pulls in S via 'quilt',
    'quick bro* fox' pulls in T via 'brother', 'quick brown fo*' pulls
    in U via 'forward')."""
    from iresearch_spark.search import Fuzzy, Wildcard

    agi = {"A", "G", "I"}
    cases = [
        (Phrase(terms=("quick", "brown", "fox")), agi),
        (Phrase(terms=(Prefix(prefix="qui"), "brown", "fox")), agi | {"S"}),
        (Phrase(terms=(Wildcard(pattern="qui%"), "brown", "fox")),
         agi | {"S"}),
        (Phrase(terms=(Wildcard(pattern="q%ck"), "brown", "fox")), agi),
        (Phrase(terms=(Fuzzy(term="quick", max_distance=0), "brown", "fox")),
         agi),
        (Phrase(terms=(Fuzzy(term="quck", max_distance=1), "brown", "fox")),
         agi),
        (Phrase(terms=("quick", Prefix(prefix="bro"), "fox")), agi | {"T"}),
        (Phrase(terms=("quick", Wildcard(pattern="bro%"), "fox")),
         agi | {"T"}),
        (Phrase(terms=("quick", Wildcard(pattern="b%w_"), "fox")), agi),
        (Phrase(terms=("quick", Fuzzy(term="brkln", max_distance=2), "fox")),
         agi),
        (Phrase(terms=("quick", "brown", Prefix(prefix="fo"))), agi | {"U"}),
        (Phrase(terms=("quick", "brown", Wildcard(pattern="fo%"))),
         agi | {"U"}),
        (Phrase(terms=("quick", "brown", Wildcard(pattern="f_x"))), agi),
        (Phrase(terms=("quick", "brown",
                       Fuzzy(term="fxo", max_distance=1,
                             with_transpositions=True))), agi),
        (Phrase(terms=(TermRange(min_term="x0", max_term="x1"),
                       "x0", "x2")), {"X4"}),
        (Phrase(terms=("x1", TermRange(min_term="x0", max_term="x1"),
                       "x2")), {"X4"}),
    ]
    for filt, want in cases:
        assert _name_set(phrase_engine, filt) == want, filt


# ------------------------------------------- by_same_position (multi-field)


@pytest.fixture(scope="module")
def same_pos_engine(spark, tmp_path_factory):
    """same_position.json (`same_position_filter_tests.cpp:196-233`): each
    doc's `array` elements land one token per element, in array order, in
    fields a/b/c (json_doc_generator flattens the nested objects), so
    position i of every field is array element i. One segment; path =
    str(_id)."""
    docs = _load("same_position.json")
    d = str(tmp_path_factory.mktemp("idx_golden_same_pos"))
    rows = [
        (
            "r", str(doc["_id"]), "c", "json",
            " ".join(el["a"] for el in doc["array"]),
            " ".join(el["b"] for el in doc["array"]),
            " ".join(el["c"] for el in doc["array"]),
        )
        for doc in docs
    ]
    schema = (
        "repo string, path string, commit string, lang string, "
        "a string, b string, c string"
    )
    corpus = spark.createDataFrame(rows, schema).selectExpr(
        "*", "a AS content"
    )
    build_index(spark, corpus, d, num_segments=1,
                fields=[("a", "code"), ("b", "code"), ("c", "code")])
    return SearchEngine(spark, d, scorer=BM15)


def _id_set(engine, filt):
    rows = engine.search(filt, k=None).collect()
    return {int(r["path"]) for r in rows}


def test_same_position_multifield_goldens(same_pos_engine):
    """same_position_filter_tests.cpp:219-573 over same_position.json —
    expected _id sets verbatim: {a:100,b:30,c:6} -> {6,27};
    {c:8,b:80,a:700} -> {14,91}; {a:700,c:7} -> the 13-doc list; the
    empty filter matches nothing (:227-238); {a:100} behaves exactly as
    by_term (:241-268); the first match of {a:300,b:90,c:9} is segment
    doc 1 = the corpus' first row, _id 0 (:270-287)."""
    from iresearch_spark.search import SamePosition

    assert _id_set(
        same_pos_engine,
        SamePosition(terms=(("a", "100"), ("b", "30"), ("c", "6"))),
    ) == {6, 27}
    assert _id_set(
        same_pos_engine,
        SamePosition(terms=(("c", "8"), ("b", "80"), ("a", "700"))),
    ) == {14, 91}
    assert _id_set(
        same_pos_engine,
        SamePosition(terms=(("a", "700"), ("c", "7"))),
    ) == {1, 6, 11, 17, 18, 23, 24, 28, 38, 51, 66, 79, 89}
    assert _id_set(same_pos_engine, SamePosition(terms=())) == set()
    got_300 = _id_set(
        same_pos_engine,
        SamePosition(terms=(("a", "300"), ("b", "90"), ("c", "9"))),
    )
    assert min(got_300) == 0
    assert _id_set(same_pos_engine, SamePosition(terms=(("a", "100"),))) \
        == _id_set(same_pos_engine, TermF(field_name="a", term="100"))


def test_same_position_scores_as_conjunction_sum(same_pos_engine):
    """The reference scores by_same_position EXACTLY like the conjunction
    over the same (field, term) postings — per-term CompileScore with own
    field/term stats + kSum merge (same_position_filter.cpp:160-181) —
    with the position check only gating matches (raw freq feeds the
    score). So on the surviving docs the scores must be bit-identical to
    And(TermF(a:'700'), TermF(c:'7'))."""
    from iresearch_spark.search import And, SamePosition

    sp = same_pos_engine.search(
        SamePosition(terms=(("a", "700"), ("c", "7"))), k=None
    ).toPandas().set_index("path")["score"]
    conj = same_pos_engine.search(
        And(children=(TermF(field_name="a", term="700"),
                      TermF(field_name="c", term="7"))), k=None
    ).toPandas().set_index("path")["score"]
    assert set(sp.index) <= set(conj.index)
    for p, s in sp.items():
        assert conj[p] == s, p


# --------------------------------------------------- by_terms (terms filter)


@pytest.fixture(scope="module")
def terms_engine(spark, tmp_path_factory):
    """simple_sequential_utf8.json under string_field semantics
    (`terms_filter_test.cpp:226-233` + generic_json_field_factory): every
    string value is ONE exact whole-value token — the `identity`
    analyzer. One segment; path = seq."""
    docs = _load("simple_sequential_utf8.json")
    d = str(tmp_path_factory.mktemp("idx_golden_terms"))
    rows = [
        (
            "r", str(doc["seq"]), "c", "json",
            doc.get("same"), doc.get("prefix"),
        )
        for doc in docs
    ]
    schema = (
        "repo string, path string, commit string, lang string, "
        "same string, prefix string"
    )
    corpus = spark.createDataFrame(rows, schema).selectExpr(
        "*", "coalesce(same, '') AS content"
    )
    build_index(spark, corpus, d, num_segments=1,
                fields=[("same", "identity"), ("prefix", "identity")])
    return SearchEngine(spark, d, scorer=BM15)


def test_by_terms_goldens(terms_engine):
    """terms_filter_test.cpp:226-374 (simple_sequential) — expected doc
    sets verbatim: the all-'xyz' `same` field matches all 32 docs; an
    invalid term alone matches nothing but doesn't break the set; the
    `prefix` set {abcd, abc, abcy} -> seq {0, 20, 30, 31}; duplicate
    terms are rejected (std::set keyed on term bytes); min_match = 0
    matches EVERY doc (terms_filter.cpp:156-180 all-docs disjunction)."""
    from iresearch_spark.search import TermsF

    all32 = set(range(32))
    assert _seq_set(terms_engine, TermsF(field_name="same",
                                         terms=(("xyz", 1.0),))) == all32
    # no value requested to match / invalid term -> empty
    assert _seq_set(terms_engine, TermsF(field_name="same", terms=())) == set()
    assert _seq_set(
        terms_engine,
        TermsF(field_name="same", terms=(("invalid_term", 0.5),)),
    ) == set()
    # invalid term alongside a matching one: still all docs
    assert _seq_set(
        terms_engine,
        TermsF(field_name="same",
               terms=(("xyz", 1.0), ("invalid_term", 0.5))),
    ) == all32
    # min_match = 0 -> match all even when the term can't match
    assert _seq_set(
        terms_engine,
        TermsF(field_name="same", terms=(("invalid", 1.0),), min_match=0),
    ) == all32
    want = {0, 20, 30, 31}
    assert _seq_set(
        terms_engine,
        TermsF(field_name="prefix",
               terms=(("abcd", 1.0), ("abc", 0.5), ("abcy", 0.5))),
    ) == want
    # duplicate terms are not allowed (first boost wins, set unchanged)
    assert _seq_set(
        terms_engine,
        TermsF(field_name="prefix",
               terms=(("abcd", 1.0), ("abcd", 0.0),
                      ("abc", 0.5), ("abcy", 0.5))),
    ) == want
    # non-existing term mixed in
    assert _seq_set(
        terms_engine,
        TermsF(field_name="prefix",
               terms=(("abcd", 1.0), ("invalid_term", 0.0),
                      ("abc", 0.5), ("abcy", 0.5))),
    ) == want


@pytest.fixture(scope="module")
def aw_engine(spark, tmp_path_factory):
    """AdventureWorks2014.json (`terms_filter_test.cpp:376-412`, the
    min_match segment): each doc's `Fields` array of column names indexes
    as one exact token per element — a space-joined string under a
    space-`delimiter` analyzer (case preserved, string_field parity).
    One segment; path = 1-based row id matching the reference's
    segment-local doc ids."""
    from functools import partial

    from iresearch_spark.analysis.analyzers import (
        delimiter_analyzer,
        register_analyzer,
    )

    register_analyzer("space_delim", partial(delimiter_analyzer,
                                             delimiter=" "))
    docs = _load("AdventureWorks2014.json")
    d = str(tmp_path_factory.mktemp("idx_golden_aw"))
    rows = [
        ("r", str(i + 1), "c", "json",
         " ".join(doc.get("Fields") or []))
        for i, doc in enumerate(docs)
    ]
    schema = (
        "repo string, path string, commit string, lang string, "
        "fields_col string"
    )
    corpus = spark.createDataFrame(rows, schema).selectExpr(
        "*", "fields_col AS content"
    )
    build_index(spark, corpus, d, num_segments=1,
                fields=[("fields_col", "space_delim")])
    return SearchEngine(spark, d, scorer=BM15)


def test_by_terms_min_match_goldens(aw_engine):
    """terms_filter_test.cpp:404-467 — by_terms min_match over the
    AdventureWorks2014 'Fields' column lists, expected segment doc ids
    verbatim: {BusinessEntityID, StartDate} @1 -> the 23-table list,
    @2 -> {21, 57} (also with an invalid term mixed in), @3 -> empty
    (also with a duplicated invalid term, which the term set collapses —
    min_match stays bounded by the DEDUPED size)."""
    from iresearch_spark.search import TermsF

    mm1 = {4, 5, 6, 7, 19, 20, 21, 22, 25, 27, 28, 29,
           30, 34, 38, 46, 52, 53, 57, 62, 65, 69, 70}
    both = ("BusinessEntityID", "StartDate")
    assert _seq_set(aw_engine, TermsF(field_name="fields_col",
                                      terms=both, min_match=1)) == mm1
    assert _seq_set(aw_engine, TermsF(field_name="fields_col",
                                      terms=both, min_match=2)) == {21, 57}
    assert _seq_set(
        aw_engine,
        TermsF(field_name="fields_col",
               terms=both + ("InvalidValue",), min_match=2),
    ) == {21, 57}
    assert _seq_set(aw_engine, TermsF(field_name="fields_col",
                                      terms=both, min_match=3)) == set()
    assert _seq_set(
        aw_engine,
        TermsF(field_name="fields_col",
               terms=both + ("InvalidValue0", "InvalidValue0"),
               min_match=3),
    ) == set()


# ----------------------------------------------------- by_prefix (match sets)


@pytest.fixture(scope="module")
def prefix_engine(spark, tmp_path_factory):
    """simple_sequential.json under string_field semantics
    (`prefix_filter_test.cpp:163-171`): name/same/duplicated/prefix are
    exact whole-value tokens (identity analyzer). One segment; path =
    seq."""
    docs = _load("simple_sequential.json")
    d = str(tmp_path_factory.mktemp("idx_golden_prefix"))
    rows = [
        (
            "r", str(doc["seq"]), "c", "json",
            doc.get("name"), doc.get("same"),
            doc.get("duplicated"), doc.get("prefix"),
        )
        for doc in docs
    ]
    schema = (
        "repo string, path string, commit string, lang string, "
        "name string, same string, duplicated string, prefix string"
    )
    corpus = spark.createDataFrame(rows, schema).selectExpr(
        "*", "coalesce(same, '') AS content"
    )
    build_index(
        spark, corpus, d, num_segments=1,
        fields=[("name", "identity"), ("same", "identity"),
                ("duplicated", "identity"), ("prefix", "identity")],
    )
    return SearchEngine(spark, d, scorer=BM15)


def test_by_prefix_match_set_goldens(prefix_engine):
    """prefix_filter_test.cpp:163-240 (by_prefix_order/match sets over
    simple_sequential.json) — expected doc sets verbatim, 1-based segment
    doc ids mapped to seq = id - 1. The empty prefix matches every doc
    HOLDING the field; an invalid prefix matches nothing; a whole stored
    value is its own prefix."""
    cases = [
        (("same", "xyz_invalid"), set()),
        (("same", "xyz"), set(range(32))),
        (("duplicated", ""),
         {0, 1, 2, 4, 7, 10, 13, 16, 18, 20, 23, 26, 30}),
        (("duplicated", "a"), {0, 4, 10, 20, 26, 30}),
        (("name", "!"), {27}),
        (("prefix", "b"), {8, 23}),
        (("duplicated", "vcz"), {1, 2, 7, 13, 16, 18, 23}),
        (("prefix", "abc"), {0, 3, 20, 25, 30, 31}),
        (("prefix", "bateradsfsfasdf"), {23}),
    ]
    for (fld, pref), want in cases:
        got = _seq_set(prefix_engine,
                       Prefix(field_name=fld, prefix=pref))
        assert got == want, (fld, pref)


def test_by_range_match_set_goldens(prefix_engine):
    """range_filter_test.cpp:626-1010 (by_range_sequential_cost) —
    expected doc sets verbatim over simple_sequential.json's single-char
    `name` field (A..Z plus punctuation and '~'), seq = doc id - 1.
    Covers unbounded bounds (match every doc holding the field), empty-
    string bounds (inclusive and exclusive both match all, ["",""] only
    the empty term), and every inclusive/exclusive corner of [A;B]-style
    ranges."""
    all32 = set(range(32))
    cases = [
        ((None, None, True, True), all32),            # name = (..;..)
        (("", None, True, True), all32),              # name = ["";..)
        (("", None, False, True), all32),             # name = ("";..]
        (("", "", True, True), set()),                # name = ["";""]
        (("A", None, True, True), set(range(27))),    # name = [A;..)
        (("A", None, False, True), set(range(1, 27))),
        ((None, "C", True, False), {0, 1, 27, 28, 29, 30, 31}),
        ((None, "C", True, True), {0, 1, 2, 27, 28, 29, 30, 31}),
        (("A", "C", True, True), {0, 1, 2}),
        (("A", "B", True, True), {0, 1}),
        (("A", "B", True, False), {0}),
        (("A", "B", False, True), {1}),
        (("A", "B", False, False), set()),
        (("A", "C", True, False), {0, 1}),
        (("A", "C", False, True), {1, 2}),
        (("A", "C", False, False), {1}),
        (("~", None, True, True), {26}),              # name = [~;..]
        (("a", None, False, True), {26}),             # name = (a;..]
        ((None, "a", True, True), all32 - {26}),      # name = [..;a]
        ((None, "a", True, False), all32 - {26}),     # name = [..;a)
    ]
    for (mn, mx, imin, imax), want in cases:
        got = _seq_set(
            prefix_engine,
            TermRange(field_name="name", min_term=mn, max_term=mx,
                      include_min=imin, include_max=imax),
        )
        assert got == want, (mn, mx, imin, imax)


# --------------------------------------- by_granular_range (double trie)


@pytest.fixture(scope="module")
def granular_engine(spark, tmp_path_factory):
    """granular_sequential.json (`granular_range_filter_tests.cpp:245-
    464` by_range_granularity_level): `value` indexed as a DOUBLE
    numeric_token_stream — the `numeric_double` sortable-bits trie. One
    segment; path = 1-based doc id matching the reference's expected
    ids."""
    docs = _load("granular_sequential.json")
    d = str(tmp_path_factory.mktemp("idx_golden_granular"))
    rows = [
        ("r", str(i + 1), "c", "json", doc["name"], float(doc["value"]))
        for i, doc in enumerate(docs)
    ]
    schema = (
        "repo string, path string, commit string, lang string, "
        "name string, value double"
    )
    corpus = spark.createDataFrame(rows, schema).selectExpr(
        "*", "name AS content"
    )
    build_index(spark, corpus, d, num_segments=1,
                fields=[("name", "identity"), ("value", "numeric_double")])
    return SearchEngine(spark, d, scorer=BM15)


def test_granular_range_double_goldens(granular_engine):
    """granular_range_filter_tests.cpp:264-464 — expected doc ids
    verbatim for double-typed granular ranges over values
    [1, 100, 1000, 10000, 10000.123, 10000.456, 10005, 20007, -30000,
    -10004, -123, -456]. Open bounds are the reference's
    numeric_traits<double>::inf/ninf sentinel streams = literal
    +-inf here."""
    from iresearch_spark.search import GranularRange

    inf = float("inf")
    cases = [
        # double - value = [-20000..+20000]
        ((-20000.0, 20000.0, True, True),
         {1, 2, 3, 4, 5, 6, 7, 10, 11, 12}),
        # double - value > 100  (min exclusive, max = inf inclusive)
        ((100.0, inf, False, True), {3, 4, 5, 6, 7, 8}),
        # double - value >= 100
        ((100.0, inf, True, True), {2, 3, 4, 5, 6, 7, 8}),
        # double - value >= 20007 (largest value)
        ((20007.0, inf, True, True), {8}),
        # double - value < 10000.123  (min = ninf, max exclusive)
        ((-inf, 10000.123, True, False), {1, 2, 3, 4, 9, 10, 11, 12}),
        # double - value <= 10000.123
        ((-inf, 10000.123, True, True), {1, 2, 3, 4, 5, 9, 10, 11, 12}),
        # all documents
        ((-inf, inf, True, True), set(range(1, 13))),
    ]
    for (mn, mx, imin, imax), want in cases:
        got = _seq_set(
            granular_engine,
            GranularRange(field_name="value", min_val=mn, max_val=mx,
                          include_min=imin, include_max=imax),
        )
        assert got == want, (mn, mx, imin, imax)


# --------------------------------- by_column_existence (prefix acceptor)


@pytest.fixture(scope="module")
def exists_engine(spark, tmp_path_factory):
    """simple_sequential_common_prefix.json
    (`column_existence_filter_test.cpp:570-830`): every key becomes an
    indexed identity field so field presence == the reference's column
    presence. One segment; path = the doc's `name`."""
    docs = _load("simple_sequential_common_prefix.json")
    keys = sorted({k for doc in docs for k in doc} - {"name"})
    d = str(tmp_path_factory.mktemp("idx_golden_exists"))
    rows = [
        tuple(["r", doc["name"], "c", "json", doc["name"]]
              + [doc.get(k) for k in keys])
        for doc in docs
    ]
    schema = (
        "repo string, path string, commit string, lang string, "
        "content string, " + ", ".join(f"`{k}` string" for k in keys)
    )
    build_index(
        spark, spark.createDataFrame(rows, schema), d, num_segments=1,
        fields=[("content", "identity")]
        + [(k, "identity") for k in keys],
    )
    return SearchEngine(spark, d, scorer=BM15)


def test_column_existence_prefix_goldens(exists_engine):
    """column_existence_filter_test.cpp:585-830 — prefix-mode
    by_column_existence over the common-prefix corpus, expected doc names
    verbatim: foo* -> {A,C,D,J,K,L,R,S,T,U,V,!,%}; koob* -> {B,U,V,X,Z};
    oob* -> {Z,~,@,#,$}; a prefix matching no column -> empty; exact
    single-field mode still behaves as plain existence."""
    from iresearch_spark.search import ExistsF

    def got(prefix):
        rows = exists_engine.search(
            ExistsF(field_name=prefix, prefix_match=True), k=None
        ).collect()
        return {r["path"] for r in rows}

    assert got("foo") == {"A", "C", "D", "J", "K", "L", "R", "S", "T",
                          "U", "V", "!", "%"}
    assert got("koob") == {"B", "U", "V", "X", "Z"}
    assert got("oob") == {"Z", "~", "@", "#", "$"}
    assert got("no_such_prefix") == set()
    # exact mode on one of the prefixed fields for contrast
    exact = exists_engine.search(
        ExistsF(field_name="koobar"), k=None
    ).collect()
    names = {r["path"] for r in exact}
    docs = _load("simple_sequential_common_prefix.json")
    assert names == {doc["name"] for doc in docs if "koobar" in doc}


def test_column_existence_prefix_scores_sum_per_field(exists_engine):
    """The prefix disjunction merges kSum
    (column_existence_filter.cpp:118-126): a doc holding n prefix-matched
    fields scores n * boost."""
    from iresearch_spark.search import ExistsF

    rows = exists_engine.search(
        ExistsF(field_name="foo", prefix_match=True, boost=2.0), k=None
    ).collect()
    docs = _load("simple_sequential_common_prefix.json")
    n_by_name = {
        doc["name"]: sum(1 for k in doc if k.startswith("foo"))
        for doc in docs
    }
    for r in rows:
        assert r["score"] == pytest.approx(2.0 * n_by_name[r["path"]])


# ------------------------------------------------- boolean trees (Or/And/Not)


def test_boolean_or_goldens(prefix_engine):
    """boolean_filter_tests.cpp:15493-15726 (or_sequential) — expected doc
    sets verbatim over simple_sequential.json, seq = doc id - 1. Pins the
    reference's group_filters semantics: a Not child of an Or EXCLUDES
    from the whole disjunction (adding a zero-boost all-docs include), an
    explicit min_match = 0 matches everything even with no children,
    `all` children count toward min_match, and a net-negated match-all
    empties the whole boolean."""
    from functools import partial

    from iresearch_spark.search import All, Empty, Not, TermsF  # noqa: F401

    T = partial(TermF, field_name="name")
    all32 = set(range(32))
    xyz = partial(TermF, field_name="same")
    dup = partial(TermF, field_name="duplicated")
    cases = [
        (Or(children=()), set()),
        (Or(children=(T(term="V"),)), {21}),
        (Or(children=(T(term="W"), T(term="C"))), {2, 22}),
        (Or(children=(T(term="A"), T(term="Q"), T(term="Z"))),
         {0, 16, 25}),
        # name=A OR name=Q OR (single-branch Or wrapping NOT same=xyz):
        # the wrapped negation complements to nothing
        (Or(children=(T(term="A"), T(term="Q"),
                      Or(children=(Not(child=xyz(term="xyz")),)))),
         {0, 16}),
        (Or(children=(T(term="A"), T(term="Q"), T(term="Z"),
                      xyz(term="invalid_term"))), {0, 16, 25}),
        (Or(children=(T(term="A"), T(term="Q"), T(term="Z"),
                      xyz(term="xyz"), xyz(term="invalid_term"))), all32),
        # min match count == 0 -> every doc, with or without children
        (Or(children=(T(term="V"),), min_match=0), all32),
        (Or(children=(), min_match=0), all32),
        # min_match greater than the number of conditions
        (Or(children=(T(term="A"), T(term="Q"), T(term="Z"),
                      xyz(term="xyz"), xyz(term="invalid_term")),
            min_match=6), set()),
        # name=A OR false
        (Or(children=(T(term="A"), Empty())), {0}),
        # name!=A OR false -> everything but A (Not excludes from the Or)
        (Or(children=(Not(child=T(term="A")), Empty())), all32 - {0}),
        (Or(children=(Not(child=T(term="A")),
                      xyz(term="NOT POSSIBLE"))), all32 - {0}),
        # `all` children count toward min_match: 2 term hits + 3 alls = 5
        (Or(children=(T(term="A"), All(), All(), All(),
                      dup(term="abcd")), min_match=5), {0}),
        # more alls than min_match -> every doc
        (Or(children=(T(term="A"), All(), All(), All(), All(), All(),
                      All(), All(), All(), dup(term="abcd")),
            min_match=3), all32),
        # * OR NOT * -> a net-negated match-all empties the boolean
        (Or(children=(All(), Not(child=All()))), set()),
    ]
    for filt, want in cases:
        assert _seq_set(prefix_engine, filt) == want, filt


def test_boolean_and_not_goldens(prefix_engine):
    """boolean_filter_tests.cpp:15768-16055 (and_sequential +
    not_standalone_sequential) — expected doc sets verbatim: conjunction
    chains, the empty And, standalone Not (complement), odd/even
    negation-chain collapse, and * AND NOT *."""
    from functools import partial

    from iresearch_spark.search import All, And, Not

    T = partial(TermF, field_name="name")
    xyz = partial(TermF, field_name="same")
    dup = partial(TermF, field_name="duplicated")
    abcd_docs = {0, 4, 10, 20, 26, 30}
    nested5 = Not(child=Not(child=Not(child=Not(child=Not(
        child=T(term="A"))))))
    cases = [
        (And(children=()), set()),
        (And(children=(T(term="V"),)), {21}),
        (And(children=(dup(term="abcd"), xyz(term="xyz"))), abcd_docs),
        (And(children=(dup(term="abcd"), xyz(term="xyz"), T(term="A"))),
         {0}),
        (And(children=(dup(term="abcd"), xyz(term="xyz"), T(term="B"))),
         set()),
        # single not statement - empty result (complement of match-all)
        (Not(child=xyz(term="xyz")), set()),
        # duplicated=abcd AND (NOT (NOT name=A)) — even chain collapses
        (And(children=(dup(term="abcd"),
                       Not(child=Not(child=T(term="A"))))), {0}),
        # five-deep chain is odd -> NOT name=A
        (And(children=(dup(term="abcd"), nested5)),
         abcd_docs - {0}),
        # * AND NOT *
        (And(children=(All(), Not(child=All()))), set()),
    ]
    for filt, want in cases:
        assert _seq_set(prefix_engine, filt) == want, filt


# --------------------------------------------- ByNestedFilter (block join)


@pytest.fixture(scope="module")
def nested_tables(spark):
    """The NestedFilterTestCase dataset (`nested_filter_test.cpp:308-359`):
    five orders inserted items-first, parents = docs holding `customer`
    (doc ids 6, 8, 13, 20). The April order at doc 15 has NO customer, so
    its Mouse (doc 14) — and the dangling date-doc 15 itself — belong to
    the NEXT parent, BAE at doc 20 (the reference's prev-parent block
    rule). parent_id below encodes exactly that assignment."""
    parents = spark.createDataFrame(
        [(6, "ArangoDB", "May"), (8, "Quest", "June"),
         (13, "Dell", "April"), (20, "BAE", "March")],
        "doc int, customer string, date string",
    )
    rows = [
        (1, 6, "Keyboard", 100, 1), (2, 6, "Mouse", 50, 2),
        (3, 6, "Display", 1000, 2), (4, 6, "CPU", 5000, 1),
        (5, 6, "RAM", 5000, 1),
        (7, 8, "CPU", 1000, 3),
        (9, 13, "Mouse", 10, 2), (10, 13, "Display", 1000, 2),
        (11, 13, "CPU", 1000, 2), (12, 13, "RAM", 5000, 2),
        (14, 20, "Mouse", 10, 2), (15, 20, None, None, None),
        (16, 20, "Stand", 10, 2), (17, 20, "Display", 1000, 2),
        (18, 20, "CPU", 1000, 2), (19, 20, "RAM", 5000, 2),
    ]
    children = spark.createDataFrame(
        rows, "doc int, parent_id int, item string, price int, count int"
    )
    return parents, children


def test_nested_filter_goldens(nested_tables):
    """nested_filter_test.cpp JoinAny0-3 / JoinMin0-3 / JoinRange0-2 /
    JoinNone0-3 — expected parent doc ids verbatim, including the
    orphaned-order artifact (BAE matches item=Mouse through the
    customer-less April order's child)."""
    from pyspark.sql import functions as F

    from iresearch_spark.search.nested import nested_match

    parents, children = nested_tables

    def ids(pred, lo=1, hi=None):
        sub = children.filter(pred) if pred is not None else children
        rows = nested_match(parents, sub, "doc", "parent_id",
                            lo=lo, hi=hi).collect()
        return {r["doc"] for r in rows}

    mouse = F.col("item") == "Mouse"
    cnt = F.col("count")
    cases = [
        ((F.col("item") == "Keyboard", 1, None), {6}),        # JoinAny0
        ((mouse, 1, None), {6, 13, 20}),                      # JoinAny1
        ((mouse & (F.col("price") <= 11), 1, None), {13, 20}),  # JoinAny2
        ((cnt == 2, 1, None), {6, 13, 20}),                   # JoinAny3
        ((cnt == 2, 3, None), {13, 20}),                      # JoinMin0
        ((cnt == 1, 3, None), {6}),                           # JoinMin1
        ((cnt == 1, 0, None), {6, 8, 13, 20}),                # JoinMin2
        ((cnt == 42, 0, None), {6, 8, 13, 20}),               # JoinMin3
        ((cnt == 2, 3, 5), {13, 20}),                         # JoinRange0
        ((cnt == 1, 3, 3), {6}),                              # JoinRange1
        ((cnt == 2, 0, 5), {6, 8, 13, 20}),                   # JoinRange2
        ((mouse, 0, 0), {8}),                                 # JoinNone0/1
        ((F.lit(False), 0, 0), {6, 8, 13, 20}),               # JoinNone2/3
    ]
    for (pred, lo, hi), want in cases:
        assert ids(pred, lo, hi) == want, (lo, hi, want)
