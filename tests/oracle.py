"""Independent naive-Python BM25 engine — the rank-identity oracle (F5).

Shares NO indexing/scoring code with iresearch_spark (only the filter AST
dataclasses as the query description language). Implements the exact BM25
float32 semantics of the reference (`core/search/bm25.cpp:319-410`):
dict-of-lists inverted index, global stats, score = c0 - c0*c1/(c1+tf) with
float32 operation order, ties broken by (segment_id, doc_id) ascending.
"""

from __future__ import annotations

import binascii
import re

import numpy as np
import pandas as pd

from iresearch_spark.search.filters import (
    All,
    And,
    Empty,
    Fuzzy,
    Not,
    Or,
    Phrase,
    Prefix,
    TermF,
    TermRange,
    TermsF,
    Wildcard,
)

TOKEN_RE = re.compile(r"[a-z_][a-z0-9_]*|[0-9]+")
F32 = np.float32


def levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def like_to_regex(pattern: str) -> re.Pattern:
    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return re.compile("^" + "".join(out) + "$")


class OracleEngine:
    def __init__(self, corpus: pd.DataFrame, num_segments: int, k: float = 1.2,
                 b: float = 0.75, tokenize=None):
        """``tokenize``: optional callable str -> list[str] replacing the
        default code tokenizer (for analyzer variants, e.g. `text`)."""
        self.k, self.b = k, b
        self._tokenize = tokenize
        self.num_segments = num_segments
        corpus = corpus.copy()
        corpus["segment_id"] = [
            binascii.crc32("\x00".join([r, p, c]).encode()) % num_segments
            for r, p, c in zip(corpus["repo"], corpus["path"], corpus["commit"])
        ]
        self.postings: dict[str, dict[tuple[int, int], list[int]]] = {}
        self.dl: dict[tuple[int, int], int] = {}
        self.identity: dict[tuple[int, int], tuple[str, str, str]] = {}
        for seg, g in corpus.groupby("segment_id"):
            g = g.sort_values(["repo", "path", "commit"])
            for local, (_, row) in enumerate(g.iterrows(), start=1):
                key = (int(seg), local)
                toks = (
                    self._tokenize(row["content"])
                    if self._tokenize is not None
                    else TOKEN_RE.findall(row["content"].lower())
                )
                self.dl[key] = len(toks)
                self.identity[key] = (row["repo"], row["path"], row["commit"])
                for pos, t in enumerate(toks):
                    self.postings.setdefault(t, {}).setdefault(key, []).append(pos)
        self.N = sum(1 for v in self.dl.values() if v > 0)
        self.total_tf = sum(self.dl.values())
        kf, bf = F32(k), F32(b)
        kb = F32(kf * bf)
        self.norm_const = F32(kf - kb)
        avgdl = F32(F32(self.total_tf) / F32(self.N))
        self.norm_length = F32(kb / avgdl)
        self.vocab = sorted(self.postings)

    def idf(self, df: int) -> F32:
        return F32(np.log1p((float(self.N - df) + 0.5) / (float(df) + 0.5)))

    def c0(self, boost: float, idf: F32) -> F32:
        return F32(F32(boost) * F32(F32(self.k) + F32(1.0)) * idf)

    def score_one(self, freq: int, dl: int, c0: F32) -> F32:
        tf = F32(freq)
        c1 = F32(self.norm_const + F32(self.norm_length * F32(dl)))
        return F32(c0 - F32(F32(c0 * c1) / F32(c1 + tf)))

    # evaluation returns dict key -> (score F32, matched True)
    def _term_docs(self, term: str) -> dict[tuple[int, int], int]:
        return {k: len(v) for k, v in self.postings.get(term, {}).items()}

    def _scored_union(self, term_boosts: list[tuple[str, float, bool]], min_match: int):
        per_term = []
        for term, boost, scored in term_boosts:
            df = len(self.postings.get(term, {}))
            c0 = self.c0(boost, self.idf(df)) if scored else None
            per_term.append((term, c0))
        acc: dict = {}
        cnt: dict = {}
        for term, c0 in per_term:
            for key, positions in self.postings.get(term, {}).items():
                s = (
                    self.score_one(len(positions), self.dl[key], c0)
                    if c0 is not None
                    else F32(0.0)
                )
                acc[key] = F32(acc.get(key, F32(0.0)) + s)
                cnt[key] = cnt.get(key, 0) + 1
        return {k: v for k, v in acc.items() if cnt[k] >= min_match}

    def eval(self, node, boost: float = 1.0) -> dict:
        b = boost * node.boost
        if isinstance(node, Empty):
            return {}
        if isinstance(node, All):
            return {k: F32(0.0) for k in self.dl}
        if isinstance(node, TermF):
            return self._scored_union([(node.term, b, True)], 1)
        if isinstance(node, TermsF):
            return self._scored_union(
                [(t, F32(b * tb), True) for t, tb in node.pairs()],
                node.min_match,
            )
        if isinstance(node, (Prefix, Wildcard, TermRange, Fuzzy)):
            matched = self._expand(node)
            matched.sort(key=lambda td: (-td[1], td[0]))
            limit = node.scored_terms_limit
            tb = [(t, b, i < limit) for i, (t, _) in enumerate(matched)]
            if not tb:
                return {}
            return self._scored_union(tb, 1)
        if isinstance(node, Or):
            if all(isinstance(c, TermF) for c in node.children):
                return self._scored_union(
                    [(c.term, b * c.boost, True) for c in node.children],
                    node.min_match,
                )
            # a Not child excludes from the WHOLE disjunction and adds a
            # zero-boost all-docs include per negation (group_filters,
            # boolean_filter.cpp:105-128)
            pos = [c for c in node.children if not isinstance(c, Not)]
            neg = [c.child for c in node.children if isinstance(c, Not)]
            parts = [self.eval(c, b) for c in pos] + [
                self.eval(All(), F32(0.0)) for _ in neg
            ]
            acc: dict = {}
            cnt: dict = {}
            for p in parts:
                for key, s in p.items():
                    acc[key] = F32(acc.get(key, F32(0.0)) + s)
                    cnt[key] = cnt.get(key, 0) + 1
            out = {k: v for k, v in acc.items() if cnt[k] >= node.min_match}
            for n in neg:
                for key in self.eval(n, b):
                    out.pop(key, None)
            return out
        if isinstance(node, And):
            pos = [c for c in node.children if not isinstance(c, Not)]
            neg = [c.child for c in node.children if isinstance(c, Not)]
            if not pos:
                pos_res = [self.eval(All(), b)]
            else:
                pos_res = [self.eval(c, b) for c in pos]
            keys = set(pos_res[0])
            for p in pos_res[1:]:
                keys &= set(p)
            for n in neg:
                keys -= set(self.eval(n, b))
            mt = getattr(node, "merge_type", "sum")
            out = {}
            for key in keys:
                if mt == "sum":
                    s = F32(0.0)
                    for p in pos_res:  # child order
                        s = F32(s + p[key])
                elif mt == "max":
                    s = max(p[key] for p in pos_res)
                else:
                    s = min(p[key] for p in pos_res)
                out[key] = s
            return out
        if isinstance(node, Not):
            return self.eval(And(children=(All(), node)), boost)
        if isinstance(node, Phrase):
            idf_sum = F32(0.0)
            for t in node.terms:
                idf_sum = F32(idf_sum + self.idf(len(self.postings.get(t, {}))))
            c0 = self.c0(b, idf_sum)
            sets = [self.postings.get(t, {}) for t in node.terms]
            keys = set(sets[0])
            for s_ in sets[1:]:
                keys &= set(s_)
            slot_pos = node.positions()
            out = {}
            for key in keys:
                m = {p - slot_pos[0] for p in sets[0][key]}
                for i, s_ in enumerate(sets[1:], start=1):
                    m &= {p - slot_pos[i] for p in s_[key]}
                    if not m:
                        break
                if m:
                    out[key] = self.score_one(len(m), self.dl[key], c0)
            return out
        raise TypeError(node)

    def _expand(self, node) -> list[tuple[str, int]]:
        if isinstance(node, Prefix):
            pred = lambda t: t.startswith(node.prefix)  # noqa: E731
        elif isinstance(node, Wildcard):
            rx = like_to_regex(node.pattern)
            pred = lambda t: rx.match(t) is not None  # noqa: E731
        elif isinstance(node, TermRange):
            def pred(t):
                if node.min_term is not None:
                    if t < node.min_term or (t == node.min_term and not node.include_min):
                        return False
                if node.max_term is not None:
                    if t > node.max_term or (t == node.max_term and not node.include_max):
                        return False
                return True
        elif isinstance(node, Fuzzy):
            def pred(t):
                if abs(len(t) - len(node.term)) > node.max_distance:
                    return False
                return levenshtein(t, node.term) <= node.max_distance
        else:
            raise TypeError(node)
        return [(t, len(self.postings[t])) for t in self.vocab if pred(t)]

    def search(self, f, k: int = 10) -> list[tuple[str, str, str, float]]:
        res = self.eval(f)
        ranked = sorted(res.items(), key=lambda kv: (-float(kv[1]), kv[0][0], kv[0][1]))
        return [
            (*self.identity[key], float(s), key[0], key[1]) for key, s in ranked[:k]
        ]
