"""Pure-Python golden reference: tokenize → tf → BM25 top-k.

Mirrors the reference engine's semantics exactly where they exist —
lowercase fold (cli.rs:384-386), term counting (``More``,
search.rs:267-283), conjunctive drop (cli.rs:405-408), additive scoring
(cli.rs:391-412), descending sort (cli.rs:495-496) — generalized to
BM25 (k1=1.2, b=0.75) per the north star. The distributed engine must be
**rank-identical** to this implementation: same top-k doc_ids AND same
float64 scores.

Determinism contract (shared with the distributed paths):
- query terms are deduplicated and processed in sorted order;
- per-document score accumulates in that term order, float64;
- ties broken by ascending doc_id (the reference's tie order is an
  artifact of its sort-then-reverse, SURVEY.md §7 "hard parts" (e));
- idf = ln(1 + (N − df + 0.5)/(df + 0.5)), the Lucene/standard
  non-negative BM25 idf.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from lsearch_ray.analyzer import term_counts, term_positions, tokenize

K1 = 1.2
B = 0.75


@dataclass
class GoldenIndex:
    """In-memory inverted index over a tiny corpus (tests only)."""

    n_docs: int = 0
    total_dl: int = 0
    postings: dict[str, dict[int, int]] = field(default_factory=dict)  # term -> {doc: tf}
    dl: dict[int, int] = field(default_factory=dict)
    positions: dict[str, dict[int, list[int]]] = field(default_factory=dict)

    @property
    def avgdl(self) -> float:
        return self.total_dl / self.n_docs if self.n_docs else 0.0

    def add(self, doc_id: int, text: str) -> None:
        counts = term_counts(text)
        self.n_docs += 1
        length = sum(counts.values())
        self.dl[doc_id] = length
        self.total_dl += length
        for term, tf in counts.items():
            self.postings.setdefault(term, {})[doc_id] = tf
        for term, plist in term_positions(text).items():
            self.positions.setdefault(term, {})[doc_id] = plist

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def bm25(
        self, query: str, k: int = 10, mode: str = "or"
    ) -> list[tuple[int, float]]:
        """Top-k ``(doc_id, score)``, scores float64, ties by doc_id asc.

        ``mode="and"`` keeps only docs containing every query term
        (the reference's conjunctive short-circuit, cli.rs:405-408);
        ``mode="or"`` is standard disjunctive BM25. ``-term`` clauses
        exclude any doc containing that term (analyzer.parse_query).
        """
        from lsearch_ray.analyzer import parse_query

        terms, excluded = parse_query(query)
        if not terms:
            return []
        banned: set[int] = set()
        for term in excluded:
            banned.update(self.postings.get(term, {}))
        scores: dict[int, float] = {}
        hits: dict[int, int] = {}
        for term in terms:
            plist = self.postings.get(term, {})
            w = self.idf(term)
            for doc_id, tf in plist.items():
                if doc_id in banned:
                    continue
                norm = tf * (K1 + 1.0) / (
                    tf + K1 * (1.0 - B + B * self.dl[doc_id] / self.avgdl)
                )
                scores[doc_id] = scores.get(doc_id, 0.0) + w * norm
                hits[doc_id] = hits.get(doc_id, 0) + 1
        if mode == "and":
            scores = {d: s for d, s in scores.items() if hits[d] == len(terms)}
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]


    def phrase_docs(self, phrase_terms: list[str]) -> set[int]:
        """Docs containing the exact token sequence (adjacent positions)."""
        if not phrase_terms:
            return set()
        first = self.positions.get(phrase_terms[0], {})
        out: set[int] = set()
        for doc_id, pos0 in first.items():
            cand = set(pos0)
            for off, term in enumerate(phrase_terms[1:], start=1):
                nxt = self.positions.get(term, {}).get(doc_id)
                if not nxt:
                    cand = set()
                    break
                cand &= {p - off for p in nxt}
                if not cand:
                    break
            if cand:
                out.add(doc_id)
        return out

    def bm25_full(
        self, query: str, k: int = 10, mode: str = "or"
    ) -> list[tuple[int, float]]:
        """Extended grammar: ``bm25`` semantics plus quoted phrases —
        phrases restrict results to docs containing the exact sequence
        (their words still score as ordinary terms); ``-"..."`` drops any
        doc containing the negated phrase."""
        from lsearch_ray.analyzer import parse_query_full

        inc, exc, phrases, neg_phrases = parse_query_full(query)
        base_query = " ".join(inc + [f"-{t}" for t in exc])
        ranked = self.bm25(base_query, k=10**9, mode=mode)
        allowed: set[int] | None = None
        for p in phrases:
            docs = self.phrase_docs(p)
            allowed = docs if allowed is None else (allowed & docs)
        banned: set[int] = set()
        for p in neg_phrases:
            banned |= self.phrase_docs(p)
        out = [
            (d, s)
            for d, s in ranked
            if (allowed is None or d in allowed) and d not in banned
        ]
        return out[:k]

    def phrase_bm25(self, phrase: str, k: int = 10) -> list[tuple[int, float]]:
        """Top-k docs CONTAINING the exact phrase, ranked by BM25 over the
        phrase's (deduped, sorted) terms — the same scoring/determinism
        contract as ``bm25``, restricted to phrase matches."""
        phrase_terms = tokenize(phrase)
        matched = self.phrase_docs(phrase_terms)
        if not matched:
            return []
        scores: dict[int, float] = {}
        for term in sorted(set(phrase_terms)):
            plist = self.postings.get(term, {})
            w = self.idf(term)
            for doc_id in sorted(matched):
                tf = plist.get(doc_id)
                if not tf:
                    continue
                norm = tf * (K1 + 1.0) / (
                    tf + K1 * (1.0 - B + B * self.dl[doc_id] / self.avgdl)
                )
                scores[doc_id] = scores.get(doc_id, 0.0) + w * norm
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]


def golden_index(doc_ids: list[int], texts: list[str]) -> GoldenIndex:
    idx = GoldenIndex()
    for d, t in zip(doc_ids, texts):
        idx.add(d, t)
    return idx
