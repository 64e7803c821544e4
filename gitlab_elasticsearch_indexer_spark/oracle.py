"""Single-node pure-Python reference engine (the rank-identity referee).

Implements the exact scoring the Spark engine must reproduce: Lucene BM25
(k1=1.2, b=0.75 — the ES default; the mapping at
/root/reference/elastic/index.go:123-373 declares no `similarity`
override), over the same analyzer kernels (shared module
:mod:`.functions.analyzers`), with the fixed tie-break
(score desc, doc_id asc).

BM25 (Lucene flavor):
    idf(t)    = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfn(t, d) = tf / (tf + k1 * (1 - b + b * dl/avgdl))
    score     = Σ_{t ∈ analyzed query tokens} idf(t) * tfn(t, d)

Duplicate query tokens score once per occurrence (a match query expands
to one term clause per token).  Deviation from Lucene: dl is exact
(float64), not byte-quantized through SmallFloat norms.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from .functions.analyzers import ANALYZERS_TF, code_search_analyze, default_analyze

K1 = 1.2
B = 0.75


@dataclass
class OracleIndex:
    analyzer: str = "code"
    n_docs: int = 0
    total_dl: float = 0.0
    dls: dict[str, int] = field(default_factory=dict)
    # term -> {doc_id -> tf}
    postings: dict[str, dict[str, int]] = field(default_factory=dict)
    # doc metadata for keyword filters (lang / repo — `elastic/index.go:157-174`)
    meta: dict[str, dict[str, str]] = field(default_factory=dict)

    @property
    def avgdl(self) -> float:
        return self.total_dl / self.n_docs if self.n_docs else 0.0

    def add(self, doc_id: str, content: str, **meta: str) -> None:
        tfs, dl = ANALYZERS_TF[self.analyzer](content)
        self.n_docs += 1
        self.total_dl += dl
        self.dls[doc_id] = dl
        self.meta[doc_id] = meta
        for term, tf in tfs.items():
            self.postings.setdefault(term, {})[doc_id] = tf

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, ()))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def search(
        self,
        query: str,
        k: int = 10,
        lang: str | list[str] | None = None,
        repo: str | list[str] | None = None,
        operator: str = "or",
        must_not: str | None = None,
        minimum_should_match: int = 0,
        dl_range: tuple[int | None, int | None] | None = None,
    ) -> list[tuple[str, float]]:
        """Top-k (doc_id, BM25 score), tie-break score desc then doc_id asc.

        ``operator="and"`` keeps only docs containing every distinct
        analyzed query term; ``must_not`` drops docs containing any of
        its analyzed terms — brute-force referee for the engine's bool
        must/must_not paths.  ``lang`` / ``repo`` accept a list for the
        ES terms-filter semantics (match ANY listed value)."""
        analyze_query = (
            default_analyze if self.analyzer == "default" else code_search_analyze
        )
        terms = analyze_query(query)
        neg = set(analyze_query(must_not)) if must_not else set()
        avgdl = self.avgdl
        scores: dict[str, float] = {}
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            idf = self.idf(t)
            for doc_id, tf in plist.items():
                dl = self.dls[doc_id]
                tfn = tf / (tf + K1 * (1.0 - B + B * dl / avgdl))
                scores[doc_id] = scores.get(doc_id, 0.0) + idf * tfn
        if operator == "and":
            req = set(terms)
            scores = {
                d: s for d, s in scores.items()
                if all(d in self.postings.get(t, {}) for t in req)
            }
        if dl_range is not None:
            # ES range filter over dl (either bound None = unbounded)
            lo = dl_range[0] if dl_range[0] is not None else 0
            hi = dl_range[1] if dl_range[1] is not None else float("inf")
            scores = {d: s for d, s in scores.items()
                      if lo <= self.dls[d] <= hi}
        if minimum_should_match > 1:
            # ES minimum_should_match: ≥ N DISTINCT matched terms
            distinct = set(terms)
            scores = {
                d: s for d, s in scores.items()
                if sum(d in self.postings.get(t, {}) for t in distinct)
                >= minimum_should_match
            }
        if neg:
            # a surviving doc contains no excluded term, so its summed
            # score never included one — filtering alone is exact
            scores = {
                d: s for d, s in scores.items()
                if not any(d in self.postings.get(t, {}) for t in neg)
            }
        lang_set = None if lang is None else (
            {lang} if isinstance(lang, str) else set(lang)
        )
        repo_set = None if repo is None else (
            {repo} if isinstance(repo, str) else set(repo)
        )
        hits = [
            (d, s)
            for d, s in scores.items()
            if (lang_set is None or self.meta[d].get("lang") in lang_set)
            and (repo_set is None or self.meta[d].get("repo") in repo_set)
        ]
        hits.sort(key=lambda x: (-x[1], x[0]))
        return hits[:k]


def build_oracle_index(
    rows: list[dict], analyzer: str = "code", content_key: str = "content"
) -> OracleIndex:
    """rows: dicts with doc_id + content (+ lang/repo for filters)."""
    idx = OracleIndex(analyzer=analyzer)
    for r in rows:
        idx.add(
            r["doc_id"],
            r[content_key],
            lang=r.get("lang", ""),
            repo=r.get("repo", ""),
        )
    return idx
