"""Search-result highlighting — the ES ``highlight`` clause analog.

GitLab's code search renders matching source lines around each hit;
ES produces them from the stored ``_source`` with the search analyzer
(the reference's mapping stores full source for exactly this,
elastic/index.go:96-113).  Here the highlighter is a driver-side fetch
step over the documents store:

* the hit ids' contents come from :func:`doc_store.point_read_documents`
  — per-id store-partition point reads (no Spark job, no scan);
* a line matches when its lowercase text contains any analyzed query
  token as a substring — the search analyzer (whitespace + lowercase +
  asciifold, elastic/index.go:45-52) produces the tokens, and the
  edgeNGram'd index matches prefixes, so substring containment of the
  analyzed token is the same approximation ES's plain highlighter
  makes over the original text;
* output is the first ``max_fragments`` matching lines per document
  with 1-based line numbers.

Scale: cost is O(k hits · doc length) on the driver — the ES model
(the fetch/highlight phase runs on k documents, never the corpus).
"""

from __future__ import annotations

from ..functions.analyzers import code_search_analyze, default_analyze
from ..sources.doc_store import point_read_documents

HIGHLIGHT_ANALYZERS = {
    "code": code_search_analyze,
    "simple": code_search_analyze,
    "default": default_analyze,
}


def highlight_content(
    content: str, tokens: list[str], max_fragments: int = 3
) -> list[dict]:
    """First ``max_fragments`` lines of ``content`` containing any
    analyzed token (case-insensitive substring), as
    ``{"line_no": 1-based, "line": text}`` rows."""
    frags: list[dict] = []
    if not tokens:
        return frags
    toks = [t for t in tokens if t]
    for no, line in enumerate(content.splitlines(), 1):
        low = line.lower()
        if any(t in low for t in toks):
            frags.append({"line_no": no, "line": line})
            if len(frags) >= max_fragments:
                break
    return frags


def highlight_hits(
    index_path: str,
    hit_ids: list[str],
    query: str,
    analyzer: str = "code",
    max_fragments: int = 3,
    content_col: str = "content",
) -> dict[str, list[dict]]:
    """id → fragments for the given hits, reading content via store
    point reads.  Ids missing from the store highlight as []."""
    analyze = HIGHLIGHT_ANALYZERS.get(analyzer, code_search_analyze)
    tokens = sorted(set(analyze(query)))
    docs = point_read_documents(index_path, hit_ids, columns=("id", content_col))
    return {
        i: highlight_content(
            (docs.get(i) or {}).get(content_col) or "", tokens, max_fragments
        )
        for i in hit_ids
    }
