"""BM25 query execution (SURVEY.md §2 B14-B16, B19).

The query lifecycle the reference delegates to ES (_search with the
mapping's analyzers — SURVEY.md §3.3) executed natively:

  query string → code_search_analyzer (whitespace+lower+fold,
  elastic/index.go:45-52) → term lookup (edgeNGram'd index ⇒ prefix
  matching) → keyword filters (lang/repo, elastic/index.go:157-174)
  → BM25 per (term,doc), summed → top-k.

Physical plan: postings are document-partitioned, so scoring is
embarrassingly parallel per doc_part — an ``applyInPandas`` kernel
scores its local doc range (dense numpy accumulator) and emits a local
top-k; the only shuffle is the ≤ k·n_parts candidate rows into the
global ``orderBy(score desc, id asc).limit(k)``.  Two kernels:

* exhaustive — vectorized decode + np.add.at accumulation; the
  correctness referee and the fast path for small term sets;
* block-max WAND (B15) — DAAT with block-skipping over the compressed
  postings; provably returns the identical top-k (pruning uses strict
  bound < θ, ties evaluated, same (score desc, doc_idx asc) total
  order — doc_idx is the rank of the string id, so doc_idx order and
  id order coincide).

Keyword filters (B16) ride per-part packed doc-set bitmaps from the
index's ``filters`` sidecar — the kernel masks decoded postings, so BMW
stays enabled and no allowed-doc list ever crosses a shuffle.  Repo
filters additionally prune doc_parts via the ``part_meta`` manifest
(B17, the ES routing analog — elastic/client.go:162).

Scores are float64 end-to-end; tie-break (score desc, doc_id asc)
matches the oracle.
"""

from __future__ import annotations

import heapq
import math
import os
from collections import Counter, OrderedDict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analyzers import (
    code_search_analyze,
    default_analyze,
    fold_ascii,
    path_analyze,
    sha_analyze,
)
from ..functions.codecs import unpack_postings
from .index_build import B, K1, InvertedIndex

TOPK_SCHEMA = "doc_idx long, score double"

_HITS_FIELDS = [("id", "string"), ("score", "double"), ("repo", "string"),
                ("path", "string"), ("lang", "string")]
_BATCH_FIELDS = [("query_id", "string"), ("rank", "int"), ("id", "string"),
                 ("score", "double")]


def _local_result(spark, rows: list[tuple], fields: list[tuple[str, str]]) -> DataFrame:
    """Materialize a driver-computed result as a DataFrame backed by an
    Arrow local relation (pandas input): collecting it is a
    LocalTableScan, NOT a Spark job — a tuple-list createDataFrame
    parallelizes an RDD and pays ~0.3 s of job scheduling per query."""
    from pyspark.sql.types import (
        DoubleType, IntegerType, LongType, StringType, StructField, StructType,
    )

    types = {"string": StringType(), "double": DoubleType(),
             "int": IntegerType(), "long": LongType()}
    schema = StructType([StructField(n, types[t]) for n, t in fields])
    if not rows:
        # a ZERO-row pandas frame silently falls out of the Arrow
        # conversion path onto the parallelize-an-RDD path — a 32-task
        # Spark job costing ~0.3 s per empty result (measured round 6).
        # A placeholder row keeps the Arrow local-relation path and
        # ``limit(0)`` restores emptiness job-free (LocalTableScan).
        filler = {"string": "", "double": 0.0, "int": 0, "long": 0}
        pdf = pd.DataFrame([[filler[t] for _, t in fields]],
                           columns=[n for n, _ in fields])
        return spark.createDataFrame(pdf, schema).limit(0)
    pdf = pd.DataFrame(rows, columns=[n for n, _ in fields])
    return spark.createDataFrame(pdf, schema)

# search-side analysis per index analyzer: content/file_name fields use
# the asymmetric code_search_analyzer (elastic/index.go:143-150); fields
# on the `default` analyzer (commit message etc.) search with the same
# default chain (ES falls back to the index analyzer)
QUERY_ANALYZERS = {
    "code": code_search_analyze,
    "simple": code_search_analyze,
    "default": default_analyze,
}

# search-side chain per FIELD analyzer (extra fields): code/simple use
# the asymmetric code_search_analyzer; path and sha fields have no
# separate search_analyzer in the mapping (elastic/index.go:137-168),
# so ES analyzes the query with the INDEX chain — a path query emits
# its own suffixes (each matching docs whose path ends with it), a sha
# query emits its prefix grams 5..len (prefix lookup).
FIELD_QUERY_ANALYZERS = {
    "code": code_search_analyze,
    "simple": code_search_analyze,
    "default": default_analyze,
    "path": lambda s: [t for t in path_analyze(s) if t],
    "sha": sha_analyze,
}


def score_plan(
    index: InvertedIndex,
    query: str,
    k: int = 10,
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    mode: str = "exhaustive",
    operator: str = "or",
    must_not: str | None = None,
    after_cursor: tuple[float, int] | None = None,
    pre_weights: dict[str, float] | None = None,
    minimum_should_match: int = 0,
    dl_range: tuple[int | None, int | None] | None = None,
) -> DataFrame | None:
    """The LAZY scoring phase of :func:`search`: per-doc_part top-k
    candidate rows (doc_idx, score).  ``None`` means the query can match
    nothing (no live term / repo routed to zero parts).  Split out so
    the scoring plan (term pushdown, sidecar reads, doc_part pruning)
    stays inspectable — ``search`` consumes it eagerly for the fetch
    phase.

    ``operator="and"`` requires every distinct analyzed query term
    (GitLab issues simple_query_string with default_operator AND); a
    query term with zero corpus df then matches nothing.  ``must_not``
    is analyzed with the same chain and its terms' docs are excluded
    (ES bool must_not); under AND a term both required and excluded
    matches nothing, under OR an excluded term just stops being a
    should clause — both mirroring Lucene's bool query.

    ``after_cursor`` is a resolved (score, doc_idx) ES search_after
    cursor: kernels emit only docs strictly after it in the (score
    desc, doc_idx asc) total order, so deep paging costs O(k) per page
    at any depth (:func:`search` resolves the public (score, id) form).

    ``pre_weights`` bypasses query analysis with an explicit
    term → clause-weight map of ALREADY-ANALYZED terms (the multi-term
    rewrite seam :func:`prefix_search` expands into); ``query`` is then
    ignored.

    ``minimum_should_match`` (ES ``minimum_should_match: N``): a hit
    must match at least N DISTINCT analyzed query terms; 0/1 is the
    plain OR, N = the distinct-term count is ``operator="and"``.  A
    dead (df=0) term is still a should clause but can never match, so
    N greater than the LIVE term count matches nothing (Lucene: msm
    above the matchable-clause count kills the query).  Only
    meaningful with ``operator="or"`` — combining with "and" raises.

    ``dl_range=(lo, hi)`` (the ES ``range`` query in filter context,
    over the numeric doc field ``dl``): hits must have lo ≤ dl ≤ hi
    (either bound None = unbounded).  dl rides every posting entry, so
    kernels mask it for free alongside the keyword bitmaps; removing
    docs only loosens block maxima, so BMW stays exact (the same
    argument as the bitmap masks).
    """
    if operator not in ("or", "and"):
        raise ValueError(f"operator must be 'or' or 'and', got {operator!r}")
    msm = int(minimum_should_match or 0)
    if msm < 0:
        raise ValueError("minimum_should_match must be >= 0")
    if msm > 1 and operator == "and":
        raise ValueError(
            "minimum_should_match applies to operator='or' "
            "(operator='and' already requires every term)"
        )
    spark = index.postings.sparkSession
    analyze_query = QUERY_ANALYZERS.get(index.analyzer, code_search_analyze)
    weights = (Counter(analyze_query(query)) if pre_weights is None
               else dict(pre_weights))
    _meta_local = _term_meta_local(index, list(weights))
    idf = ({t: m[0] for t, m in _meta_local.items()}
           if _meta_local is not None else index.idf_map(list(weights)))
    # weighted idf per matched term — the only per-term constant kernels need
    widf = {t: idf[t] * w for t, w in weights.items() if t in idf}

    if not widf:
        return None
    neg = frozenset(analyze_query(must_not)) if must_not else frozenset()
    n_required = 0
    if operator == "and":
        if neg & set(weights):
            return None  # a term required AND excluded: nothing can match
        if len(widf) < len(weights):
            return None  # a required term has df=0: nothing matches all
        n_required = len(widf)
    elif neg:
        # OR: an excluded term can never contribute to a surviving doc
        # (any doc containing it is excluded) — drop it from the should
        # clauses, keep it as exclusion; Lucene's `foo -foo` ⇒ empty
        widf = {t: w for t, w in widf.items() if t not in neg}
        if not widf:
            return None
    if msm > 1 and msm > len(widf):
        return None  # more required matches than live should clauses

    scan_terms = list(widf) + sorted(neg)
    cand = index.postings.filter(F.col("term").isin(scan_terms)).select(
        "doc_part", "term", "docs_bin", "tfs_bin", "dls_bin",
        "block_last", "block_max_tf", "block_min_dl", "max_tf", "min_dl",
    )

    predicates, repo_t = _kw_predicates(lang, repo)
    use_bmw = mode == "bmw"  # BMW stays on under keyword filters

    # B17 routing analog: a repo-scoped query prunes to the doc_parts
    # whose [repo_min, repo_max] range covers any requested repo (ids
    # sort as "repo_path", so ranges cluster by repo).  The collect is
    # bounded by the matching-part count; the static IN list reaches
    # the doc_part-partitioned postings scan as a partition filter.
    parts = _route_parts(index, repo_t)
    if parts is not None:
        if not parts:
            return None
        cand = cand.filter(F.col("doc_part").isin(parts))

    kernel = _make_part_kernel(
        widf, index.avgdl, k, use_bmw, index.docs_per_part, len(predicates),
        neg_terms=neg, n_required=n_required, after=after_cursor,
        min_match=msm if msm > 1 else 0, dl_range=_norm_dl_range(dl_range),
    )
    if predicates:
        if index.filters is None:
            raise ValueError(
                "keyword-filtered search needs the index's filters sidecar "
                "(rebuild or re-save the index with this version)"
            )
        # keyword filters travel as per-part packed doc-set rows (one
        # per (field, value) per part, ≤ docs_per_part/8 bytes each) —
        # never the allowed-doc list itself
        fsel = index.filters.filter(_filters_cond(predicates)).select(
            "doc_part", "field", "value", "bits"
        )
        if parts is not None:
            fsel = fsel.filter(F.col("doc_part").isin(parts))
        scored = (
            cand.groupBy("doc_part")
            .cogroup(fsel.groupBy("doc_part"))
            .applyInPandas(kernel, schema=TOPK_SCHEMA)
        )
    else:
        scored = cand.groupBy("doc_part").applyInPandas(
            _wrap_single(kernel), schema=TOPK_SCHEMA
        )
    return scored


def _fetch_doc_meta(
    index: InvertedIndex, doc_idxs: list[int], columns: list[str]
) -> dict[int, dict] | None:
    """ES fetch phase as DRIVER-SIDE point reads: for a file-backed
    index, read the hit doc_parts' doc_stats parquet directly (pyarrow
    dataset, doc_idx IN filter → row-group pruning) — no Spark job at
    all.  Returns doc_idx → metadata row, or None when the index is not
    file-backed (fall back to the pruned Spark join).  The candidate
    set is ≤ k·n_parts rows and the parts touched ≤ that, so this is
    O(hit shards) exactly like ES's fetch-from-hit-shards."""
    paths = index.doc_stats_paths
    if not paths or index.docs_per_part <= 0:
        return None
    parts = sorted({i // index.docs_per_part for i in doc_idxs})
    if not all(p in paths for p in parts):
        return None
    import pyarrow.dataset as pads

    from ..sources import fs

    out: dict[int, dict] = {}
    want = set(doc_idxs)
    for p in parts:
        try:
            tbl = fs.dataset(paths[p]).to_table(
                columns=["doc_idx", *columns],
                filter=pads.field("doc_idx").isin(list(want)),
            )
        except (OSError, FileNotFoundError):
            # a mapped directory can vanish under a live handle (vacuum
            # ran, files moved) — degrade to the pruned Spark join
            # fallback instead of failing the query
            return None
        for row in tbl.to_pylist():
            out[int(row["doc_idx"])] = row
    return out


def _resolve_cursors(
    index: InvertedIndex, cursors: dict
) -> dict:
    """Resolve public search_after cursors (score, id) → kernel cursors
    (score, doc_idx) in ONE bounded point lookup: the id filter pushes
    to the doc_stats parquet scan, and ids sort identically to doc_idx
    (doc_idx IS the rank of the string id), so row-group min/max stats
    prune to the hit partitions."""
    ids = sorted({sid for _, sid in cursors.values()})
    rows = index.doc_stats.filter(F.col("id").isin(ids)).select(
        "id", "doc_idx"
    ).collect()
    by_id = {r["id"]: int(r["doc_idx"]) for r in rows}
    out = {}
    for key, (score, sid) in cursors.items():
        if sid not in by_id:
            raise ValueError(f"search_after id {sid!r} not found in the index")
        out[key] = (float(score), by_id[sid])
    return out


def _norm_kw(v: str | list[str] | None) -> tuple[str, ...] | None:
    """Normalize a keyword-filter argument: a string is one required
    value (ES ``term`` filter); a list/tuple/set is an ES ``terms``
    filter — the doc matches ANY of the values (OR within the field,
    AND across fields; GitLab's group-scope search issues exactly this
    shape, a ``terms`` filter over the group's repository ids).  An
    empty list matches nothing, per ES ``terms: []``."""
    if v is None:
        return None
    if isinstance(v, str):
        return (v,)
    return tuple(sorted({str(x) for x in v}))


def _kw_predicates(
    lang: str | list[str] | None, repo: str | list[str] | None
) -> tuple[list[tuple[str, tuple[str, ...]]], tuple[str, ...] | None]:
    """Build the (field, values) predicate list for the lang/repo
    keyword filters and return it with the normalized repo tuple (the
    routing input)."""
    lang_t, repo_t = _norm_kw(lang), _norm_kw(repo)
    predicates: list[tuple[str, tuple[str, ...]]] = []
    if lang_t is not None:
        predicates.append(("lang", lang_t))
    if repo_t is not None:
        predicates.append(("repo", repo_t))
    return predicates, repo_t


def _filters_cond(predicates: list[tuple[str, tuple[str, ...]]]):
    """Filters-sidecar scan predicate: OR of per-field
    ``field = f AND value IN vals`` conjuncts — both reach the parquet
    scan (EqualTo + In pushdown)."""
    cond = None
    for f, vals in predicates:
        c = (F.col("field") == f) & F.col("value").isin(list(vals))
        cond = c if cond is None else (cond | c)
    return cond


def _route_parts(
    index: InvertedIndex, repo_t: tuple[str, ...] | None
) -> list[int] | None:
    """B17 routing for a repo term/terms filter: the doc_parts whose
    [repo_min, repo_max] range covers ANY requested repo.  ``None``
    means no pruning possible (no repo filter / no part_meta); ``[]``
    means no part can match (empty terms list, or no covering part).
    The collect is bounded by the matching-part count."""
    if repo_t is None or index.part_meta is None:
        return None
    if not repo_t:
        return []
    local = _part_meta_rows_local(index)
    if local is not None:
        # same containment predicate, evaluated over the driver-side
        # manifest copy (n_parts rows, read once per handle) — no job
        return sorted(
            int(r["doc_part"]) for r in local
            if any(r["repo_min"] <= rv <= r["repo_max"] for rv in repo_t)
        )
    cond = None
    for r in repo_t:
        c = (F.col("repo_min") <= r) & (F.col("repo_max") >= r)
        cond = c if cond is None else (cond | c)
    return [
        int(row["doc_part"])
        for row in index.part_meta.filter(cond).select("doc_part").collect()
    ]


def _fold_filter_bits(filter_pdf, n_fields: int, docs_per_part: int):
    """Kernel-side ES terms-filter fold: OR the packed doc-set rows
    WITHIN each predicate field, AND ACROSS fields.  Returns the
    combined bitmap, or ``None`` when this part has no qualifying docs
    (a predicate field with zero matching value rows here, or an empty
    conjunction).  With single-value filters this reduces exactly to
    the old AND-of-all-rows fold."""
    from ..functions.codecs import unpack_doc_set

    if filter_pdf is None or len(filter_pdf) == 0:
        return None
    if filter_pdf["field"].nunique() < n_fields:
        return None
    bits = None
    for _, grp in filter_pdf.groupby("field", sort=False):
        fb = None
        for b in grp["bits"]:
            arr = unpack_doc_set(bytes(b), docs_per_part)
            fb = arr if fb is None else (fb | arr)
        bits = fb if bits is None else (bits & fb)
    return bits if bits.any() else None


# ---------------------------------------------------------------------------
# Driver-side scoring fast path (the ES "query fits one coordinating
# node" regime).  A single-digit-term query over a FILE-BACKED index
# touches ≤ n_parts postings rows per term — reading them with pyarrow
# (parquet predicate pushdown on the term-sorted files) and running the
# SAME per-part kernels driver-side skips the ~0.3-0.8 s Spark
# job-submission floor entirely, exactly like the existing driver-side
# fetch phase (_fetch_doc_meta).  Dispatch is adaptive: the path only
# runs when Σ df over the scan terms stays under a configurable entry
# budget (default 4M postings ≈ tens of MB); anything bigger — a hot
# term at cluster scale — falls back to the distributed Spark plan
# unchanged.  Results are identical by construction: both paths feed
# the same parquet rows to the same kernel functions.
#
# The handle-level LRU below additionally memoizes the RAW postings
# rows per term (the ES filesystem-cache analog): bounded by total
# posting entries, keyed on the handle (a reloaded or updated index
# starts cold), holding index STRUCTURE (not query results) — every
# query still scores from (possibly cached) index bytes.

_MISS = object()


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, str(default)))
    except ValueError:
        return default


class _BoundedLRU:
    """Cost-bounded LRU: values carry an explicit cost (posting entries
    / bytes); inserts evict least-recently-used entries past the cap."""

    def __init__(self, max_cost: int):
        self.max_cost = max_cost
        self._d: OrderedDict = OrderedDict()
        self.cost = 0

    def get(self, key):
        if key in self._d:
            self._d.move_to_end(key)
            return self._d[key][0]
        return _MISS

    def put(self, key, value, cost: int) -> None:
        if key in self._d:
            self.cost -= self._d[key][1]
            del self._d[key]
        self._d[key] = (value, cost)
        self.cost += cost
        while self.cost > self.max_cost and len(self._d) > 1:
            _, (_, c) = self._d.popitem(last=False)
            self.cost -= c


def _driver_score_enabled() -> bool:
    return os.environ.get("SPARK_GRAFT_DRIVER_SCORE", "1") == "1"


def _driver_score_max_entries() -> int:
    return _env_int("SPARK_GRAFT_DRIVER_SCORE_MAX_ENTRIES", 12_000_000)


def _local_dataset(index: InvertedIndex, attr: str, root: str):
    """Memoized hive-partitioned pyarrow dataset over a saved table
    (file listing happens once per handle)."""
    cache = index.__dict__.setdefault("_local_ds_cache", {})
    ds = cache.get(attr)
    if ds is None:
        from ..sources import fs

        ds = fs.dataset(root, partitioning="hive")
        cache[attr] = ds
    return ds


def _term_meta_local(
    index: InvertedIndex, terms: list[str]
) -> dict[str, tuple[float, int]] | None:
    """(idf, df) per term from the saved term_stats — driver-side pyarrow
    read, memoized on the handle (misses cached too).  Returns only the
    live terms; None when the index is not file-backed.  Reads the SAME
    stored idf values idf_map collects, so both paths weight terms
    identically."""
    root = getattr(index, "term_stats_root", None)
    if root is None:
        return None
    cache = index.__dict__.setdefault("_term_meta_cache", {})
    missing = [t for t in set(terms) if t not in cache]
    if missing:
        try:
            import pyarrow.dataset as pads

            tbl = _local_dataset(index, "term_stats", root).to_table(
                columns=["term", "df", "idf"],
                filter=pads.field("term").isin(missing),
            )
        except (OSError, FileNotFoundError):
            return None
        found = {
            t: (float(i), int(d))
            for t, d, i in zip(
                tbl.column("term").to_pylist(),
                tbl.column("df").to_pylist(),
                tbl.column("idf").to_pylist(),
            )
        }
        for t in missing:
            cache[t] = found.get(t)
    return {t: cache[t] for t in set(terms) if cache.get(t) is not None}


_POSTINGS_COLS = [
    "doc_part", "term", "docs_bin", "tfs_bin", "dls_bin",
    "block_last", "block_max_tf", "block_min_dl", "max_tf", "min_dl",
]


def _postings_lru(index: InvertedIndex) -> _BoundedLRU:
    lru = index.__dict__.get("_postings_lru")
    if lru is None:
        lru = index.__dict__["_postings_lru"] = _BoundedLRU(
            _env_int("SPARK_GRAFT_POSTINGS_CACHE_ENTRIES", 24_000_000)
        )
    return lru


def _postings_pdf_local(
    index: InvertedIndex, terms: list[str], parts: list[int] | None
) -> pd.DataFrame | None:
    """All (doc_part, term) postings rows of the scan terms, read
    driver-side (pyarrow, term-pruned) through the handle's bounded LRU.
    ``parts``: optional doc_part restriction (B17 routing).  None when
    the index is not file-backed or the read fails."""
    root = getattr(index, "postings_root", None)
    if root is None:
        return None
    lru = _postings_lru(index)
    frames: dict[str, pd.DataFrame] = {}
    missing: list[str] = []
    for t in dict.fromkeys(terms):  # dedup, keep order
        hit = lru.get(t)
        if hit is _MISS:
            missing.append(t)
        else:
            frames[t] = hit
    if missing:
        try:
            import pyarrow.dataset as pads

            tbl = _local_dataset(index, "postings", root).to_table(
                filter=pads.field("term").isin(missing)
            )
        except (OSError, FileNotFoundError):
            return None
        pdf = tbl.to_pandas()
        pdf["doc_part"] = pdf["doc_part"].astype(np.int64)
        for t, grp in pdf.groupby("term", sort=False):
            g = grp[_POSTINGS_COLS].reset_index(drop=True)
            frames[t] = g
            lru.put(t, g, max(int(grp["df"].sum()), 1))
        empty = pdf[_POSTINGS_COLS].iloc[0:0]
        for t in missing:
            if t not in frames:
                frames[t] = empty
                lru.put(t, empty, 1)
    live = [frames[t] for t in dict.fromkeys(terms) if len(frames[t])]
    if not live:
        return pd.DataFrame(columns=_POSTINGS_COLS)
    out = pd.concat(live, ignore_index=True)
    if parts is not None:
        out = out[out["doc_part"].isin(parts)]
    # (doc_part, term) ascending = the saved files' row order (save()
    # sorts exactly this way), so the per-part kernel sees rows in the
    # SAME order as the Spark plan's group — float accumulation order,
    # hence every last-ULP of every score, is identical across paths
    return out.sort_values(
        ["doc_part", "term"], kind="mergesort", ignore_index=True
    )


_FILTER_COLS = ["doc_part", "field", "value", "bits"]


def _filters_pdf_local(
    index: InvertedIndex,
    pairs: list[tuple[str, str]],
) -> dict[int, pd.DataFrame] | None:
    """Per-part filters-sidecar rows for the requested (field, value)
    pairs, read driver-side through a handle-level LRU (cost = packed
    bytes).  None when the sidecar is not file-backed / unreadable."""
    root = getattr(index, "filters_root", None)
    if root is None:
        return None
    lru = index.__dict__.get("_filters_lru")
    if lru is None:
        lru = index.__dict__["_filters_lru"] = _BoundedLRU(
            _env_int("SPARK_GRAFT_FILTERS_CACHE_BYTES", 256 << 20)
        )
    frames: list[pd.DataFrame] = []
    missing: list[tuple[str, str]] = []
    for key in dict.fromkeys(pairs):
        hit = lru.get(key)
        if hit is _MISS:
            missing.append(key)
        else:
            frames.append(hit)
    if missing:
        try:
            import pyarrow.dataset as pads

            cond = None
            for f, v in missing:
                c = (pads.field("field") == f) & (pads.field("value") == v)
                cond = c if cond is None else (cond | c)
            tbl = _local_dataset(index, "filters", root).to_table(filter=cond)
        except (OSError, FileNotFoundError):
            return None
        pdf = tbl.to_pandas()
        pdf["doc_part"] = pdf["doc_part"].astype(np.int64)
        pdf = pdf[_FILTER_COLS]
        grouped = {
            key: grp.reset_index(drop=True)
            for key, grp in pdf.groupby(["field", "value"], sort=False)
        }
        empty = pdf.iloc[0:0]
        for key in missing:
            g = grouped.get(key, empty)
            frames.append(g)
            lru.put(
                key, g,
                int(sum(len(b) for b in g["bits"])) if len(g) else 1,
            )
    live = [f for f in frames if len(f)]
    if not live:
        return {}
    allf = pd.concat(live, ignore_index=True)
    return {
        int(part): grp.reset_index(drop=True)
        for part, grp in allf.groupby("doc_part", sort=True)
    }


def _filters_frames_for_predicates(
    index: InvertedIndex,
    predicates: list[tuple[str, tuple[str, ...]]],
) -> dict[int, pd.DataFrame] | None:
    pairs = [(f, v) for f, vals in predicates for v in vals]
    return _filters_pdf_local(index, pairs)


_EMPTY_FILTERS_PDF = pd.DataFrame(
    {"doc_part": pd.Series([], dtype="int64"),
     "field": pd.Series([], dtype="object"),
     "value": pd.Series([], dtype="object"),
     "bits": pd.Series([], dtype="object")}
)


def _part_meta_rows_local(index: InvertedIndex) -> list | None:
    """The routing manifest, read driver-side once per handle (it is
    n_parts rows — the ES cluster-state analog).  None when not
    file-backed."""
    root = getattr(index, "part_meta_root", None)
    if root is None:
        return None
    rows = index.__dict__.get("_part_meta_rows")
    if rows is None:
        try:
            tbl = _local_dataset(index, "part_meta", root).to_table(
                columns=["doc_part", "repo_min", "repo_max"]
            )
        except (OSError, FileNotFoundError):
            return None
        rows = tbl.to_pylist()
        index.__dict__["_part_meta_rows"] = rows
    return rows


def _search_local_rows(
    index: InvertedIndex,
    query: str,
    k: int,
    lang,
    repo,
    mode: str,
    operator: str,
    must_not: str | None,
    after_cursor: tuple[float, int] | None,
    minimum_should_match: int,
    dl_range,
    pre_weights: dict[str, float] | None = None,
) -> list | None:
    """Driver-side twin of ``score_plan(...).collect()``: same analysis,
    same dead rules, same per-part kernel — candidate rows computed
    without a Spark job.  Returns the candidate row list ([] = provably
    no hits), or None when ineligible (not file-backed, disabled, or
    the scan terms exceed the driver entry budget) — callers then fall
    back to the distributed plan."""
    if not _driver_score_enabled():
        return None
    if getattr(index, "postings_root", None) is None:
        return None
    msm = int(minimum_should_match or 0)
    # argument validation mirrors score_plan exactly (shared rules)
    if operator not in ("or", "and"):
        raise ValueError(f"operator must be 'or' or 'and', got {operator!r}")
    if msm < 0:
        raise ValueError("minimum_should_match must be >= 0")
    if msm > 1 and operator == "and":
        raise ValueError(
            "minimum_should_match applies to operator='or' "
            "(operator='and' already requires every term)"
        )
    analyze_query = QUERY_ANALYZERS.get(index.analyzer, code_search_analyze)
    weights = (Counter(analyze_query(query)) if pre_weights is None
               else dict(pre_weights))
    neg = frozenset(analyze_query(must_not)) if must_not else frozenset()
    meta = _term_meta_local(index, list(weights) + sorted(neg))
    if meta is None:
        return None
    widf = {t: meta[t][0] * w for t, w in weights.items() if t in meta}
    if not widf:
        return []
    n_required = 0
    if operator == "and":
        if neg & set(weights):
            return []
        if len(widf) < len(weights):
            return []
        n_required = len(widf)
    elif neg:
        widf = {t: w for t, w in widf.items() if t not in neg}
        if not widf:
            return []
    if msm > 1 and msm > len(widf):
        return []

    scan_terms = list(widf) + sorted(neg)
    total_entries = sum(meta[t][1] for t in scan_terms if t in meta)
    if total_entries > _driver_score_max_entries():
        return None

    predicates, repo_t = _kw_predicates(lang, repo)
    if predicates and getattr(index, "filters_root", None) is None:
        return None
    parts = _route_parts(index, repo_t)
    if parts is not None and not parts:
        return []

    post = _postings_pdf_local(index, scan_terms, parts)
    if post is None:
        return None
    if not len(post):
        return []
    # mode="bmw" is an execution hint, not a semantic switch: BMW's
    # strict-bound pruning provably returns the identical top-k (its
    # whole point), but its DAAT loop runs at Python speed and on the
    # driver the parts execute SEQUENTIALLY — measured 6× slower than
    # the vectorized exhaustive kernel here.  The local path therefore
    # always scores vectorized; parity with the Spark BMW path is
    # pinned by tests/test_driver_fast_path.py.
    fframes = None
    bits_by_part = None
    if predicates:
        fframes = _filters_frames_for_predicates(index, predicates)
        if fframes is None:
            return None
        if n_required == 0 and msm <= 1:
            # pooled filtered scoring: prefold each part's bitmap once
            # (same _fold_filter_bits semantics — a part folding to
            # None is simply absent) and let ONE kernel call resolve
            # bitmaps by each row's own doc_part
            bits_by_part = {}
            for p, fr in fframes.items():
                fb = _fold_filter_bits(fr, len(predicates),
                                       index.docs_per_part)
                if fb is not None:
                    bits_by_part[p] = (fb, p * index.docs_per_part)
    kernel = _make_part_kernel(
        widf, index.avgdl, k, False, index.docs_per_part,
        len(predicates), neg_terms=neg, n_required=n_required,
        after=after_cursor, min_match=msm if msm > 1 else 0,
        dl_range=_norm_dl_range(dl_range),
        bits_by_part=bits_by_part,
    )
    rows: list = []
    if bits_by_part is not None:
        out = kernel(post, None)
        for d, s in zip(out["doc_idx"].to_numpy(), out["score"].to_numpy()):
            rows.append({"doc_idx": int(d), "score": float(s)})
        return rows
    if not predicates and n_required == 0 and msm <= 1:
        # plain-OR pooling: doc ids are GLOBAL and every doc's postings
        # rows live in exactly one part, so the accumulation over the
        # (doc_part, term)-sorted pooled rows adds each doc's term
        # contributions in the SAME order as the per-part kernels —
        # bit-identical scores — while the global top-k (ties kept) is
        # a subset of the per-part top-k union that yields the same
        # final page.  One kernel call instead of n_parts (the per-call
        # pandas overhead dominated sub-100 ms queries).  Conjunctive /
        # msm / filtered shapes keep the per-part loop: their kernels
        # read per-part state (bitmap bases, per-term list counts).
        out = kernel(post, None)
        for d, s in zip(out["doc_idx"].to_numpy(), out["score"].to_numpy()):
            rows.append({"doc_idx": int(d), "score": float(s)})
        return rows
    for part, pdf in post.groupby("doc_part", sort=True):
        if predicates:
            out = kernel(
                pdf.reset_index(drop=True),
                fframes.get(int(part), _EMPTY_FILTERS_PDF),
            )
        else:
            out = kernel(pdf.reset_index(drop=True), None)
        for d, s in zip(out["doc_idx"].to_numpy(), out["score"].to_numpy()):
            rows.append({"doc_idx": int(d), "score": float(s)})
    return rows


def _batch_rows_local(
    index: InvertedIndex,
    kernel,
    terms: list[str],
    scan_parts: list[int] | None,
    pred_pairs: list[tuple[str, str]],
    poolable: bool = False,
) -> list | None:
    """Driver-side twin of the shared term job of :func:`search_many`:
    the SAME batch kernel over pyarrow-read postings rows — no Spark
    job.  Returns (query_id, doc_idx, score) candidate rows, or None
    when ineligible (not file-backed, disabled, or the union of scan
    terms exceeds the driver entry budget)."""
    if not _driver_score_enabled():
        return None
    if getattr(index, "postings_root", None) is None:
        return None
    if pred_pairs and getattr(index, "filters_root", None) is None:
        return None
    meta = _term_meta_local(index, terms)
    if meta is None:
        return None
    total_entries = sum(meta[t][1] for t in terms if t in meta)
    if total_entries > _driver_score_max_entries():
        return None
    post = _postings_pdf_local(index, terms, scan_parts)
    if post is None:
        return None
    fframes: dict[int, pd.DataFrame] | None = None
    if pred_pairs:
        fframes = _filters_pdf_local(index, pred_pairs)
        if fframes is None:
            return None
    rows: list = []
    if poolable and fframes is None:
        # same pooling argument as the single-query plain-OR path: with
        # no predicates, no routing and no conjunctive entries, the
        # batch kernel's per-part state is unused and each doc's rows
        # live in one part — one kernel call, bit-identical scores
        out = kernel(post, None)
        for q, d, s in zip(
            out["query_id"].to_numpy(), out["doc_idx"].to_numpy(),
            out["score"].to_numpy(),
        ):
            rows.append(
                {"query_id": str(q), "doc_idx": int(d), "score": float(s)}
            )
        return rows
    for part, pdf in post.groupby("doc_part", sort=True):
        if fframes is not None:
            out = kernel(
                pdf.reset_index(drop=True),
                fframes.get(int(part), _EMPTY_FILTERS_PDF),
            )
        else:
            out = kernel(pdf.reset_index(drop=True), None)
        for q, d, s in zip(
            out["query_id"].to_numpy(), out["doc_idx"].to_numpy(),
            out["score"].to_numpy(),
        ):
            rows.append(
                {"query_id": str(q), "doc_idx": int(d), "score": float(s)}
            )
    return rows


def search(
    index: InvertedIndex,
    query: str,
    k: int = 10,
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    mode: str = "exhaustive",
    fetch: str = "auto",
    offset: int = 0,
    fields: tuple[str, ...] | None = None,
    operator: str = "or",
    must_not: str | None = None,
    search_after: tuple[float, str] | None = None,
    minimum_should_match: int = 0,
    dl_range: tuple[int | None, int | None] | None = None,
) -> DataFrame:
    """Top-k BM25 hits: DataFrame (id, score, repo, path, lang).

    Duplicate analyzed query tokens add their scores (one term clause
    per occurrence, like a match query).

    ``lang`` / ``repo`` accept a single value (ES ``term`` filter) or a
    LIST of values (ES ``terms`` filter: the doc matches ANY listed
    value; fields still AND together) — the shape GitLab's group- and
    multi-project-scope searches issue, a terms filter over the scope's
    repository ids.  An empty list matches nothing, per ES.  Repo lists
    route to the UNION of the covering doc_parts (B17).

    ``operator="and"`` requires a hit to contain EVERY distinct
    analyzed query term (the simple_query_string default_operator AND
    shape GitLab issues); scores are the same summed BM25.  ``must_not``
    excludes docs containing any of its analyzed terms (bool must_not /
    ``-term``).  ``minimum_should_match=N`` (the ES knob of the same
    name) keeps only hits matching at least N distinct analyzed terms —
    the middle ground between OR (N≤1) and ``operator="and"`` (N =
    every term); composes with must_not, filters, offset and
    search_after, and with N > 1 the evaluation counts matched clauses
    per doc so ``mode`` is ignored.  ``dl_range=(lo, hi)`` is the ES
    ``range`` filter over the numeric dl field (None = unbounded
    bound): since dl rides every posting entry, kernels mask it for
    free and BMW stays exact.  All compose with lang/repo filters and offset; with
    ``operator="and"`` the evaluation is intersection-first, so
    ``mode`` is ignored.

    ``fields`` switches to the multi-field bool-should shape (see
    :func:`multi_search`); ``mode`` is then ignored (exhaustive).

    ``offset`` is the ES ``from`` analog (page 2 = offset=k): scoring
    keeps the top offset+k per partition and the driver slices — the
    standard deep-paging cost model (cost grows with offset+k, which
    is why ES caps from+size at 10 000).

    ``search_after=(score, id)`` is the SCALABLE deep-paging cursor
    (the ES search_after analog): pass the last hit of the previous
    page and kernels keep only docs strictly after it in the (score
    desc, id asc) order — each page costs O(k) regardless of depth,
    which is why ES recommends it past the from+size cap.  Mutually
    exclusive with ``offset``; the id must exist in the index.  Cursor
    scores compare exactly (float64): reuse a cursor with the same
    query surface that produced it — the single and batched kernels
    can differ in the last ULP of a score (accumulation order), the
    same caveat ES has for cursors across shard-routing changes.

    ``fetch``: "auto" resolves hit metadata via driver-side point reads
    of the hit doc_parts when the index is file-backed (one Spark job
    per query total); "spark" forces the doc_part-pruned broadcast join
    (the distributed fallback, also used by plan tests).
    """
    if fields is not None:
        if (operator != "or" or must_not is not None
                or minimum_should_match > 1 or dl_range is not None):
            raise ValueError(
                "operator='and' / must_not / minimum_should_match / "
                "dl_range are single-field features; multi-field "
                "bool-should search scores each field's OR clauses "
                "(the ES multi_match shape)"
            )
        return multi_search(index, query, k=k, fields=fields, lang=lang,
                            repo=repo, fetch=fetch, offset=offset,
                            search_after=search_after)
    spark = index.postings.sparkSession
    cursor = None
    if search_after is not None:
        if offset:
            raise ValueError("offset and search_after are mutually exclusive")
        cursor = _resolve_cursors(index, {"_": search_after})["_"]
    # driver-side fast path (file-backed index, scan terms within the
    # entry budget): same kernels over pyarrow-read postings rows, no
    # Spark job for the scoring phase — see _search_local_rows
    local = _search_local_rows(
        index, query, k + offset, lang, repo, mode, operator, must_not,
        cursor, minimum_should_match, dl_range,
    )
    if local is not None:
        return _rank_and_fetch(index, local, k, fetch, offset=offset)
    scored = score_plan(index, query, k=k + offset, lang=lang, repo=repo,
                        mode=mode, operator=operator, must_not=must_not,
                        after_cursor=cursor,
                        minimum_should_match=minimum_should_match,
                        dl_range=dl_range)
    if scored is None:
        return _local_result(spark, [], _HITS_FIELDS)

    # ES fetch-phase analog: the scoring job runs here (its output is
    # bounded by (offset+k)·n_parts candidate rows), the winners
    # resolve driver-side, and metadata comes ONLY from the doc_parts
    # that produced hits — point reads (auto) or a doc_part-pruned
    # join (spark) — never a full per-query metadata scan.
    return _rank_and_fetch(index, scored.collect(), k, fetch, offset=offset)


def expand_prefix(
    index: InvertedIndex, prefix: str, max_expansions: int = 50
) -> list[str]:
    """Term-dictionary prefix expansion — the Lucene TopTermsRewrite
    analog ES prefix queries compile to.  The prefix is normalized like
    an indexed token (lowercase + asciifold; ES ``prefix`` does not run
    the full analyzer), then matching vocabulary terms are ranked by
    (df desc, term asc) and capped at ``max_expansions`` — Lucene's
    top-terms blended rewrite keeps the highest-frequency terms so the
    cap drops only the least-matching expansions.

    Physical plan: ONE column-pruned (term, df) scan of term_stats with
    the ``startswith`` predicate pushed to parquet (StringStartsWith →
    row-group min/max pruning where files are term-sorted); cost tracks
    the vocabulary, never the corpus.
    """
    return _expand_prefixes(index, {"_": (prefix, max_expansions)})["_"]


def _expand_prefixes(
    index: InvertedIndex, wants: dict[str, tuple[str, int]]
) -> dict[str, list[str]]:
    """Batch form of :func:`expand_prefix`: every entry's expansion from
    ONE (term, df) term_stats scan with the OR'd startswith predicates
    pushed; ranking/capping resolves driver-side per prefix (rows are
    bounded by the matching vocabulary, never the corpus)."""
    from functools import reduce

    norm: dict[str, tuple[str, int]] = {}
    for key, (prefix, cap) in wants.items():
        if not prefix:
            raise ValueError("prefix must be non-empty")
        if cap < 1:
            raise ValueError("max_expansions must be >= 1")
        norm[key] = (fold_ascii(str(prefix).lower()), int(cap))
    preds = [F.col("term").startswith(p) for p in {p for p, _ in norm.values()}]
    rows = (
        index.term_stats.filter(reduce(lambda a, b: a | b, preds))
        .select("term", "df")
        .collect()
    )
    out: dict[str, list[str]] = {}
    for key, (p, cap) in norm.items():
        m = sorted(
            ((int(r["df"]), r["term"]) for r in rows if r["term"].startswith(p)),
            key=lambda x: (-x[0], x[1]),
        )
        out[key] = [t for _, t in m[:cap]]
    return out


def expand_fuzzy(
    index: InvertedIndex,
    term: str,
    max_edits: int = 1,
    max_expansions: int = 50,
    prefix_length: int = 0,
) -> list[str]:
    """Fuzzy term expansion — the ES ``fuzzy`` query's multi-term
    rewrite (Lucene walks a Levenshtein automaton over the FST; the
    Spark analog is a vocabulary scan with the cheap bounds evaluated
    first and the exact distance JVM-side).  The term is normalized
    like an indexed token (lowercase + asciifold), matches rank
    (df desc, term asc) and cap at ``max_expansions`` — the same
    top-terms rewrite as :func:`expand_prefix`.  ``prefix_length``
    requires that many exact leading characters (the ES knob that
    keeps the scan cheap): it pushes to parquet as ``StartsWith``
    (row-group pruning); the length band ``len(term) ± max_edits``
    and the exact Levenshtein predicate evaluate inside the scan's
    whole-stage-codegen span (Catalyst built-ins — no Python in the
    scan; length bounds don't map to parquet stats filters).
    """
    return _expand_fuzzies(
        index, {"_": (term, max_edits, max_expansions, prefix_length)}
    )["_"]


def _lev_dist(a: str, b: str) -> int:
    """Plain Levenshtein distance (driver-side re-check in the batch
    expansion; inputs are vocabulary terms, tens of chars)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _expand_fuzzies(
    index: InvertedIndex, wants: dict[str, tuple[str, int, int, int]]
) -> dict[str, list[str]]:
    """Batch form of :func:`expand_fuzzy`: every entry's neighborhood
    from ONE (term, df) term_stats scan with the OR'd (length band +
    prefix + JVM levenshtein) predicates pushed; per-entry membership
    re-checks and the ranked cap resolve driver-side over the bounded
    match set."""
    from functools import reduce

    norm: dict[str, tuple[str, int, int, int]] = {}
    conds = []
    for key, (term, edits, cap, plen) in wants.items():
        if not term:
            raise ValueError("term must be non-empty")
        if edits < 0 or cap < 1 or plen < 0:
            raise ValueError("max_edits >= 0, max_expansions >= 1, "
                             "prefix_length >= 0 required")
        t = fold_ascii(str(term).lower())
        norm[key] = (t, int(edits), int(cap), int(plen))
        c = (
            (F.length("term") >= len(t) - edits)
            & (F.length("term") <= len(t) + edits)
        )
        if plen:
            c = c & F.col("term").startswith(t[:plen])
        conds.append(c & (F.levenshtein(F.col("term"), F.lit(t)) <= edits))
    rows = (
        index.term_stats.filter(reduce(lambda a, b: a | b, conds))
        .select("term", "df")
        .collect()
    )
    out: dict[str, list[str]] = {}
    for key, (t, edits, cap, plen) in norm.items():
        m = sorted(
            ((int(r["df"]), r["term"]) for r in rows
             if r["term"].startswith(t[:plen])
             and _lev_dist(r["term"], t) <= edits),
            key=lambda x: (-x[0], x[1]),
        )
        out[key] = [tm for _, tm in m[:cap]]
    return out


def fuzzy_search(
    index: InvertedIndex,
    term: str,
    k: int = 10,
    max_edits: int = 1,
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    max_expansions: int = 50,
    prefix_length: int = 0,
    fetch: str = "auto",
    offset: int = 0,
    search_after: tuple[float, str] | None = None,
) -> DataFrame:
    """ES ``fuzzy`` query (``term~N`` in query_string): top-k docs
    containing any vocabulary term within ``max_edits`` Levenshtein
    edits of ``term``, scored as the bool-should sum of the expansions'
    BM25 — the same top-terms scoring rewrite as :func:`prefix_search`,
    over the same shared machinery (filters, routing, pagination,
    cursors all compose)."""
    spark = index.postings.sparkSession
    terms = expand_fuzzy(index, term, max_edits=max_edits,
                         max_expansions=max_expansions,
                         prefix_length=prefix_length)
    if not terms:
        return _local_result(spark, [], _HITS_FIELDS)
    cursor = None
    if search_after is not None:
        if offset:
            raise ValueError("offset and search_after are mutually exclusive")
        cursor = _resolve_cursors(index, {"_": search_after})["_"]
    scored = score_plan(index, "", k=k + offset, lang=lang, repo=repo,
                        after_cursor=cursor,
                        pre_weights={t: 1.0 for t in terms})
    if scored is None:
        return _local_result(spark, [], _HITS_FIELDS)
    return _rank_and_fetch(index, scored.collect(), k, fetch, offset=offset)


_FVF_MODIFIERS = ("none", "log1p", "sqrt", "reciprocal")


def function_score_search(
    index: InvertedIndex,
    query: str,
    factor: float = 1.0,
    modifier: str = "log1p",
    boost_mode: str = "multiply",
    k: int = 10,
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    fetch: str = "auto",
    offset: int = 0,
    search_after: tuple[float, str] | None = None,
) -> DataFrame:
    """ES ``function_score`` with a ``field_value_factor`` function
    over the index's numeric doc field ``dl`` — score shaping by a
    document property (the ES recipe for recency/popularity/length
    boosts): fvf = modifier(factor · dl) with modifier ∈ none | log1p
    | sqrt | reciprocal, combined with the BM25 score by ``boost_mode``
    multiply (ES default) or sum.

    Physical plan = :func:`search`'s exhaustive plan with one extra
    per-part step: dl rides every posting entry (the same free mask
    the range filter uses), so the kernel records each doc's dl during
    accumulation and applies the function BEFORE its local top-k —
    per-doc monotone-independent reshaping is local, so the
    ≤ k·n_parts bound and global merge stay exact.  Filters, routing,
    offset and search_after compose as everywhere else."""
    if modifier not in _FVF_MODIFIERS:
        raise ValueError(f"modifier must be one of {_FVF_MODIFIERS}, "
                         f"got {modifier!r}")
    if boost_mode not in ("multiply", "sum"):
        raise ValueError(f"boost_mode must be 'multiply' or 'sum', "
                         f"got {boost_mode!r}")
    if not float(factor) > 0:
        raise ValueError("factor must be > 0")
    spark = index.postings.sparkSession
    empty = _local_result(spark, [], _HITS_FIELDS)
    analyze_query = QUERY_ANALYZERS.get(index.analyzer, code_search_analyze)
    weights = Counter(analyze_query(query))
    idf = index.idf_map(list(weights))
    widf = {t: idf[t] * w for t, w in weights.items() if t in idf}
    if not widf:
        return empty
    cursor = None
    if search_after is not None:
        if offset:
            raise ValueError("offset and search_after are mutually exclusive")
        cursor = _resolve_cursors(index, {"_": search_after})["_"]

    cand = index.postings.filter(F.col("term").isin(list(widf))).select(
        "doc_part", "term", "docs_bin", "tfs_bin", "dls_bin"
    )
    predicates, repo_t = _kw_predicates(lang, repo)
    parts = _route_parts(index, repo_t)
    if parts is not None:
        if not parts:
            return empty
        cand = cand.filter(F.col("doc_part").isin(parts))
    if predicates and index.filters is None:
        raise ValueError(
            "keyword-filtered function_score needs the index's filters "
            "sidecar"
        )
    kernel = _make_fvf_kernel(
        widf, index.avgdl, k + offset, index.docs_per_part,
        len(predicates), float(factor), modifier, boost_mode, after=cursor,
    )
    if predicates:
        fsel = index.filters.filter(_filters_cond(predicates)).select(
            "doc_part", "field", "value", "bits"
        )
        if parts is not None:
            fsel = fsel.filter(F.col("doc_part").isin(parts))
        scored = (
            cand.groupBy("doc_part")
            .cogroup(fsel.groupBy("doc_part"))
            .applyInPandas(kernel, schema=TOPK_SCHEMA)
        )
    else:
        scored = cand.groupBy("doc_part").applyInPandas(
            _wrap_single(kernel), schema=TOPK_SCHEMA
        )
    return _rank_and_fetch(index, scored.collect(), k, fetch, offset=offset)


def _fvf(dl: np.ndarray, factor: float, modifier: str) -> np.ndarray:
    x = factor * dl.astype(np.float64)
    if modifier == "log1p":
        return np.log1p(x)
    if modifier == "sqrt":
        return np.sqrt(x)
    if modifier == "reciprocal":
        return 1.0 / x
    return x


def _make_fvf_kernel(
    widf: dict[str, float],
    avgdl: float,
    k: int,
    docs_per_part: int,
    n_predicates: int,
    factor: float,
    modifier: str,
    boost_mode: str,
    after: tuple[float, int] | None = None,
):
    """Per-doc_part function_score kernel: BM25 accumulation recording
    each doc's dl (constant across its posting entries), then
    bm25 <boost_mode> modifier(factor·dl) before the local top-k."""

    def kernel(post_pdf: pd.DataFrame, filter_pdf=None) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_idx": [], "score": []})
        if len(post_pdf) == 0:
            return empty
        bits = None
        base = 0
        if n_predicates:
            bits = _fold_filter_bits(filter_pdf, n_predicates, docs_per_part)
            if bits is None:
                return empty
            base = int(filter_pdf["doc_part"].iloc[0]) * docs_per_part

        all_docs: list[np.ndarray] = []
        all_contrib: list[np.ndarray] = []
        all_dls: list[np.ndarray] = []
        for row in post_pdf.itertuples(index=False):
            w = widf.get(row.term)
            if w is None:
                continue
            docs, tfs, dls = unpack_postings(
                bytes(row.docs_bin), bytes(row.tfs_bin), bytes(row.dls_bin)
            )
            docs = docs.astype(np.int64)
            if bits is not None:
                keep = bits[docs - base]
                if not keep.any():
                    continue
                docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
            all_docs.append(docs)
            all_contrib.append(w * _tfn(tfs, dls, avgdl))
            all_dls.append(dls.astype(np.int64))
        if not all_docs:
            return empty
        cat = np.concatenate(all_docs)
        uniq, first, inv = np.unique(cat, return_index=True,
                                     return_inverse=True)
        acc = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(acc, inv, np.concatenate(all_contrib))
        dl_of = np.concatenate(all_dls)[first]
        fv = _fvf(dl_of, factor, modifier)
        acc = acc * fv if boost_mode == "multiply" else acc + fv
        doc_idx, score = _topk_arrays(uniq, acc, k, after=after)
        return pd.DataFrame({"doc_idx": doc_idx, "score": score})

    return kernel


def boosting_search(
    index: InvertedIndex,
    positive: str,
    negative: str,
    negative_boost: float = 0.5,
    k: int = 10,
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    fetch: str = "auto",
    offset: int = 0,
    search_after: tuple[float, str] | None = None,
) -> DataFrame:
    """ES ``boosting`` query: hits of the ``positive`` query whose
    score is DEMOTED (multiplied by ``negative_boost`` < 1) when the
    doc also matches the ``negative`` query — deprecation/demotion
    ranking where must_not would be too blunt (the doc still returns,
    just lower).  negative_boost ≥ 1 raises, as in ES.

    Physical plan: the negative terms ride the SAME term-pruned
    postings scan as the positive ones (one pushed In over the union —
    exactly how must_not travels); per part the kernel accumulates the
    positive BM25, multiplies the rows in the negative docs' sorted
    union, and emits its top-k — the per-part demotion is applied
    BEFORE the local top-k, so the ≤ k·n_parts candidate bound and the
    (score desc, id asc) merge stay exact.  Filters/routing/pagination
    compose like :func:`search`."""
    if not 0.0 < float(negative_boost) < 1.0:
        raise ValueError("negative_boost must be in (0, 1) — 1 is a "
                         "plain query, 0 is must_not")
    spark = index.postings.sparkSession
    empty = _local_result(spark, [], _HITS_FIELDS)
    analyze_query = QUERY_ANALYZERS.get(index.analyzer, code_search_analyze)
    weights = Counter(analyze_query(positive))
    idf = index.idf_map(list(weights))
    widf = {t: idf[t] * w for t, w in weights.items() if t in idf}
    if not widf:
        return empty
    neg = frozenset(analyze_query(negative))
    cursor = None
    if search_after is not None:
        if offset:
            raise ValueError("offset and search_after are mutually exclusive")
        cursor = _resolve_cursors(index, {"_": search_after})["_"]

    scan_terms = list(widf) + sorted(neg - set(widf))
    cand = index.postings.filter(F.col("term").isin(scan_terms)).select(
        "doc_part", "term", "docs_bin", "tfs_bin", "dls_bin"
    )
    predicates, repo_t = _kw_predicates(lang, repo)
    parts = _route_parts(index, repo_t)
    if parts is not None:
        if not parts:
            return empty
        cand = cand.filter(F.col("doc_part").isin(parts))
    if predicates and index.filters is None:
        raise ValueError(
            "keyword-filtered boosting_search needs the index's filters "
            "sidecar"
        )
    kernel = _make_boosting_kernel(
        widf, index.avgdl, k + offset, index.docs_per_part,
        len(predicates), neg, float(negative_boost), after=cursor,
    )
    if predicates:
        fsel = index.filters.filter(_filters_cond(predicates)).select(
            "doc_part", "field", "value", "bits"
        )
        if parts is not None:
            fsel = fsel.filter(F.col("doc_part").isin(parts))
        scored = (
            cand.groupBy("doc_part")
            .cogroup(fsel.groupBy("doc_part"))
            .applyInPandas(kernel, schema=TOPK_SCHEMA)
        )
    else:
        scored = cand.groupBy("doc_part").applyInPandas(
            _wrap_single(kernel), schema=TOPK_SCHEMA
        )
    return _rank_and_fetch(index, scored.collect(), k, fetch, offset=offset)


def _make_boosting_kernel(
    widf: dict[str, float],
    avgdl: float,
    k: int,
    docs_per_part: int,
    n_predicates: int,
    neg_terms: frozenset[str],
    negative_boost: float,
    after: tuple[float, int] | None = None,
):
    """Per-doc_part boosting kernel: positive BM25 accumulation, then
    scores of docs in the negative union multiply by negative_boost
    BEFORE the local top-k (the demotion is per-doc, so per-part top-k
    under the demoted order merges exactly)."""

    def kernel(post_pdf: pd.DataFrame, filter_pdf=None) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_idx": [], "score": []})
        if len(post_pdf) == 0:
            return empty
        bits = None
        base = 0
        if n_predicates:
            bits = _fold_filter_bits(filter_pdf, n_predicates, docs_per_part)
            if bits is None:
                return empty
            base = int(filter_pdf["doc_part"].iloc[0]) * docs_per_part

        neg_docs = []
        all_docs: list[np.ndarray] = []
        all_contrib: list[np.ndarray] = []
        for row in post_pdf.itertuples(index=False):
            docs, tfs, dls = unpack_postings(
                bytes(row.docs_bin), bytes(row.tfs_bin), bytes(row.dls_bin)
            )
            docs = docs.astype(np.int64)
            if row.term in neg_terms:
                neg_docs.append(docs)
            w = widf.get(row.term)
            if w is None:
                continue
            if bits is not None:
                keep = bits[docs - base]
                if not keep.any():
                    continue
                docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
            all_docs.append(docs)
            all_contrib.append(w * _tfn(tfs, dls, avgdl))
        if not all_docs:
            return empty
        uniq, inv = np.unique(np.concatenate(all_docs), return_inverse=True)
        acc = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(acc, inv, np.concatenate(all_contrib))
        if neg_docs:
            excl = np.unique(np.concatenate(neg_docs))
            acc = np.where(_sorted_member(uniq, excl),
                           acc * negative_boost, acc)
        doc_idx, score = _topk_arrays(uniq, acc, k, after=after)
        return pd.DataFrame({"doc_idx": doc_idx, "score": score})

    return kernel


def suggest_terms(
    index: InvertedIndex,
    text: str,
    size: int = 5,
    max_edits: int = 2,
    prefix_length: int = 1,
    suggest_mode: str = "missing",
    sort: str = "score",
) -> DataFrame:
    """ES term suggester ("did you mean") — the Lucene
    DirectSpellChecker analog.  Analyzes ``text`` with the index's
    query chain and, for each distinct term, proposes vocabulary terms
    within ``max_edits`` Levenshtein edits sharing ``prefix_length``
    leading chars, scored with DirectSpellChecker's normalized edit
    similarity ``1 − distance / min(len(term), len(candidate))``.

    ``suggest_mode``: ``"missing"`` (suggest only for terms NOT in the
    vocabulary — the ES default), ``"popular"`` (only candidates more
    frequent than the input term), ``"always"``.  ``sort``:
    ``"score"`` (similarity desc, df desc, term asc) or
    ``"frequency"`` (df desc, similarity desc, term asc) — the ES
    knob names.  Returns (term, suggestion, score, df) rows, ≤
    ``size`` per input term.

    Physical plan: ONE term_stats scan with the OR of every input
    term's (length band AND pushed prefix-startswith AND JVM
    ``levenshtein``) predicate — the same bounded vocabulary-
    neighborhood scan as :func:`expand_fuzzy` (Lucene walks a
    Levenshtein automaton over the FST; the Spark analog keeps the
    exact distance inside whole-stage codegen).  Input-term dfs come
    from one bucket-pruned :func:`_term_dfs` lookup; candidates
    resolve driver-side over the bounded match set."""
    from functools import reduce

    if suggest_mode not in ("missing", "popular", "always"):
        raise ValueError(
            f"suggest_mode must be missing|popular|always, got {suggest_mode!r}"
        )
    if sort not in ("score", "frequency"):
        raise ValueError(f"sort must be score|frequency, got {sort!r}")
    if size < 1 or max_edits < 0 or prefix_length < 0:
        raise ValueError("size >= 1, max_edits >= 0, prefix_length >= 0 "
                         "required")
    analyze_query = QUERY_ANALYZERS.get(index.analyzer, code_search_analyze)
    terms = list(dict.fromkeys(analyze_query(text)))
    spark = index.postings.sparkSession
    fields = [("term", "string"), ("suggestion", "string"),
              ("score", "double"), ("df", "long")]
    if not terms:
        return _local_result(spark, [], fields)

    own_df = _term_dfs(index, terms)
    conds = []
    for t in terms:
        c = (
            (F.length("term") >= len(t) - max_edits)
            & (F.length("term") <= len(t) + max_edits)
        )
        if prefix_length:
            c = c & F.col("term").startswith(t[:prefix_length])
        conds.append(c & (F.levenshtein(F.col("term"), F.lit(t)) <= max_edits))
    rows = (
        index.term_stats.filter(reduce(lambda a, b: a | b, conds))
        .select("term", "df")
        .collect()
    )

    # round-6 ADVICE fix: the collected rows satisfy the OR of every
    # input term's pushed predicate — pre-bucket them by prefix and
    # apply each term's length band BEFORE the exact Levenshtein, so a
    # candidate admitted only by ANOTHER term's predicate never costs a
    # Python distance computation (the old loop was O(T·R) _lev_dist)
    by_pfx: dict[str, list] | None = None
    if prefix_length:
        by_pfx = {}
        for r in rows:
            by_pfx.setdefault(r["term"][:prefix_length], []).append(r)

    out: list[tuple] = []
    for t in terms:
        if suggest_mode == "missing" and own_df.get(t, 0) > 0:
            continue
        pool = (by_pfx.get(t[:prefix_length], [])
                if by_pfx is not None else rows)
        lo, hi = len(t) - max_edits, len(t) + max_edits
        cands = []
        for r in pool:
            c = r["term"]
            if c == t or not (lo <= len(c) <= hi):
                continue
            d = _lev_dist(c, t)
            if d > max_edits:
                continue
            df = int(r["df"])
            if suggest_mode == "popular" and df <= own_df.get(t, 0):
                continue
            score = 1.0 - d / min(len(t), len(c))
            cands.append((score, df, c))
        if sort == "score":
            cands.sort(key=lambda x: (-x[0], -x[1], x[2]))
        else:
            cands.sort(key=lambda x: (-x[1], -x[0], x[2]))
        out.extend((t, c, s, df) for s, df, c in cands[:size])
    return _local_result(spark, out, fields)


def _wildcard_to_regex(pattern: str) -> str:
    """Translate an ES wildcard pattern (``*`` = any run, ``?`` = any
    one char) into an anchored regex using only syntax Java regex and
    RE2/DuckDB agree on (literal chars escaped one-by-one)."""
    import re as _re

    out = ["^"]
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(_re.escape(ch))
    out.append("$")
    return "".join(out)


def expand_wildcard(
    index: InvertedIndex, pattern: str, max_expansions: int = 50
) -> list[str]:
    """Wildcard term expansion — the ES ``wildcard`` query's multi-term
    rewrite.  The pattern is normalized like an indexed token
    (lowercase + asciifold; ``*``/``?`` survive), its literal prefix
    (the chars before the first wildcard) pushes to the term_stats scan
    as ``startswith`` — the same trick Lucene plays, which is why ES
    docs warn about leading-``*`` patterns — and the anchored regex
    match runs JVM-side (``rlike``, whole-stage codegen).  Matches rank
    (df desc, term asc) and cap at ``max_expansions`` like the other
    multi-term rewrites."""
    return _expand_wildcards(index, {"_": (pattern, max_expansions)})["_"]


def _expand_wildcards(
    index: InvertedIndex, wants: dict[str, tuple[str, int]]
) -> dict[str, list[str]]:
    """Batch form of :func:`expand_wildcard`: one (term, df) scan with
    the OR'd (literal-prefix + regex) predicates pushed; per-entry
    membership re-checks and the ranked cap resolve driver-side."""
    import re as _re
    from functools import reduce

    norm: dict[str, tuple[str, int]] = {}
    conds = []
    for key, (pattern, cap) in wants.items():
        p = fold_ascii(str(pattern).lower())
        if not p.replace("*", "").replace("?", ""):
            raise ValueError(
                "wildcard pattern needs at least one literal character"
            )
        if cap < 1:
            raise ValueError("max_expansions must be >= 1")
        rx = _wildcard_to_regex(p)
        norm[key] = (rx, int(cap))
        lit = _re.split(r"[*?]", p, maxsplit=1)[0]
        c = F.col("term").rlike(rx)
        if lit:
            c = F.col("term").startswith(lit) & c
        conds.append(c)
    rows = (
        index.term_stats.filter(reduce(lambda a, b: a | b, conds))
        .select("term", "df")
        .collect()
    )
    out: dict[str, list[str]] = {}
    for key, (rx, cap) in norm.items():
        crx = _re.compile(rx)
        m = sorted(
            ((int(r["df"]), r["term"]) for r in rows if crx.match(r["term"])),
            key=lambda x: (-x[0], x[1]),
        )
        out[key] = [t for _, t in m[:cap]]
    return out


def wildcard_search(
    index: InvertedIndex,
    pattern: str,
    k: int = 10,
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    max_expansions: int = 50,
    fetch: str = "auto",
    offset: int = 0,
    search_after: tuple[float, str] | None = None,
) -> DataFrame:
    """ES ``wildcard`` query: top-k docs containing any vocabulary term
    matching the ``*``/``?`` pattern, scored as the bool-should sum of
    the expansions' BM25 — the same top-terms scoring rewrite and
    shared machinery as :func:`prefix_search` / :func:`fuzzy_search`
    (filters, routing, pagination, cursors compose)."""
    spark = index.postings.sparkSession
    terms = expand_wildcard(index, pattern, max_expansions=max_expansions)
    if not terms:
        return _local_result(spark, [], _HITS_FIELDS)
    cursor = None
    if search_after is not None:
        if offset:
            raise ValueError("offset and search_after are mutually exclusive")
        cursor = _resolve_cursors(index, {"_": search_after})["_"]
    scored = score_plan(index, "", k=k + offset, lang=lang, repo=repo,
                        after_cursor=cursor,
                        pre_weights={t: 1.0 for t in terms})
    if scored is None:
        return _local_result(spark, [], _HITS_FIELDS)
    return _rank_and_fetch(index, scored.collect(), k, fetch, offset=offset)


def _validate_regexp(pattern: str) -> str:
    """Validate an ES ``regexp`` pattern and return its anchored form.

    ES/Lucene regexp queries match the WHOLE term (implicit anchors) in
    Lucene regex syntax (``elastic`` maps analyzed terms, so patterns
    match against lowercased+folded vocabulary — the pattern itself is
    NOT analyzed, per ES).  We accept the portable core on which Java
    regex (Spark ``rlike``), RE2 (DuckDB's ``regexp_matches``) and
    Python ``re`` agree — literals, ``.``, classes ``[...]``, groups
    ``(...)``, alternation ``|``, quantifiers ``? * + {m,n}`` and
    backslash escapes — and reject constructs the engines disagree on
    or that Lucene reserves for optional operators: lookaround
    ``(?...)`` (``(?:`` excepted), backreferences, and unescaped
    ``~ & < > @ # ^ $``."""
    import re as _re

    if not pattern:
        raise ValueError("regexp pattern must be non-empty")
    i, depth = 0, 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\":
            if i + 1 >= len(pattern):
                raise ValueError("regexp pattern ends in a bare backslash")
            if pattern[i + 1].isdigit():
                raise ValueError(
                    "backreferences are not portable regex; not supported"
                )
            i += 2
            continue
        if ch == "[":  # char class: skip to its close, ] first is literal
            j = i + 1
            if j < len(pattern) and pattern[j] == "^":
                j += 1
            if j < len(pattern) and pattern[j] == "]":
                j += 1
            while j < len(pattern) and pattern[j] != "]":
                j += 2 if pattern[j] == "\\" else 1
            if j >= len(pattern):
                raise ValueError("unclosed character class in regexp")
            i = j + 1
            continue
        if ch in "~&<>@#^$":
            raise ValueError(
                f"unescaped {ch!r}: Lucene optional operators / anchors "
                "are not supported (patterns are whole-term anchored; "
                "escape the char to match it literally)"
            )
        if ch == "(":
            depth += 1
            if pattern[i + 1 : i + 2] == "?" and pattern[i + 1 : i + 3] != "?:":
                raise ValueError(
                    "lookaround / inline flags are not portable regex; "
                    "not supported"
                )
        elif ch == ")":
            depth -= 1
            if depth < 0:
                raise ValueError("unbalanced ')' in regexp")
        i += 1
    if depth:
        raise ValueError("unbalanced '(' in regexp")
    anchored = f"^(?:{pattern})$"
    try:
        _re.compile(anchored)
    except _re.error as e:
        raise ValueError(f"invalid regexp pattern: {e}") from e
    return anchored


def _regexp_literal_prefix(pattern: str) -> str:
    """Extract the mandatory literal prefix of a regexp — the chars
    every match must start with — for parquet ``startswith`` pushdown
    (Lucene extracts the same common prefix from its automaton).
    Conservative: stops at the first metacharacter, drops a trailing
    char owned by a ``? * {`` quantifier, and returns '' when a
    top-level ``|`` makes any prefix unsound."""
    depth, i = 0, 0
    while i < len(pattern):  # a top-level alternation voids the prefix
        ch = pattern[i]
        if ch == "\\":
            i += 2
            continue
        if ch == "[":
            j = i + 1
            if j < len(pattern) and pattern[j] == "^":
                j += 1
            if j < len(pattern) and pattern[j] == "]":
                j += 1
            while j < len(pattern) and pattern[j] != "]":
                j += 2 if pattern[j] == "\\" else 1
            i = j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "|" and depth == 0:
            return ""
        i += 1
    out: list[str] = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\":
            nxt = pattern[i + 1]
            if nxt.isalnum():  # \d \w \s etc. — a class, not a literal
                break
            out.append(nxt)
            i += 2
            continue
        if ch in ".[]()|+?*{":
            if ch in "?*{" and out:  # quantifier owns the previous char
                out.pop()
            elif ch == "+" and out:  # one-or-more: prev char stays, stop
                pass
            break
        out.append(ch)
        i += 1
    return "".join(out)


def expand_regexp(
    index: InvertedIndex, pattern: str, max_expansions: int = 50
) -> list[str]:
    """Regexp term expansion — the ES ``regexp`` query's multi-term
    rewrite.  The pattern is NOT analyzed (ES semantics: it matches the
    already-lowercased/folded vocabulary terms verbatim), its mandatory
    literal prefix pushes to the term_stats scan as ``startswith``
    (the common-prefix extraction Lucene performs on the pattern's
    automaton), and the anchored match runs JVM-side (``rlike``,
    whole-stage codegen).  Matches rank (df desc, term asc) and cap at
    ``max_expansions`` like the other multi-term rewrites."""
    return _expand_regexps(index, {"_": (pattern, max_expansions)})["_"]


def _expand_regexps(
    index: InvertedIndex, wants: dict[str, tuple[str, int]]
) -> dict[str, list[str]]:
    """Batch form of :func:`expand_regexp`: one (term, df) scan with
    the OR'd (literal-prefix + anchored-regex) predicates pushed;
    per-entry membership re-checks and the ranked cap resolve
    driver-side (rows bounded by the matching vocabulary)."""
    import re as _re
    from functools import reduce

    norm: dict[str, tuple[str, int]] = {}
    conds = []
    for key, (pattern, cap) in wants.items():
        if cap < 1:
            raise ValueError("max_expansions must be >= 1")
        rx = _validate_regexp(str(pattern))
        norm[key] = (rx, int(cap))
        c = F.col("term").rlike(rx)
        lit = _regexp_literal_prefix(str(pattern))
        if lit:
            c = F.col("term").startswith(lit) & c
        conds.append(c)
    rows = (
        index.term_stats.filter(reduce(lambda a, b: a | b, conds))
        .select("term", "df")
        .collect()
    )
    out: dict[str, list[str]] = {}
    for key, (rx, cap) in norm.items():
        crx = _re.compile(rx)
        m = sorted(
            ((int(r["df"]), r["term"]) for r in rows if crx.match(r["term"])),
            key=lambda x: (-x[0], x[1]),
        )
        out[key] = [t for _, t in m[:cap]]
    return out


def regexp_search(
    index: InvertedIndex,
    pattern: str,
    k: int = 10,
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    max_expansions: int = 50,
    fetch: str = "auto",
    offset: int = 0,
    search_after: tuple[float, str] | None = None,
) -> DataFrame:
    """ES ``regexp`` query: top-k docs containing any vocabulary term
    matched by the whole-term-anchored regex, scored as the bool-should
    sum of the expansions' BM25 — the same top-terms scoring rewrite
    and shared machinery as :func:`prefix_search` / :func:`fuzzy_search`
    / :func:`wildcard_search` (filters, routing, pagination, cursors
    compose)."""
    spark = index.postings.sparkSession
    terms = expand_regexp(index, pattern, max_expansions=max_expansions)
    if not terms:
        return _local_result(spark, [], _HITS_FIELDS)
    cursor = None
    if search_after is not None:
        if offset:
            raise ValueError("offset and search_after are mutually exclusive")
        cursor = _resolve_cursors(index, {"_": search_after})["_"]
    scored = score_plan(index, "", k=k + offset, lang=lang, repo=repo,
                        after_cursor=cursor,
                        pre_weights={t: 1.0 for t in terms})
    if scored is None:
        return _local_result(spark, [], _HITS_FIELDS)
    return _rank_and_fetch(index, scored.collect(), k, fetch, offset=offset)


def prefix_search(
    index: InvertedIndex,
    prefix: str,
    k: int = 10,
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    max_expansions: int = 50,
    fetch: str = "auto",
    offset: int = 0,
    search_after: tuple[float, str] | None = None,
) -> DataFrame:
    """ES ``prefix`` query (trailing-``*`` in query_string): top-k docs
    containing ANY vocabulary term starting with ``prefix``, scored as
    the bool-should sum of the expanded terms' BM25 (the top-terms
    scoring rewrite: each doc scores over the expansions it contains).

    Two bounded phases: :func:`expand_prefix` resolves the prefix to
    ≤ ``max_expansions`` concrete terms against the term dictionary,
    then the ordinary multi-term scoring job runs with those terms
    pushed to the postings scan — identical machinery (filters,
    routing, pagination, cursors) to :func:`search`.
    """
    spark = index.postings.sparkSession
    terms = expand_prefix(index, prefix, max_expansions=max_expansions)
    if not terms:
        return _local_result(spark, [], _HITS_FIELDS)
    cursor = None
    if search_after is not None:
        if offset:
            raise ValueError("offset and search_after are mutually exclusive")
        cursor = _resolve_cursors(index, {"_": search_after})["_"]
    scored = score_plan(index, "", k=k + offset, lang=lang, repo=repo,
                        after_cursor=cursor,
                        pre_weights={t: 1.0 for t in terms})
    if scored is None:
        return _local_result(spark, [], _HITS_FIELDS)
    return _rank_and_fetch(index, scored.collect(), k, fetch, offset=offset)


def _rank_and_fetch(
    index: InvertedIndex, cand_rows: list, k: int, fetch: str,
    offset: int = 0,
) -> DataFrame:
    """Shared fetch phase: bounded candidate (doc_idx, score) rows →
    rows [offset, offset+k) of the global order with metadata from the
    hit doc_parts only (driver-side point reads, or the doc_part-pruned
    broadcast join as the distributed fallback)."""
    spark = index.postings.sparkSession
    out_cols = ["id", "score", "repo", "path", "lang"]
    n = k + offset
    if not cand_rows:
        return _local_result(spark, [], _HITS_FIELDS)
    cand_rows.sort(key=lambda r: -r["score"])
    if len(cand_rows) > n:
        # keep every row tying the nth score: the (score desc, id asc)
        # tie-break needs the ids, resolved below
        kth = cand_rows[n - 1]["score"]
        cand_rows = [r for r in cand_rows if r["score"] >= kth]

    meta = None
    if fetch != "spark":
        meta = _fetch_doc_meta(
            index, [int(r["doc_idx"]) for r in cand_rows],
            ["id", "repo", "path", "lang"],
        )
    if meta is not None:
        rows = [
            (m["id"], float(r["score"]), m["repo"], m["path"], m["lang"])
            for r in cand_rows
            if (m := meta.get(int(r["doc_idx"]))) is not None
        ]
        rows.sort(key=lambda t: (-t[1], t[0]))
        return _local_result(spark, rows[offset:n], _HITS_FIELDS)

    local = spark.createDataFrame(
        [(int(r["doc_idx"]), float(r["score"])) for r in cand_rows],
        "doc_idx long, score double",
    )
    ds = index.doc_stats
    if index.docs_per_part > 0:
        hit_parts = sorted(
            {int(r["doc_idx"]) // index.docs_per_part for r in cand_rows}
        )
        ds = ds.filter(F.col("doc_part").isin(hit_parts))
    hits = (
        F.broadcast(local)
        .join(ds.select("doc_idx", "id", "repo", "path", "lang"), "doc_idx")
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(n)
        .select(*out_cols)
    )
    if offset:
        # bounded local result (≤ n rows): slice driver-side to keep
        # the exact global order without a window shuffle
        rows = [tuple(r) for r in hits.collect()][offset:n]
        return _local_result(spark, rows, _HITS_FIELDS)
    return hits


def _wrap_single(kernel):
    def single(pdf: pd.DataFrame) -> pd.DataFrame:
        return kernel(pdf, None)

    return single


def multi_search(
    index: InvertedIndex,
    query: str,
    k: int = 10,
    fields: tuple[str, ...] | None = None,
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    fetch: str = "auto",
    offset: int = 0,
    search_after: tuple[float, str] | None = None,
    mode: str = "sum",
    tie_breaker: float = 0.0,
) -> DataFrame:
    """Multi-field search — see :func:`multi_score_plan` for the lazy
    scoring phase this consumes (split out so plan tests can assert the
    scan shape, exactly like ``score_plan``/``search``).

    ``search_after=(score, id)`` pages the multi-field ranking with the
    same O(k)-per-page cursor as :func:`search` (ES supports
    search_after on any query shape); mutually exclusive with
    ``offset``.

    ``mode``: how per-field scores combine per document —
    ``"sum"`` (ES ``multi_match type=most_fields`` / the bool-should
    sum GitLab's blob query uses, the default) or ``"dis_max"``
    (ES ``type=best_fields``, Lucene DisjunctionMaxQuery: the BEST
    field's score wins, plus ``tie_breaker`` × the other fields' —
    the ES default multi_match type, tuned for "one field should
    match well" rather than "many fields each match a bit")."""
    spark = index.postings.sparkSession
    cursor = None
    if search_after is not None:
        if offset:
            raise ValueError("offset and search_after are mutually exclusive")
        cursor = _resolve_cursors(index, {"_": search_after})["_"]
    scored = multi_score_plan(index, query, k=k + offset, fields=fields,
                              lang=lang, repo=repo, after_cursor=cursor,
                              mode=mode, tie_breaker=tie_breaker)
    if scored is None:
        return _local_result(spark, [], _HITS_FIELDS)
    return _rank_and_fetch(index, scored.collect(), k, fetch, offset=offset)


def _parse_field_boosts(
    fields: tuple[str, ...],
) -> list[tuple[str, float]]:
    """Parse the ES multi_match field-boost syntax: ``"file_name^3"``
    boosts that field's BM25 contribution 3× (Lucene BoostQuery over
    the field's should clauses — the boost multiplies each clause's
    idf weight, exactly how Lucene folds query boosts into the
    weight).  A bare name boosts 1.0; duplicates (after stripping the
    boost) and non-positive boosts raise."""
    out: list[tuple[str, float]] = []
    seen: set[str] = set()
    for f in fields:
        name, sep, b = str(f).partition("^")
        boost = 1.0
        if sep:
            try:
                boost = float(b)
            except ValueError:
                raise ValueError(f"bad field boost {f!r}") from None
            if not boost > 0:
                raise ValueError(f"field boost must be > 0: {f!r}")
        if name in seen:
            raise ValueError(f"duplicate field {name!r} in fields")
        seen.add(name)
        out.append((name, boost))
    return out


def multi_score_plan(
    index: InvertedIndex,
    query: str,
    k: int = 10,
    fields: tuple[str, ...] | None = None,
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    after_cursor: tuple[float, int] | None = None,
    mode: str = "sum",
    tie_breaker: float = 0.0,
) -> DataFrame | None:
    """Multi-field search — the ES bool-should shape GitLab issues over
    blobs (content + file_name + path, elastic/index.go:137-168): each
    field analyzes the query with ITS search chain, scores BM25 with
    ITS df/avgdl, and a document's score is the SUM of its per-field
    scores (Lucene BooleanQuery should-clause sum).  A file whose NAME
    matches is found even when the name never appears in its content.

    ``fields``: names to search — "content" plus any of the index's
    extra fields (default: content + all built fields).  A name may
    carry the ES boost syntax ``"file_name^3"``: the boost multiplies
    that field's clause weights (Lucene folds query boosts into the
    weight the same way), so a name match can outrank content matches —
    the ES blob mapping GitLab tunes with exactly this knob.  Physical plan
    mirrors :func:`search`: every field's postings table shares the
    doc_part space, so the per-part kernel sums across fields locally
    and only ≤ (offset+k)·n_parts candidate rows leave the partitions;
    keyword filters/routing ride the same sidecar bitmaps and part_meta
    pruning.

    ``mode="dis_max"`` switches the per-doc combine from the
    bool-should SUM to Lucene's DisjunctionMaxQuery: score =
    max(field scores) + tie_breaker · (sum − max).  ES ``multi_match``
    defaults to exactly this (``type=best_fields``, tie_breaker 0);
    the physical plan is identical — the kernel just keys its local
    accumulation by (doc, field) before combining, so the same
    ≤ k·n_parts candidate rows leave the partitions.
    """
    if mode not in ("sum", "dis_max"):
        raise ValueError(f"mode must be 'sum' or 'dis_max', got {mode!r}")
    if not 0.0 <= tie_breaker <= 1.0:
        raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")
    if mode == "sum" and tie_breaker:
        raise ValueError("tie_breaker only applies to mode='dis_max'")
    built = index.fields or {}
    if fields is None:
        fields = ("content", *sorted(built))
    boosted = _parse_field_boosts(fields)
    unknown = [f for f, _ in boosted if f != "content" and f not in built]
    if unknown:
        raise ValueError(
            f"index has no field(s) {unknown!r} "
            f"(build_index(fields=...) to add them)"
        )

    # per-field analyzed terms and idf-weighted term weights
    widf_by_fld: dict[int, dict[str, float]] = {}
    avgdl_by_fld: dict[int, float] = {}
    srcs: list[DataFrame] = []
    for i, (f, boost) in enumerate(boosted):
        if f == "content":
            chain = QUERY_ANALYZERS.get(index.analyzer, code_search_analyze)
            weights = Counter(chain(query))
            idf = index.idf_map(list(weights))
            post, avgdl = index.postings, index.avgdl
        else:
            fh = built[f]
            chain = FIELD_QUERY_ANALYZERS.get(fh.analyzer, code_search_analyze)
            weights = Counter(chain(query))
            idf = index.field_idf(f, list(weights))
            post, avgdl = fh.postings, fh.avgdl
        widf = {t: idf[t] * w * boost for t, w in weights.items() if t in idf}
        if not widf:
            continue
        fld = len(widf_by_fld)
        widf_by_fld[fld] = widf
        avgdl_by_fld[fld] = avgdl
        srcs.append(
            post.filter(F.col("term").isin(list(widf))).select(
                "doc_part", F.lit(fld).alias("fld"), "term",
                "docs_bin", "tfs_bin", "dls_bin",
            )
        )
    if not srcs:
        return None
    cand = srcs[0]
    for s in srcs[1:]:
        cand = cand.unionByName(s)

    predicates, repo_t = _kw_predicates(lang, repo)
    parts = _route_parts(index, repo_t)
    if parts is not None:
        if not parts:
            return None
        cand = cand.filter(F.col("doc_part").isin(parts))
    if predicates and index.filters is None:
        raise ValueError(
            "keyword-filtered multi_search needs the index's filters sidecar"
        )

    kernel = _make_multifield_kernel(
        widf_by_fld, avgdl_by_fld, k, index.docs_per_part,
        len(predicates), after=after_cursor,
        mode=mode, tie_breaker=tie_breaker,
    )
    if predicates:
        fsel = index.filters.filter(_filters_cond(predicates)).select(
            "doc_part", "field", "value", "bits"
        )
        if parts is not None:
            fsel = fsel.filter(F.col("doc_part").isin(parts))
        scored = (
            cand.groupBy("doc_part")
            .cogroup(fsel.groupBy("doc_part"))
            .applyInPandas(kernel, schema=TOPK_SCHEMA)
        )
    else:
        scored = cand.groupBy("doc_part").applyInPandas(
            _wrap_single(kernel), schema=TOPK_SCHEMA
        )
    return scored


def _make_multifield_kernel(
    widf_by_fld: dict[int, dict[str, float]],
    avgdl_by_fld: dict[int, float],
    k: int,
    docs_per_part: int,
    n_predicates: int,
    after: tuple[float, int] | None = None,
    mode: str = "sum",
    tie_breaker: float = 0.0,
):
    """Per-doc_part multi-field kernel: decode every (field, term)
    posting row, weight by that field's idf and normalize by that
    field's avgdl, accumulate per doc, local top-k.  ``mode="sum"``
    accumulates the bool-should SUM; ``mode="dis_max"`` accumulates
    per (doc, field) first and combines max + tie_breaker·(sum − max)
    (Lucene DisjunctionMaxQuery).  Same masking and candidate-bound
    arguments as the single-field kernel; ``after`` is the resolved
    search_after cursor (cursor filtering happens in
    :func:`_topk_arrays`, identical semantics to every other kernel)."""
    n_flds = max(widf_by_fld, default=0) + 1

    def kernel(post_pdf: pd.DataFrame, filter_pdf=None) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_idx": [], "score": []})
        if len(post_pdf) == 0:
            return empty
        bits = None
        base = 0
        if n_predicates:
            bits = _fold_filter_bits(filter_pdf, n_predicates, docs_per_part)
            if bits is None:
                return empty
            base = int(filter_pdf["doc_part"].iloc[0]) * docs_per_part

        all_docs: list[np.ndarray] = []
        all_contrib: list[np.ndarray] = []
        for row in post_pdf.itertuples(index=False):
            fld = int(row.fld)
            w = widf_by_fld[fld].get(row.term)
            if w is None:
                continue
            docs, tfs, dls = unpack_postings(
                bytes(row.docs_bin), bytes(row.tfs_bin), bytes(row.dls_bin)
            )
            docs = docs.astype(np.int64)
            if bits is not None:
                keep = bits[docs - base]
                if not keep.any():
                    continue
                docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
            if mode == "dis_max":
                # key accumulation by (doc, field) so the combine can
                # see each field's clause-sum separately
                all_docs.append(docs * n_flds + fld)
            else:
                all_docs.append(docs)
            all_contrib.append(w * _tfn(tfs, dls, avgdl_by_fld[fld]))
        if not all_docs:
            return empty
        uniq, inv = np.unique(np.concatenate(all_docs), return_inverse=True)
        acc = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(acc, inv, np.concatenate(all_contrib))
        if mode == "dis_max":
            uniq, inv2 = np.unique(uniq // n_flds, return_inverse=True)
            mx = np.zeros(len(uniq), dtype=np.float64)
            np.maximum.at(mx, inv2, acc)  # BM25 contribs are ≥ 0
            sm = np.zeros(len(uniq), dtype=np.float64)
            np.add.at(sm, inv2, acc)
            acc = mx + tie_breaker * (sm - mx)
        doc_idx, score = _topk_arrays(uniq, acc, k, after=after)
        return pd.DataFrame({"doc_idx": doc_idx, "score": score})

    return kernel


def _norm_dl_range(
    dl_range: tuple[int | None, int | None] | None,
) -> tuple[int, int] | None:
    """Validate/normalize an ES range filter over dl: (lo, hi) with
    None = unbounded; returns concrete int bounds or None for no-op."""
    if dl_range is None:
        return None
    lo, hi = dl_range
    lo = 0 if lo is None else int(lo)
    hi = (1 << 62) if hi is None else int(hi)
    if lo > hi:
        raise ValueError(f"dl_range lower bound exceeds upper: {dl_range!r}")
    return (lo, hi)


def _make_part_kernel(
    widf: dict[str, float],
    avgdl: float,
    k: int,
    use_bmw: bool,
    docs_per_part: int = 0,
    n_predicates: int = 0,
    neg_terms: frozenset[str] = frozenset(),
    n_required: int = 0,
    after: tuple[float, int] | None = None,
    min_match: int = 0,
    dl_range: tuple[int, int] | None = None,
    bits_by_part: dict | None = None,
):
    """Per-doc_part scoring kernel (cogroup signature: postings, filters).

    With keyword predicates, the right cogroup side carries one packed
    doc-set row per (field, value); the kernel ORs rows within a field
    and ANDs across fields (ES term/terms filter semantics) into a
    local bitmap and masks every term's decoded (docs, tfn) before
    scoring.  Block
    metadata computed over the unfiltered lists remains a valid (looser)
    upper bound for the masked lists, so BMW stays exact under filters.
    A part lacking a row for some predicate has no qualifying docs.

    ``neg_terms`` (ES bool must_not / simple_query_string ``-term``)
    arrive as extra postings rows in the same term-pruned scan; their
    decoded doc lists are unioned into a sorted exclusion array and
    masked out of every scoring term BEFORE evaluation, so excluded
    docs are never scored and BMW's bounds stay valid (removing docs
    only loosens block maxima).  ``n_required > 0`` switches to
    conjunctive (ES ``operator: and``) evaluation: a doc must match all
    ``n_required`` distinct query terms — a part carrying fewer
    surviving term lists can have no hits, and survivors are found by
    sorted-merge intersection before any scoring work.

    ``min_match > 1`` (ES ``minimum_should_match``) keeps docs matching
    at least that many distinct terms (:func:`_msm_topk`); it overrides
    ``use_bmw`` — the counting evaluation is exhaustive per part, with
    the same ≤ k-rows-out candidate bound.

    ``bits_by_part`` (driver fast path only): a prebuilt
    ``{doc_part: folded bitmap}`` covering every part with qualifying
    docs — the kernel then accepts a POOLED multi-part postings frame
    and resolves each row's bitmap by its own ``doc_part`` (a part
    absent from the dict has no qualifying docs, exactly the
    per-part ``_fold_filter_bits → None`` early-out).  The Spark
    cogroup path never passes it, so its behavior is unchanged.
    """

    def kernel(postings_pdf: pd.DataFrame, filter_pdf=None) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_idx": [], "score": []})
        if len(postings_pdf) == 0:
            return empty
        bits = None
        base = 0
        if n_predicates:
            if bits_by_part is not None:
                if not bits_by_part:
                    return empty
            else:
                bits = _fold_filter_bits(
                    filter_pdf, n_predicates, docs_per_part
                )
                if bits is None:
                    return empty  # some predicate matches nothing here
                base = int(filter_pdf["doc_part"].iloc[0]) * docs_per_part

        excl = None
        if neg_terms:
            neg_docs = [
                unpack_postings(
                    bytes(row.docs_bin), bytes(row.tfs_bin), bytes(row.dls_bin)
                )[0].astype(np.int64)
                for row in postings_pdf.itertuples(index=False)
                if row.term in neg_terms
            ]
            if neg_docs:
                excl = np.unique(np.concatenate(neg_docs))

        terms = []
        for row in postings_pdf.itertuples(index=False):
            if row.term in neg_terms:
                continue
            docs, tfs, dls = unpack_postings(
                bytes(row.docs_bin), bytes(row.tfs_bin), bytes(row.dls_bin)
            )
            docs = docs.astype(np.int64)
            if dl_range is not None:
                # ES range filter over dl — the value rides the entry
                keep = (dls >= dl_range[0]) & (dls <= dl_range[1])
                if not keep.any():
                    continue
                docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
            if n_predicates and bits_by_part is not None:
                pb = bits_by_part.get(int(row.doc_part))
                if pb is None:
                    continue  # this row's part has no qualifying docs
                rbits, rbase = pb
                keep = rbits[docs - rbase]
                if not keep.any():
                    continue
                docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
            elif bits is not None:
                keep = bits[docs - base]
                if not keep.any():
                    continue
                docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
            if excl is not None:
                keep = ~_sorted_member(docs, excl)
                if not keep.any():
                    continue
                docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
            tfn = _tfn(tfs, dls, avgdl)
            # avgdl-free bounds: tfn is ↑ in tf, ↓ in dl, so
            # tfn(max_tf, min_dl) dominates every member (block or list)
            bmax_tfn = _tfn(
                np.asarray(row.block_max_tf, dtype=np.int64),
                np.asarray(row.block_min_dl, dtype=np.int64),
                avgdl,
            )
            terms.append(
                {
                    "w": widf[row.term],
                    "docs": docs,
                    "tfn": tfn,
                    "block_last": np.asarray(row.block_last, dtype=np.int64),
                    "block_max": bmax_tfn,
                    "ub": widf[row.term]
                    * float(_tfn(np.array([row.max_tf]), np.array([row.min_dl]), avgdl)[0]),
                }
            )
        if not terms:
            return empty

        if n_required:
            doc_idx, score = _conjunctive_topk(terms, k, n_required, after)
        elif min_match > 1:
            if len(terms) < min_match:  # too few live clauses here
                return empty
            doc_idx, score = _msm_topk(terms, k, min_match, after)
        elif use_bmw:
            doc_idx, score = _bmw_topk(terms, k, after)
        else:
            doc_idx, score = _exhaustive_topk(terms, k, after)
        return pd.DataFrame({"doc_idx": doc_idx, "score": score})

    return kernel


def _tfn(tfs: np.ndarray, dls: np.ndarray, avgdl: float) -> np.ndarray:
    t = tfs.astype(np.float64)
    denom = t + K1 * (1.0 - B + B * dls.astype(np.float64) / avgdl) if avgdl > 0 else t + K1
    return t / denom


def _exhaustive_topk(terms, k, after=None):
    all_docs = np.concatenate([t["docs"] for t in terms])
    all_contrib = np.concatenate([t["w"] * t["tfn"] for t in terms])
    uniq, inv = np.unique(all_docs, return_inverse=True)
    acc = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(acc, inv, all_contrib)
    return _topk_arrays(uniq, acc, k, after=after)


def _msm_topk(terms, k, min_match, after=None):
    """ES ``minimum_should_match: N`` evaluation: docs matching at least
    ``min_match`` DISTINCT query terms, scored by the same summed BM25
    as the OR path (Lucene's MinShouldMatchSumScorer semantics over
    distinct should clauses).  Evaluation is the exhaustive
    accumulation plus a per-doc matched-clause count — each ``terms``
    entry is one distinct term whose docs are unique, so the count of
    postings rows touching a doc IS its matched-clause count.  WAND
    skipping under an msm constraint is a known refinement (θ must
    account for the m-th best clause bound); the counting kernel keeps
    the candidate bound (≤ k rows out) without it."""
    all_docs = np.concatenate([t["docs"] for t in terms])
    all_contrib = np.concatenate([t["w"] * t["tfn"] for t in terms])
    uniq, inv = np.unique(all_docs, return_inverse=True)
    acc = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(acc, inv, all_contrib)
    cnt = np.bincount(inv, minlength=len(uniq))
    keep = cnt >= min_match
    return _topk_arrays(uniq[keep], acc[keep], k, after=after)


def _sorted_member(a: np.ndarray, sorted_b: np.ndarray) -> np.ndarray:
    """Boolean mask: a[i] in sorted_b — searchsorted membership probe,
    O((|a|+|b|) log |b|) with no hashing (both sides are int64 doc ids)."""
    if len(sorted_b) == 0:
        return np.zeros(len(a), dtype=bool)
    idx = np.searchsorted(sorted_b, a)
    idx[idx == len(sorted_b)] = len(sorted_b) - 1
    return sorted_b[idx] == a


def _conjunctive_topk(terms, k, n_required, after=None):
    """ES ``operator: and`` evaluation: docs matching ALL ``n_required``
    distinct query terms, scored by the same summed BM25 as the OR path.

    Intersection-first (the standard conjunctive DAAT strategy, and why
    ``mode="bmw"`` is moot here): the smallest surviving list seeds the
    candidate set and every further list shrinks it by a sorted-merge
    membership probe, so per-doc scores are only computed for docs
    already known to contain every term.  Cost is bounded by the
    smallest term's posting length, not the union.
    """
    if len(terms) < n_required:
        # a distinct query term has no surviving docs in this part
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    order = sorted(terms, key=lambda t: len(t["docs"]))
    inter = order[0]["docs"]
    for t in order[1:]:
        inter = inter[_sorted_member(inter, t["docs"])]
        if len(inter) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    acc = np.zeros(len(inter), dtype=np.float64)
    for t in terms:
        pos = np.searchsorted(t["docs"], inter)
        acc += t["w"] * t["tfn"][pos]
    return _topk_arrays(inter, acc, k, after=after)


def _topk_arrays(doc_idx: np.ndarray, score: np.ndarray, k: int, after=None):
    if after is not None:
        # ES search_after: keep only docs strictly after the cursor in
        # the (score desc, doc_idx asc) total order — page cost is O(k)
        # at ANY depth, unlike from/size whose cost grows with offset
        a_s, a_d = after
        keep = (score < a_s) | ((score == a_s) & (doc_idx > a_d))
        doc_idx, score = doc_idx[keep], score[keep]
    n = len(doc_idx)
    if n == 0:
        return doc_idx, score
    if n > k:
        # keep every row scoring >= the kth-largest score (ties included),
        # then break ties exactly in the lexsort below
        kth = -np.partition(-score, k - 1)[k - 1]
        keep = np.nonzero(score >= kth)[0]
        doc_idx, score = doc_idx[keep], score[keep]
    order = np.lexsort((doc_idx, -score))[:k]
    return doc_idx[order], score[order]


def _bmw_cursor_can_skip(terms, a_s, max_unskippable_frac=0.25):
    """Decide whether BMW pruning can pay under a search_after cursor.

    With a cursor, θ can never exceed the cursor score ``a_s`` (only
    after-cursor docs — score < a_s, or tied with a later doc_idx —
    enter the heap), so any block whose upper bound w·bmax ≥ a_s is
    UNSKIPPABLE forever.  On a deep cursor over hot terms a_s is tiny,
    nearly every block is unskippable, and the DAAT loop degenerates to
    walking every posting at Python speed while the vectorized
    exhaustive kernel does the same work ~100× faster per element (the
    BENCH.md deep-cursor caveat: 3.2 s vs 1.2 s at depth 5k).  Estimate
    the unskippable block fraction from the block metadata already
    decoded; BMW only runs when most blocks remain skippable (e.g. a
    page-2 cursor on a single hot term, where a_s sits near the score
    ceiling).  The per-term threshold is a_s/n_terms: WAND skips a
    block only when the pivot-set SUM of bounds stays below θ, so on a
    multi-term query a block whose one term already bounds ≥ its equal
    share of a_s is (conservatively) counted unskippable — comparing
    per-term bounds to the full a_s would under-count and leave the
    measured hot-pair cursor pages on the slow DAAT path.
    """
    share = a_s / max(1, len(terms))
    total = unskippable = 0
    for t in terms:
        ub = t["w"] * np.asarray(t["block_max"], dtype=np.float64)
        total += ub.size
        unskippable += int(np.count_nonzero(ub >= share))
    if total == 0:
        return True
    return unskippable / total <= max_unskippable_frac


def _bmw_topk(terms, k, after=None, force=False):
    """Exact block-max WAND over decoded+block metadata.

    Pruning uses a strict bound (< θ): any doc whose upper bound ties θ
    is still evaluated, so results — including the (score desc, doc_idx
    asc) tie-break — are identical to the exhaustive kernel.

    ``after`` (ES search_after cursor, (score, doc_idx)) filters at
    candidate-insert time: docs at-or-before the cursor are evaluated
    but never enter the heap, so θ only reflects after-cursor docs and
    pruning stays exact.  Unlike from/size, cost does not grow with
    page depth — only the cursor-superior docs are scored once each.
    Because θ is then capped at the cursor score, a deep cursor on hot
    terms leaves (almost) no block skippable; the dispatch below routes
    such parts to the vectorized exhaustive kernel (identical results —
    both are exact; the dynamic-pruning literature's deep-paging WAND
    worst case).  ``force=True`` pins the DAAT loop for tests.
    """
    if after is not None and not force and not _bmw_cursor_can_skip(terms, after[0]):
        return _exhaustive_topk(terms, k, after)
    a_key = (after[0], -after[1]) if after is not None else None
    cur = []  # per term: position pointer
    n_t = len(terms)
    ptr = [0] * n_t
    exhausted = [False] * n_t
    heap: list[tuple[float, int]] = []  # (score, -doc_idx): root = worst

    def cur_doc(i):
        return terms[i]["docs"][ptr[i]] if ptr[i] < len(terms[i]["docs"]) else None

    def theta():
        return heap[0][0] if len(heap) >= k else -np.inf

    def block_ub(i, d):
        t = terms[i]
        bi = int(np.searchsorted(t["block_last"], d, side="left"))
        return t["w"] * t["block_max"][min(bi, len(t["block_max"]) - 1)]

    def block_end(i, d):
        t = terms[i]
        bi = int(np.searchsorted(t["block_last"], d, side="left"))
        return int(t["block_last"][min(bi, len(t["block_last"]) - 1)])

    while True:
        live = [(cur_doc(i), i) for i in range(n_t) if cur_doc(i) is not None]
        if not live:
            break
        live.sort()
        th = theta()
        # pivot: smallest prefix of (doc-sorted) terms whose total ub >= θ
        acc_ub = 0.0
        pivot = -1
        for j, (_, i) in enumerate(live):
            acc_ub += terms[i]["ub"]
            if acc_ub >= th:
                pivot = j
                break
        if pivot < 0:
            break  # even all terms together can't reach θ
        pivot_doc = int(live[pivot][0])
        # extend the pivot set over every term currently on pivot_doc —
        # their contributions belong to pivot_doc's bound and score
        while pivot + 1 < len(live) and int(live[pivot + 1][0]) == pivot_doc:
            pivot += 1
        if int(live[0][0]) == pivot_doc:
            # all pivot-set terms aligned on pivot_doc → block-max check
            bub = sum(block_ub(i, pivot_doc) for _, i in live[: pivot + 1])
            if bub >= th:
                s = 0.0
                for d, i in live[: pivot + 1]:
                    if int(d) == pivot_doc:
                        s += terms[i]["w"] * terms[i]["tfn"][ptr[i]]
                        ptr[i] += 1
                cand = (s, -pivot_doc)
                if a_key is not None and not cand < a_key:
                    pass  # at-or-before the cursor: not on this page
                elif len(heap) < k:
                    heapq.heappush(heap, cand)
                elif cand > heap[0]:
                    heapq.heapreplace(heap, cand)
            else:
                # skip to the shallowest block boundary past pivot_doc,
                # capped at the next doc owned by any post-pivot term
                # (those docs still need evaluation)
                nxt = min(block_end(i, pivot_doc) for _, i in live[: pivot + 1]) + 1
                nxt = max(nxt, pivot_doc + 1)
                if pivot + 1 < len(live):
                    nxt = min(nxt, int(live[pivot + 1][0]))
                for _, i in live[: pivot + 1]:
                    t = terms[i]
                    ptr[i] = int(np.searchsorted(t["docs"], nxt, side="left"))
        else:
            # advance all pre-pivot terms to >= pivot_doc
            for d, i in live[:pivot]:
                if int(d) < pivot_doc:
                    t = terms[i]
                    ptr[i] = int(np.searchsorted(t["docs"], pivot_doc, side="left"))

    if not heap:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    items = sorted(heap, key=lambda x: (-x[0], -x[1]))
    return (
        np.array([-d for _, d in items], dtype=np.int64),
        np.array([s for s, _ in items], dtype=np.float64),
    )


def search_many(
    index: InvertedIndex,
    queries: dict[str, str | dict],
    k: int = 10,
    mode: str = "exhaustive",
    fetch: str = "auto",
    offset: int = 0,
) -> DataFrame:
    """Batched top-k: one Spark job scores every query.

    Returns (query_id, rank, id, score) — ``rank`` is the GLOBAL rank
    (page 2 of a query starts at rank offset+1, the ES ``from`` analog).
    Per doc partition, each term's postings are decoded once and reused
    by all queries containing it — the amortization that makes a query
    *service* viable on Spark (per-query jobs pay ~0.3 s scheduling
    floor each; a batch pays it once).

    Full feature parity with :func:`search` and :func:`phrase_search`:
    each entry of ``queries`` is either a plain query string or a spec
    dict ``{"q": str, "lang": str|[str]|None, "repo": str|[str]|None
    (a list is an ES terms filter: match ANY value), "from": int,
    "phrase": bool, "slop": int, "phrase_prefix": bool,
    "fields": [str, ...],
    "prefix": bool, "fuzzy": bool, "wildcard": bool, "regexp": bool,
    "max_edits": int,
    "max_expansions": int, "prefix_length": int,
    "operator": "or"|"and", "must_not": str,
    "minimum_should_match": int, "dl_range": [lo, hi],
    "sort": "FIELD[:asc|desc]" (the ES sorted body: field-ordered hits,
    NO scores — all sorted entries share ONE cogroup job over the union
    of their terms, each part returning its per-entry top-k by the key;
    their search_after cursor is [sort_value, id]),
    "search_after": [score, id]}``, or a ``{"qs": str}`` entry holding
    a full simple_query_string body (pure-term/pure-phrase forms lower
    onto the shared batch jobs; a mixed phrase+term body runs the
    combined bool kernel as one extra job — an ES ``_msearch`` body is
    a full search either way).  ``search_after`` composes with EVERY
    entry shape — plain term, ``operator``/``must_not``, ``phrase``,
    ``fields``, and ``qs`` bodies (ES supports cursors on any query);
    all entries' cursor ids resolve in ONE shared point lookup and each
    page costs O(k) exactly like ``search(search_after=)`` (``rank``
    restarts at 1 on each cursor page, as in ES).  Keyword
    predicates ride the same
    per-part packed bitmaps (B16), repo-scoped entries prune their
    scoring to the doc_parts whose ``part_meta`` range covers the repo
    (B17) — and when EVERY entry is repo-scoped the postings scan itself
    is pruned to the union of their parts.  ``mode="bmw"`` runs the
    block-max WAND kernel per term query over the shared decodes.
    ``offset`` (or a per-entry ``"from"``) slices each query's result
    exactly like ``search(offset=)``: kernels keep top offset+k per
    part and the driver slices [offset, offset+k).  Phrase entries
    (``"phrase": True``) score over the positional sidecar in ONE
    additional job shared by every phrase entry of the batch (the ES
    ``_msearch`` mixed-body analog); multi-field entries
    (``"fields": [...]``) likewise share ONE job over the involved
    fields' postings, each (field, term) decoded once with the field's
    avgdl (bool-should sums identical to :func:`multi_search`); all
    candidates join the same fetch phase.
    """
    spark = index.postings.sparkSession
    analyze_query = QUERY_ANALYZERS.get(index.analyzer, code_search_analyze)
    use_bmw = mode == "bmw"
    empty = _local_result(spark, [], _BATCH_FIELDS)

    specs: dict[
        str, tuple[str, tuple[str, ...] | None, tuple[str, ...] | None]
    ] = {}
    off_by_query: dict[str, int] = {}
    phrase_specs: dict[str, tuple[str, int]] = {}  # qid -> (q, slop)
    pprefix_specs: dict[str, tuple[str, int]] = {}  # qid -> (q, cap)
    prefix_specs: dict[str, tuple[str, int]] = {}  # qid -> (prefix, cap)
    fuzzy_specs: dict[str, tuple[str, int, int, int]] = {}  # (q, edits, cap, plen)
    wild_specs: dict[str, tuple[str, int]] = {}  # qid -> (pattern, cap)
    regexp_specs: dict[str, tuple[str, int]] = {}  # qid -> (pattern, cap)
    mf_specs: dict[str, tuple[str, ...]] = {}  # qid -> field names
    mf_mode_by_query: dict[str, tuple[str, float]] = {}  # qid -> dis_max+tb
    op_by_query: dict[str, str] = {}  # qid -> "and" (default or omitted)
    negq_by_query: dict[str, str] = {}  # qid -> raw must_not string
    msm_by_query: dict[str, int] = {}  # qid -> minimum_should_match (>1)
    dlr_by_query: dict[str, tuple[int, int]] = {}  # qid -> dl range
    sort_specs: dict[str, tuple[str, bool]] = {}  # qid -> (field, asc)
    match_all_qids: set[str] = set()  # sorted match_all bodies
    sort_after: dict[str, tuple] = {}  # qid -> (sort_value, id)
    cursor_specs: dict[str, tuple[float, str]] = {}  # qid -> (score, id)
    mixed_qs: dict[str, dict] = {}  # qid -> parsed mixed qs entry
    for qid, spec in queries.items():
        if isinstance(spec, dict) and spec.get("qs") is not None:
            # simple_query_string entry: lower pure-term / pure-phrase
            # forms onto the shared batch jobs; a MIXED (phrase+term)
            # entry keeps its parse and runs the combined bool kernel
            # as one extra job below (ES _msearch bodies are full
            # searches — semantics identical, cost one job per mixed
            # entry)
            if "q" in spec:
                raise ValueError(
                    f"batch entry {qid!r}: give `q` or `qs`, not both"
                )
            parsed = parse_simple_query_string(str(spec["qs"]))
            op = spec.get("operator", "and")
            if op not in ("or", "and"):
                raise ValueError(
                    f"batch entry {qid!r}: operator must be 'or' or 'and'"
                )
            if not parsed["terms"] and not parsed["phrases"]:
                raise ValueError(
                    f"batch entry {qid!r}: qs needs a positive clause"
                )
            base = {kk: spec[kk]
                    for kk in ("lang", "repo", "from", "search_after")
                    if kk in spec}
            if not parsed["phrases"]:
                spec = {"q": " ".join(parsed["terms"]), "operator": op,
                        **({"must_not": " ".join(parsed["must_not"])}
                           if parsed["must_not"] else {}), **base}
            elif (len(parsed["phrases"]) == 1 and not parsed["terms"]
                  and not parsed["must_not"]):
                spec = {"q": parsed["phrases"][0], "phrase": True, **base}
            else:
                if base.get("search_after") is not None:
                    if base.get("from"):
                        raise ValueError(
                            f"batch entry {qid!r}: from and search_after "
                            "are mutually exclusive"
                        )
                    sa = base["search_after"]
                    cursor_specs[qid] = (float(sa[0]), str(sa[1]))
                mixed_qs[qid] = {"parsed": parsed, "operator": op, **base}
                specs[qid] = (str(queries[qid]["qs"]),
                              _norm_kw(base.get("lang")),
                              _norm_kw(base.get("repo")))
                off_by_query[qid] = int(base.get("from", offset))
                continue
        if isinstance(spec, str):
            specs[qid] = (spec, None, None)
            off_by_query[qid] = offset
        else:
            if spec.get("match_all"):
                # ES match_all body: only meaningful sorted (no scores);
                # rides the shared sort job with an all-docs mask
                if spec.get("sort") is None:
                    raise ValueError(
                        f"batch entry {qid!r}: match_all needs a sort "
                        "(match_all hits carry no relevance order)"
                    )
                if (spec.get("q") or spec.get("phrase") or spec.get("fields")
                        or spec.get("prefix") or spec.get("fuzzy")
                        or spec.get("wildcard") or spec.get("regexp")
                        or spec.get("phrase_prefix")
                        or spec.get("operator", "or") != "or"
                        or spec.get("minimum_should_match", 0)):
                    raise ValueError(
                        f"batch entry {qid!r}: match_all composes with "
                        "sort/lang/repo/must_not/dl_range/from/search_after "
                        "only"
                    )
                match_all_qids.add(qid)
                spec = {**spec, "q": ""}
            specs[qid] = (spec["q"], _norm_kw(spec.get("lang")),
                          _norm_kw(spec.get("repo")))
            off_by_query[qid] = int(spec.get("from", offset))
            if sum(map(bool, (spec.get("phrase"), spec.get("fields"),
                              spec.get("prefix"), spec.get("fuzzy"),
                              spec.get("wildcard"), spec.get("regexp"),
                              spec.get("phrase_prefix"),
                              spec.get("sort")))) > 1:
                raise ValueError(
                    "an entry is phrase OR multi-field OR prefix OR fuzzy "
                    "OR wildcard OR regexp OR phrase_prefix OR sort, not "
                    "several"
                )
            if spec.get("sort") is not None:
                # ES sorted body: field order, no scores — handled by
                # ONE shared sort job below, never the scoring jobs
                field, _, direction = str(spec["sort"]).partition(":")
                if field not in SORT_FIELDS:
                    raise ValueError(
                        f"batch entry {qid!r}: sort must be one of "
                        f"{SORT_FIELDS}"
                    )
                if direction not in ("", "asc", "desc"):
                    raise ValueError(
                        f"batch entry {qid!r}: sort direction must be "
                        "asc or desc"
                    )
                sort_specs[qid] = (field, direction != "desc")
                if spec.get("search_after") is not None:
                    if spec.get("from"):
                        raise ValueError(
                            f"batch entry {qid!r}: from and search_after "
                            "are mutually exclusive"
                        )
                    sv, sid = spec["search_after"]
                    sort_after[qid] = (
                        int(sv) if field == "dl" else str(sv), str(sid)
                    )
            op = spec.get("operator", "or")
            if op not in ("or", "and"):
                raise ValueError(
                    f"batch entry {qid!r}: operator must be 'or' or 'and'"
                )
            if (op == "and" or spec.get("must_not")) and (
                spec.get("phrase") or spec.get("fields") or spec.get("prefix")
                or spec.get("fuzzy") or spec.get("wildcard")
                or spec.get("regexp") or spec.get("phrase_prefix")
            ):
                raise ValueError(
                    f"batch entry {qid!r}: operator='and'/must_not apply to "
                    "plain term entries, not phrase/multi-field/prefix/fuzzy"
                    "/wildcard/regexp/phrase_prefix ones"
                )
            if spec.get("slop") and spec.get("phrase_prefix"):
                raise ValueError(
                    f"batch entry {qid!r}: slop is not supported with "
                    "phrase_prefix"
                )
            msm = int(spec.get("minimum_should_match", 0) or 0)
            if msm < 0:
                raise ValueError(
                    f"batch entry {qid!r}: minimum_should_match must be >= 0"
                )
            if msm > 1:
                if op == "and":
                    raise ValueError(
                        f"batch entry {qid!r}: minimum_should_match applies "
                        "to operator='or'"
                    )
                if (spec.get("phrase") or spec.get("fields")
                        or spec.get("prefix") or spec.get("fuzzy")
                        or spec.get("wildcard") or spec.get("regexp")
                        or spec.get("phrase_prefix")):
                    raise ValueError(
                        f"batch entry {qid!r}: minimum_should_match applies "
                        "to plain term entries"
                    )
                msm_by_query[qid] = msm
            if spec.get("dl_range") is not None:
                if (spec.get("phrase") or spec.get("fields")
                        or spec.get("prefix") or spec.get("fuzzy")
                        or spec.get("wildcard") or spec.get("regexp")
                        or spec.get("phrase_prefix")):
                    raise ValueError(
                        f"batch entry {qid!r}: dl_range applies to plain "
                        "term entries"
                    )
                dlr = _norm_dl_range(tuple(spec["dl_range"]))
                if dlr is not None:
                    dlr_by_query[qid] = dlr
            if op == "and":
                op_by_query[qid] = op
            if spec.get("must_not"):
                negq_by_query[qid] = str(spec["must_not"])
            if (spec.get("search_after") is not None
                    and spec.get("sort") is None):
                if spec.get("from"):
                    raise ValueError(
                        f"batch entry {qid!r}: from and search_after are "
                        "mutually exclusive"
                    )
                sa = spec["search_after"]
                cursor_specs[qid] = (float(sa[0]), str(sa[1]))
            if ((spec.get("mode") or spec.get("tie_breaker"))
                    and not spec.get("fields")):
                raise ValueError(
                    f"batch entry {qid!r}: mode/tie_breaker apply to "
                    "multi-field entries"
                )
            if spec.get("phrase"):
                phrase_specs[qid] = (spec["q"], int(spec.get("slop", 0)))
            elif spec.get("phrase_prefix"):
                pprefix_specs[qid] = (
                    spec["q"], int(spec.get("max_expansions", 50))
                )
            elif spec.get("fields"):
                mf_specs[qid] = tuple(spec["fields"])
                mode = spec.get("mode", "sum")
                if mode not in ("sum", "dis_max"):
                    raise ValueError(
                        f"batch entry {qid!r}: mode must be 'sum' or "
                        f"'dis_max', got {mode!r}"
                    )
                tb = float(spec.get("tie_breaker", 0.0))
                if not 0.0 <= tb <= 1.0:
                    raise ValueError(
                        f"batch entry {qid!r}: tie_breaker must be in [0, 1]"
                    )
                if mode == "sum" and tb:
                    raise ValueError(
                        f"batch entry {qid!r}: tie_breaker only applies to "
                        "mode='dis_max'"
                    )
                if mode == "dis_max":
                    mf_mode_by_query[qid] = (mode, tb)
            elif spec.get("prefix"):
                prefix_specs[qid] = (
                    spec["q"], int(spec.get("max_expansions", 50))
                )
            elif spec.get("fuzzy"):
                fuzzy_specs[qid] = (
                    spec["q"], int(spec.get("max_edits", 1)),
                    int(spec.get("max_expansions", 50)),
                    int(spec.get("prefix_length", 0)),
                )
            elif spec.get("wildcard"):
                wild_specs[qid] = (
                    spec["q"], int(spec.get("max_expansions", 50))
                )
            elif spec.get("regexp"):
                regexp_specs[qid] = (
                    spec["q"], int(spec.get("max_expansions", 50))
                )
    if any(v < 0 for v in off_by_query.values()):
        raise ValueError("from/offset must be >= 0")
    n_by_query = {qid: k + off_by_query[qid] for qid in specs}

    weights = {
        qid: Counter(analyze_query(qs))
        for qid, (qs, _, _) in specs.items()
        if qid not in phrase_specs and qid not in mf_specs
        and qid not in mixed_qs and qid not in prefix_specs
        and qid not in fuzzy_specs and qid not in wild_specs
        and qid not in regexp_specs and qid not in pprefix_specs
        and qid not in sort_specs
    }
    # prefix/fuzzy/wildcard/regexp entries expand driver-side (one shared
    # vocab
    # scan per kind) into already-analyzed term weights, then ride the
    # ordinary shared term jobs like any other entry — see
    # prefix_search / fuzzy_search / wildcard_search
    for specs_d, expander in ((prefix_specs, _expand_prefixes),
                              (fuzzy_specs, _expand_fuzzies),
                              (wild_specs, _expand_wildcards),
                              (regexp_specs, _expand_regexps)):
        if specs_d:
            for qid, terms in expander(index, specs_d).items():
                if terms:
                    weights[qid] = Counter(terms)
    all_terms = sorted({t for w in weights.values() for t in w})
    _meta_local = _term_meta_local(index, all_terms)
    idf = ({t: m[0] for t, m in _meta_local.items()}
           if _meta_local is not None else index.idf_map(all_terms))
    widf_by_query = {
        qid: {t: idf[t] * n for t, n in w.items() if t in idf}
        for qid, w in weights.items()
    }
    widf_by_query = {qid: w for qid, w in widf_by_query.items() if w}
    neg_by_query = {
        qid: frozenset(analyze_query(raw))
        for qid, raw in negq_by_query.items()
    }
    neg_by_query = {qid: n for qid, n in neg_by_query.items() if n}
    nreq_by_query: dict[str, int] = {}
    for qid in list(widf_by_query):
        # same dead/drop rules as score_plan: AND dies on a term both
        # required and excluded or on a required df=0 term; OR drops
        # excluded terms from the should clauses (they can never
        # contribute to a surviving doc)
        neg = neg_by_query.get(qid, frozenset())
        if qid in op_by_query:  # operator="and"
            if neg & set(weights[qid]):
                del widf_by_query[qid]
            elif len(widf_by_query[qid]) < len(weights[qid]):
                del widf_by_query[qid]
            else:
                nreq_by_query[qid] = len(widf_by_query[qid])
        elif neg:
            w = {t: v for t, v in widf_by_query[qid].items() if t not in neg}
            if w:
                widf_by_query[qid] = w
            else:
                del widf_by_query[qid]
    for qid, m in msm_by_query.items():
        # msm dead rule: more required matches than live should clauses
        if qid in widf_by_query and m > len(widf_by_query[qid]):
            del widf_by_query[qid]

    # phrase entries: analyze with the sidecar's chain, idf from ITS dfs
    # (one term-pruned aggregation shared by every phrase entry), exactly
    # like phrase_search
    phrase_q: dict[str, dict] = {}
    if phrase_specs or pprefix_specs:
        import math

        if index.pos_postings is None:
            raise ValueError(
                "phrase entries in search_many need the positional-postings "
                "sidecar (build_index(..., positions=True))"
            )
        p_analyze = {"simple": code_search_analyze,
                     "default": default_analyze}[index.pos_analyzer or "simple"]
        terms_by_qid = {}
        for qid, (qs, slop) in phrase_specs.items():
            if slop < 0:
                raise ValueError("slop must be >= 0")
            pterms = p_analyze(qs)
            if slop and len(set(pterms)) != len(pterms):
                raise ValueError(
                    "slop > 0 with a repeated analyzed term is not supported"
                )
            if pterms:
                terms_by_qid[qid] = pterms
        # phrase_prefix entries: fixed terms join the shared df
        # aggregation; every entry's last-token expansion shares ONE
        # pushed-startswith sidecar scan (see _expand_phrase_prefixes)
        fixed_by_qid: dict[str, list[str]] = {}
        last_by_qid: dict[str, tuple[str, int]] = {}
        for qid, (qs, cap) in pprefix_specs.items():
            ptoks = p_analyze(qs)
            if ptoks:
                fixed_by_qid[qid] = ptoks[:-1]
                last_by_qid[qid] = (ptoks[-1], cap)
        exps_by_qid = (_expand_phrase_prefixes(index, last_by_qid)
                       if last_by_qid else {})
        all_pterms = sorted(
            {t for ts in terms_by_qid.values() for t in ts}
            | {t for ts in fixed_by_qid.values() for t in ts}
        )
        if all_pterms or exps_by_qid:
            dfs = {
                r["term"]: int(r["df"])
                for r in index.pos_postings.filter(
                    F.col("term").isin(all_pterms)
                ).groupBy("term").agg(F.sum("df").alias("df")).collect()
            } if all_pterms else {}
            n_docs = float(index.n_docs)

            def _p_idf(d: int) -> float:
                return math.log(1.0 + (n_docs - d + 0.5) / (d + 0.5))

            p_idf = {t: _p_idf(d) for t, d in dfs.items()}
            for qid, pterms in terms_by_qid.items():
                if any(t not in dfs for t in pterms):
                    continue  # an absent term can't phrase-match anywhere
                phrase_q[qid] = {
                    "terms": list(pterms),
                    "idf_sum": float(sum(p_idf[t] for t in pterms)),
                    "slop": phrase_specs[qid][1],
                }
            for qid, fixed in fixed_by_qid.items():
                exps = exps_by_qid.get(qid) or []
                if not exps or any(t not in dfs for t in fixed):
                    continue  # no expansion / dead fixed term ⇒ no hits
                phrase_q[qid] = {
                    "terms": list(fixed),
                    "alts": [t for t, _ in exps],
                    "idf_sum": float(sum(p_idf[t] for t in fixed)
                                     + sum(_p_idf(d) for _, d in exps)),
                    "slop": 0,
                }

    # multi-field entries: analyze per (entry, field) with the field's
    # chain; idf via the shared memoized maps (content idf + per-field
    # term-pruned aggregations, each field aggregated ONCE for all
    # entries using it)
    mf_q: dict[str, dict[str, dict[str, float]]] = {}  # qid -> fld -> w·idf
    if mf_specs:
        built = index.fields or {}
        for qid, flds in mf_specs.items():
            qs = specs[qid][0]
            fboosts = _parse_field_boosts(flds)
            unknown = [f for f, _ in fboosts
                       if f != "content" and f not in built]
            if unknown:
                raise ValueError(
                    f"batch entry {qid!r}: index has no field(s) {unknown!r}"
                )
            per_fld: dict[str, dict[str, float]] = {}
            for f, boost in fboosts:
                if f == "content":
                    w = Counter(analyze_query(qs))
                    fidf = index.idf_map(list(w))
                else:
                    chain = FIELD_QUERY_ANALYZERS.get(
                        built[f].analyzer, code_search_analyze
                    )
                    w = Counter(chain(qs))
                    fidf = index.field_idf(f, list(w))
                widf = {t: fidf[t] * n * boost
                        for t, n in w.items() if t in fidf}
                if widf:
                    per_fld[f] = widf
            if per_fld:
                mf_q[qid] = per_fld

    # sorted entries (ES sort bodies): analyze + dead rules exactly like
    # sort_search; live ones share ONE cogroup job over the union of
    # their terms (field-ordered, no scores — see _make_batch_sort_kernel)
    sort_q: dict[str, dict] = {}
    if sort_specs:
        s_terms_all = sorted({
            t for qid in sort_specs
            for t in analyze_query(specs[qid][0])
        } | {
            t for qid in sort_specs if qid in neg_by_query
            for t in neg_by_query[qid]
        })
        s_idf = index.idf_map(s_terms_all)
        for qid, (field, asc) in sort_specs.items():
            if qid in match_all_qids:
                sort_q[qid] = {
                    "terms": [], "neg": neg_by_query.get(qid, frozenset()),
                    "n_required": 0, "min_match": 0, "match_all": True,
                    "field": field, "asc": asc,
                    "after": sort_after.get(qid),
                }
                continue
            terms = sorted(set(analyze_query(specs[qid][0])))
            s_live = [t for t in terms if t in s_idf]
            neg = neg_by_query.get(qid, frozenset())
            op_and = qid in op_by_query
            msm = msm_by_query.get(qid, 0)
            if not s_live:
                continue
            n_required = 0
            if op_and:
                if (neg & set(terms)) or len(s_live) < len(terms):
                    continue
                n_required = len(s_live)
            elif neg:
                s_live = [t for t in s_live if t not in neg]
                if not s_live:
                    continue
            if msm > 1 and msm > len(s_live):
                continue
            sort_q[qid] = {
                "terms": s_live, "neg": neg, "n_required": n_required,
                "min_match": msm if msm > 1 else 0,
                "field": field, "asc": asc,
                "after": sort_after.get(qid),
            }

    live = set(widf_by_query) | set(phrase_q) | set(mf_q) | set(sort_q)
    if not live and not mixed_qs:
        return empty

    preds_by_query: dict[str, list[tuple[str, tuple[str, ...]]]] = {}
    for qid in live:
        _, lang, repo = specs[qid]
        p = []
        if lang is not None:
            p.append(("lang", lang))
        if repo is not None:
            p.append(("repo", repo))
        preds_by_query[qid] = p
    needed_preds = sorted({p for ps in preds_by_query.values() for p in ps})
    if needed_preds and index.filters is None:
        raise ValueError(
            "keyword-filtered search_many needs the index's filters sidecar "
            "(rebuild or re-save the index with this version)"
        )

    # B17 routing: one bounded part_meta collect covers every repo-scoped
    # entry; each such query scores only the doc_parts covering ANY of
    # its repos (terms-filter entries route to the union).
    parts_by_query: dict[str, set[int]] = {}
    repos = sorted({
        r for qid in live if specs[qid][2] is not None
        for r in specs[qid][2]
    })
    if repos and index.part_meta is not None:
        cond = None
        for r in repos:
            c = (F.col("repo_min") <= r) & (F.col("repo_max") >= r)
            cond = c if cond is None else (cond | c)
        pm_rows = index.part_meta.filter(cond).select(
            "doc_part", "repo_min", "repo_max"
        ).collect()
        for qid in live:
            repo_t = specs[qid][2]
            if repo_t is None:
                continue
            parts_by_query[qid] = {
                int(r["doc_part"]) for r in pm_rows
                if any(r["repo_min"] <= rv <= r["repo_max"] for rv in repo_t)
            }
        # a repo pruned to zero parts can have no hits — drop it now
        dead = {
            qid for qid, ps in parts_by_query.items() if not ps
        }
        widf_by_query = {
            qid: w for qid, w in widf_by_query.items() if qid not in dead
        }
        phrase_q = {qid: s for qid, s in phrase_q.items() if qid not in dead}
        mf_q = {qid: s for qid, s in mf_q.items() if qid not in dead}
        sort_q = {qid: s for qid, s in sort_q.items() if qid not in dead}
        if (not widf_by_query and not phrase_q and not mf_q and not sort_q
                and not mixed_qs):
            return empty

    out_schema = "query_id string, doc_idx long, score double"

    def _filters_for(qids, scan_parts):
        """Predicate-pruned filters sidecar selection for one job: one
        per-field IN over the union of every entry's requested values."""
        by_field: dict[str, set[str]] = {}
        for q in qids:
            for f, vals in preds_by_query[q]:
                by_field.setdefault(f, set()).update(vals)
        if not any(by_field.values()):
            return None
        cond = None
        for f, vs in sorted(by_field.items()):
            c = (F.col("field") == f) & F.col("value").isin(sorted(vs))
            cond = c if cond is None else (cond | c)
        fsel = index.filters.filter(cond).select(
            "doc_part", "field", "value", "bits"
        )
        if scan_parts is not None:
            fsel = fsel.filter(F.col("doc_part").isin(scan_parts))
        return fsel

    def _scan_parts_for(qids):
        # scan-level pruning is sound only when EVERY live entry of the
        # job is part-restricted; one unrestricted query needs all parts
        if qids and all(q in parts_by_query for q in qids):
            return sorted({p for q in qids for p in parts_by_query[q]})
        return None

    # resolve every live entry's search_after cursor (score, id) →
    # (score, doc_idx) in ONE shared point lookup; each job below
    # (term, phrase, multi-field, mixed qs) slices out its entries
    live_cursor_specs = {
        qid: c for qid, c in cursor_specs.items()
        if qid in widf_by_query or qid in phrase_q or qid in mf_q
        or qid in mixed_qs
    }
    after_all = (
        _resolve_cursors(index, live_cursor_specs)
        if live_cursor_specs else {}
    )

    rows: list = []
    if widf_by_query:
        cols = ["doc_part", "term", "docs_bin", "tfs_bin", "dls_bin"]
        if use_bmw:
            cols += ["block_last", "block_max_tf", "block_min_dl",
                     "max_tf", "min_dl"]
        live_terms = sorted(
            {t for w in widf_by_query.values() for t in w}
            | {t for qid in widf_by_query
               for t in neg_by_query.get(qid, frozenset())}
        )
        cand = index.postings.filter(
            F.col("term").isin(live_terms)
        ).select(*cols)
        scan_parts = _scan_parts_for(set(widf_by_query))
        if scan_parts is not None:
            cand = cand.filter(F.col("doc_part").isin(scan_parts))

        after_by_query = {
            qid: a for qid, a in after_all.items() if qid in widf_by_query
        }
        kernel = _make_batch_kernel(
            widf_by_query, preds_by_query, parts_by_query,
            index.avgdl, n_by_query, use_bmw, index.docs_per_part,
            neg_by_query=neg_by_query, nreq_by_query=nreq_by_query,
            after_by_query=after_by_query, msm_by_query=msm_by_query,
            dlr_by_query=dlr_by_query,
        )
        pred_pairs = sorted({
            (f, v) for q in widf_by_query
            for f, vals in preds_by_query[q] for v in vals
        })
        local_batch = _batch_rows_local(
            index, kernel, live_terms, scan_parts, pred_pairs,
            poolable=(
                not use_bmw
                and not any(q in nreq_by_query for q in widf_by_query)
                and not any(q in parts_by_query for q in widf_by_query)
            ),
        )
        if local_batch is not None:
            rows.extend(local_batch)
        else:
            fsel = _filters_for(set(widf_by_query), scan_parts)
            if fsel is not None:
                scored = (
                    cand.groupBy("doc_part")
                    .cogroup(fsel.groupBy("doc_part"))
                    .applyInPandas(kernel, schema=out_schema)
                )
            else:
                scored = cand.groupBy("doc_part").applyInPandas(
                    _wrap_single(kernel), schema=out_schema
                )
            rows.extend(scored.collect())

    if phrase_q:
        # one additional job scores EVERY phrase entry: the sidecar scan
        # is pruned to the union of their terms, each term's cheap
        # decodes (and pos-blob boundaries) are shared across entries
        p_terms = sorted({
            t for s in phrase_q.values()
            for t in list(s["terms"]) + list(s.get("alts") or [])
        })
        p_cand = index.pos_postings.filter(
            F.col("term").isin(p_terms)
        ).select("doc_part", "term", "docs_bin", "cnt_bin", "dls_bin",
                 "pos_bin")
        p_scan = _scan_parts_for(set(phrase_q))
        if p_scan is not None:
            p_cand = p_cand.filter(F.col("doc_part").isin(p_scan))
        p_avgdl = index.pos_avgdl if index.pos_avgdl is not None else index.avgdl
        p_kernel = _make_batch_phrase_kernel(
            phrase_q, preds_by_query, parts_by_query,
            p_avgdl, n_by_query, index.docs_per_part,
            after_by_query={
                qid: a for qid, a in after_all.items() if qid in phrase_q
            },
        )
        p_fsel = _filters_for(set(phrase_q), p_scan)
        if p_fsel is not None:
            p_scored = (
                p_cand.groupBy("doc_part")
                .cogroup(p_fsel.groupBy("doc_part"))
                .applyInPandas(p_kernel, schema=out_schema)
            )
        else:
            p_scored = p_cand.groupBy("doc_part").applyInPandas(
                _wrap_single(p_kernel), schema=out_schema
            )
        rows.extend(p_scored.collect())

    if mf_q:
        # one additional job scores EVERY multi-field entry: each
        # involved field's postings are scanned once, pruned to the
        # union of that field's terms across entries; the kernel
        # decodes each (field, term) once with the FIELD's avgdl and
        # every entry sums its bool-should scores over the shared
        # decodes
        built = index.fields or {}
        terms_by_fld: dict[str, set] = {}
        for per_fld in mf_q.values():
            for f, widf in per_fld.items():
                terms_by_fld.setdefault(f, set()).update(widf)
        mf_scan = _scan_parts_for(set(mf_q))
        mf_cand = None
        avgdl_by_fld: dict[str, float] = {}
        for f, ts in sorted(terms_by_fld.items()):
            post = index.postings if f == "content" else built[f].postings
            avgdl_by_fld[f] = (
                index.avgdl if f == "content" else built[f].avgdl
            )
            src = post.filter(F.col("term").isin(sorted(ts))).select(
                "doc_part", F.lit(f).alias("fld"), "term",
                "docs_bin", "tfs_bin", "dls_bin",
            )
            if mf_scan is not None:
                src = src.filter(F.col("doc_part").isin(mf_scan))
            mf_cand = src if mf_cand is None else mf_cand.unionByName(src)
        mf_kernel = _make_batch_mf_kernel(
            mf_q, preds_by_query, parts_by_query, avgdl_by_fld,
            n_by_query, index.docs_per_part,
            after_by_query={
                qid: a for qid, a in after_all.items() if qid in mf_q
            },
            modes=mf_mode_by_query,
        )
        mf_fsel = _filters_for(set(mf_q), mf_scan)
        if mf_fsel is not None:
            mf_scored = (
                mf_cand.groupBy("doc_part")
                .cogroup(mf_fsel.groupBy("doc_part"))
                .applyInPandas(mf_kernel, schema=out_schema)
            )
        else:
            mf_scored = mf_cand.groupBy("doc_part").applyInPandas(
                _wrap_single(mf_kernel), schema=out_schema
            )
        rows.extend(mf_scored.collect())

    # sorted entries: ONE additional cogroup job orders EVERY sort
    # body — the postings scan is pruned to the union of their terms,
    # each term's doc list decodes once and is shared by all entries
    # containing it, predicates evaluate directly on the doc_stats
    # metadata columns (no sidecar), and each part emits only its own
    # per-entry top-k by the sort key (the ES sorted-search shard
    # plan).  Sorted hits skip the score-based fetch phase entirely —
    # the kernel already resolves ids from the cogrouped doc_stats.
    sorted_out: list[tuple] = []
    if sort_q:
        s_scan_terms = sorted({
            t for s in sort_q.values()
            for t in list(s["terms"]) + sorted(s["neg"])
        })
        s_cand = index.postings.filter(
            F.col("term").isin(s_scan_terms)
        ).select("doc_part", "term", "docs_bin")
        s_stats = index.doc_stats.select(
            "doc_part", "doc_idx", "id", "repo", "path", "lang", "dl"
        )
        s_scan = _scan_parts_for(set(sort_q))
        if s_scan is not None:
            s_cand = s_cand.filter(F.col("doc_part").isin(s_scan))
            s_stats = s_stats.filter(F.col("doc_part").isin(s_scan))
        s_kernel = _make_batch_sort_kernel(
            sort_q, preds_by_query, parts_by_query, n_by_query,
            index.docs_per_part, dlr_by_query,
        )
        s_rows = (
            s_cand.groupBy("doc_part")
            .cogroup(s_stats.groupBy("doc_part"))
            .applyInPandas(
                s_kernel,
                schema="query_id string, id string, skey string, dl long",
            )
        ).collect()
        s_by_q: dict[str, list] = {}
        for r in s_rows:
            s_by_q.setdefault(r["query_id"], []).append(r)
        for qid, rs in s_by_q.items():
            field, asc = sort_specs[qid]
            fkey = ((lambda r: int(r["dl"])) if field == "dl"
                    else (lambda r: r["skey"] or ""))
            if asc:
                rs.sort(key=lambda r: (fkey(r), r["id"]))
            else:
                rs.sort(key=lambda r: r["id"])
                rs.sort(key=fkey, reverse=True)
            off = off_by_query[qid]
            sorted_out.extend(
                (qid, rank, r["id"], None)
                for rank, r in enumerate(rs[off:off + k], off + 1)
            )

    # mixed simple_query_string entries: each runs the combined bool
    # kernel as its own job (an ES _msearch body is a full search), then
    # joins the same shared fetch phase below
    for qid, m in mixed_qs.items():
        sc = _bool_scored(index, m["parsed"], m["operator"],
                          n_by_query[qid], specs[qid][1], specs[qid][2],
                          after_cursor=after_all.get(qid))
        if sc is None:
            continue
        rows.extend(
            {"query_id": qid, "doc_idx": r["doc_idx"], "score": r["score"]}
            for r in sc.collect()
        )

    # fetch phase, batched: per-query winners resolve driver-side from
    # the bounded candidate set; metadata comes from the hit doc_parts
    # only — point reads (auto) or one doc_part-pruned join (spark) —
    # same pruning argument as the single-query path.
    if not rows:
        return (_local_result(spark, sorted_out, _BATCH_FIELDS)
                if sorted_out else empty)
    by_q: dict[str, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    cand_rows = []
    for qid, rs in by_q.items():
        n_q = n_by_query[qid]
        rs.sort(key=lambda r: -r["score"])
        if len(rs) > n_q:
            kth = rs[n_q - 1]["score"]  # keep nth-score ties for id tie-break
            rs = [r for r in rs if r["score"] >= kth]
            by_q[qid] = rs
        cand_rows.extend(rs)

    meta = None
    if fetch != "spark":
        meta = _fetch_doc_meta(
            index, [int(r["doc_idx"]) for r in cand_rows], ["id"]
        )
    if meta is not None:
        out_rows = []
        for qid, rs in by_q.items():
            off = off_by_query[qid]
            resolved = [
                (qid, m["id"], float(r["score"]))
                for r in rs
                if (m := meta.get(int(r["doc_idx"]))) is not None
            ]
            resolved.sort(key=lambda t: (-t[2], t[1]))
            out_rows.extend(
                (qid, rank, did, s)
                for rank, (_, did, s) in enumerate(
                    resolved[off:off + k], off + 1
                )
            )
        return _local_result(spark, out_rows + sorted_out, _BATCH_FIELDS)

    local = spark.createDataFrame(
        [
            (r["query_id"], int(r["doc_idx"]), float(r["score"]),
             off_by_query[r["query_id"]])
            for r in cand_rows
        ],
        "query_id string, doc_idx long, score double, off int",
    )
    ds = index.doc_stats
    if index.docs_per_part > 0:
        hit_parts = sorted(
            {int(r["doc_idx"]) // index.docs_per_part for r in cand_rows}
        )
        ds = ds.filter(F.col("doc_part").isin(hit_parts))
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    scored_df = (
        F.broadcast(local)
        .join(ds.select("doc_idx", "id"), "doc_idx")
        .withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") > F.col("off")) & (F.col("rank") <= F.col("off") + F.lit(k)))
        .select("query_id", "rank", "id", "score")
    )
    if sorted_out:
        scored_df = scored_df.unionByName(
            _local_result(spark, sorted_out, _BATCH_FIELDS)
        )
    return scored_df


def _make_batch_sort_kernel(
    sort_q: dict[str, dict],
    preds_by_query: dict[str, list[tuple[str, tuple[str, ...]]]],
    parts_by_query: dict[str, set[int]],
    n_by_query: dict[str, int],
    docs_per_part: int,
    dlr_by_query: dict[str, tuple[int, int]] | None = None,
):
    """Per-doc_part kernel for EVERY sorted msearch entry (cogroup
    signature: postings, doc_stats): each term's doc list decodes once
    and is shared by all entries containing it; per entry the matched
    mask follows the facet-kernel bool logic, predicates and the dl
    range evaluate directly on the metadata columns, the cursor filters,
    and only the entry's top-k by (sort key, id) leaves the part.
    Output rows carry the sort key (``skey`` for keyword fields, ``dl``
    for the numeric one) so the driver merge is key-exact."""
    dlr_by_query = dlr_by_query or {}
    from ..functions.codecs import delta_decode, varint_decode

    any_match_all = any(s.get("match_all") for s in sort_q.values())

    def kernel(post_pdf: pd.DataFrame, stats_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": [], "id": [], "skey": [], "dl": []})
        if len(stats_pdf) == 0 or (len(post_pdf) == 0 and not any_match_all):
            return empty
        part = int(stats_pdf["doc_part"].iloc[0])
        base = part * docs_per_part
        masks: dict[str, np.ndarray] = {}
        for row in post_pdf.itertuples(index=False):
            docs = delta_decode(varint_decode(bytes(row.docs_bin)))
            m = np.zeros(docs_per_part, dtype=bool)
            m[docs.astype(np.int64) - base] = True
            masks[row.term] = m

        local_all = stats_pdf["doc_idx"].to_numpy(np.int64) - base
        out = []
        for qid, s in sort_q.items():
            pq = parts_by_query.get(qid)
            if pq is not None and part not in pq:
                continue
            matched = None
            counts = (np.zeros(docs_per_part, dtype=np.int32)
                      if s["min_match"] > 1 else None)
            for t in s["terms"]:
                m = masks.get(t)
                if m is None:
                    m = np.zeros(docs_per_part, dtype=bool)
                if counts is not None:
                    counts += m
                elif matched is None:
                    matched = m.copy()
                elif s["n_required"]:
                    matched &= m
                else:
                    matched |= m
            if counts is not None:
                matched = counts >= s["min_match"]
            if s.get("match_all"):
                matched = np.ones(docs_per_part, dtype=bool)
            if matched is None or not matched.any():
                continue
            for t in sorted(s["neg"]):
                m = masks.get(t)
                if m is not None:
                    matched &= ~m
            sel = stats_pdf[matched[local_all]]
            if not len(sel):
                continue
            for f, vals in preds_by_query.get(qid) or []:
                sel = sel[sel[f].isin(vals)]
                if not len(sel):
                    break
            if not len(sel):
                continue
            dlr = dlr_by_query.get(qid)
            if dlr is not None:
                dlv = sel["dl"].to_numpy(np.int64)
                sel = sel[(dlv >= dlr[0]) & (dlv <= dlr[1])]
                if not len(sel):
                    continue
            field, asc = s["field"], s["asc"]
            if field != "dl":
                sel = sel.assign(**{field: sel[field].fillna("")})
            if s["after"] is not None:
                av, aid = s["after"]
                col, ids = sel[field], sel["id"]
                keep = (((col > av) | ((col == av) & (ids > aid)))
                        if asc else
                        ((col < av) | ((col == av) & (ids > aid))))
                sel = sel[keep]
                if not len(sel):
                    continue
            sel = sel.sort_values(
                [field, "id"], ascending=[asc, True], kind="stable"
            ).head(n_by_query[qid])
            skey = (np.full(len(sel), "", dtype=object) if field == "dl"
                    else sel[field].to_numpy(dtype=object))
            out.append(pd.DataFrame({
                "query_id": qid,
                "id": sel["id"].to_numpy(dtype=object),
                "skey": skey,
                "dl": sel["dl"].to_numpy(np.int64),
            }))
        if not out:
            return empty
        return pd.concat(out, ignore_index=True)

    return kernel


def _make_batch_kernel(
    widf_by_query: dict[str, dict[str, float]],
    preds_by_query: dict[str, list[tuple[str, tuple[str, ...]]]],
    parts_by_query: dict[str, set[int]],
    avgdl: float,
    n_by_query: dict[str, int],
    use_bmw: bool,
    docs_per_part: int,
    neg_by_query: dict[str, frozenset[str]] | None = None,
    nreq_by_query: dict[str, int] | None = None,
    after_by_query: dict[str, tuple[float, int]] | None = None,
    msm_by_query: dict[str, int] | None = None,
    dlr_by_query: dict[str, tuple[int, int]] | None = None,
):
    """Per-doc_part batched kernel: decode each term ONCE, score every
    query against the shared decodes (masked per query by its predicate
    bitmaps; skipped entirely when the query's repo routing excludes this
    part).  Block metadata stays a valid looser bound under masks, so the
    per-query BMW kernel remains exact (same argument as the single-query
    path).  ``neg_by_query`` / ``nreq_by_query`` carry per-entry
    must_not exclusion sets and operator="and" required-term counts —
    exclusion terms share the same decodes, and conjunctive entries use
    the intersection-first evaluation (see :func:`_conjunctive_topk`).
    ``msm_by_query`` carries per-entry minimum_should_match counts
    (> 1): those entries use the clause-counting evaluation
    (:func:`_msm_topk`)."""
    neg_by_query = neg_by_query or {}
    nreq_by_query = nreq_by_query or {}
    after_by_query = after_by_query or {}
    msm_by_query = msm_by_query or {}
    dlr_by_query = dlr_by_query or {}
    keep_dls = bool(dlr_by_query)  # dl-range entries need per-doc dls
    from ..functions.codecs import unpack_doc_set

    def kernel(post_pdf: pd.DataFrame, filter_pdf=None) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": [], "doc_idx": [], "score": []})
        if len(post_pdf) == 0:
            return empty
        part = int(post_pdf["doc_part"].iloc[0])
        base = part * docs_per_part
        bitmaps: dict[tuple[str, str], np.ndarray] = {}
        if filter_pdf is not None and len(filter_pdf):
            for row in filter_pdf.itertuples(index=False):
                bitmaps[(row.field, row.value)] = unpack_doc_set(
                    bytes(row.bits), docs_per_part
                )

        decoded: dict[str, dict] = {}
        for row in post_pdf.itertuples(index=False):
            docs, tfs, dls = unpack_postings(
                bytes(row.docs_bin), bytes(row.tfs_bin), bytes(row.dls_bin)
            )
            ent = {"docs": docs.astype(np.int64), "tfn": _tfn(tfs, dls, avgdl)}
            if keep_dls:
                ent["dls"] = dls
            if use_bmw:
                ent["block_last"] = np.asarray(row.block_last, dtype=np.int64)
                ent["block_max"] = _tfn(
                    np.asarray(row.block_max_tf, dtype=np.int64),
                    np.asarray(row.block_min_dl, dtype=np.int64),
                    avgdl,
                )
                ent["ub_tfn"] = float(
                    _tfn(np.array([row.max_tf]), np.array([row.min_dl]), avgdl)[0]
                )
            decoded[row.term] = ent

        qids: list[str] = []
        didx: list[int] = []
        scores: list[float] = []
        for qid, widf in widf_by_query.items():
            pq = parts_by_query.get(qid)
            if pq is not None and part not in pq:
                continue  # repo routing excludes this part for this query
            bits = None
            missing_pred = False
            for f, vals in preds_by_query.get(qid) or []:
                fb = None  # OR within the field (ES terms filter)
                for v in vals:
                    b = bitmaps.get((f, v))
                    if b is not None:
                        fb = b if fb is None else (fb | b)
                if fb is None:  # no value of this field matches here
                    missing_pred = True
                    break
                bits = fb if bits is None else (bits & fb)
            if missing_pred or (bits is not None and not bits.any()):
                continue
            excl = None
            neg = neg_by_query.get(qid)
            if neg:
                neg_docs = [
                    decoded[t]["docs"] for t in sorted(neg) if t in decoded
                ]
                if neg_docs:
                    excl = (neg_docs[0] if len(neg_docs) == 1
                            else np.unique(np.concatenate(neg_docs)))
            terms = []
            dlr = dlr_by_query.get(qid)
            for t, w in widf.items():
                ent = decoded.get(t)
                if ent is None:
                    continue
                docs, tfn = ent["docs"], ent["tfn"]
                if dlr is not None:
                    keep = (ent["dls"] >= dlr[0]) & (ent["dls"] <= dlr[1])
                    if not keep.any():
                        continue
                    docs, tfn = docs[keep], tfn[keep]
                if bits is not None:
                    keep = bits[docs - base]
                    if not keep.any():
                        continue
                    docs, tfn = docs[keep], tfn[keep]
                if excl is not None:
                    keep = ~_sorted_member(docs, excl)
                    if not keep.any():
                        continue
                    docs, tfn = docs[keep], tfn[keep]
                term = {"w": w, "docs": docs, "tfn": tfn}
                if use_bmw:
                    term["block_last"] = ent["block_last"]
                    term["block_max"] = ent["block_max"]
                    term["ub"] = w * ent["ub_tfn"]
                terms.append(term)
            if not terms:
                continue
            n_q = n_by_query[qid]
            nreq = nreq_by_query.get(qid, 0)
            msm = msm_by_query.get(qid, 0)
            aft = after_by_query.get(qid)
            if msm > 1 and len(terms) < msm:
                continue  # too few live clauses in this part
            d, s = (
                _conjunctive_topk(terms, n_q, nreq, aft) if nreq
                else _msm_topk(terms, n_q, msm, aft) if msm > 1
                else _bmw_topk(terms, n_q, aft) if use_bmw
                else _exhaustive_topk(terms, n_q, aft)
            )
            qids.extend([qid] * len(d))
            didx.extend(d.tolist())
            scores.extend(s.tolist())
        if not qids:
            return empty
        return pd.DataFrame({"query_id": qids, "doc_idx": didx, "score": scores})

    return kernel


def _make_batch_mf_kernel(
    mf_q: dict[str, dict[str, dict[str, float]]],
    preds_by_query: dict[str, list[tuple[str, tuple[str, ...]]]],
    parts_by_query: dict[str, set[int]],
    avgdl_by_fld: dict[str, float],
    n_by_query: dict[str, int],
    docs_per_part: int,
    after_by_query: dict[str, tuple[float, int]] | None = None,
    modes: dict[str, tuple[str, float]] | None = None,
):
    """Per-doc_part BATCHED multi-field kernel (ES ``_msearch`` with
    bool-should bodies): each (field, term) posting row decodes ONCE
    with its FIELD's avgdl; every entry sums w·idf·tfn over its
    (field, term) clauses — the same bool-should sum as
    :func:`multi_search`, amortized across the batch.  Entry-level
    predicates/routing mask exactly like the term batch kernel.
    ``modes`` marks dis_max entries (``{"mode": "dis_max",
    "tie_breaker": t}`` bodies): those accumulate per (doc, field)
    before combining max + t·(sum − max), sharing the same decodes."""
    after_by_query = after_by_query or {}
    modes = modes or {}
    from ..functions.codecs import unpack_doc_set

    def kernel(post_pdf: pd.DataFrame, filter_pdf=None) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": [], "doc_idx": [], "score": []})
        if len(post_pdf) == 0:
            return empty
        part = int(post_pdf["doc_part"].iloc[0])
        base = part * docs_per_part
        bitmaps: dict[tuple[str, str], np.ndarray] = {}
        if filter_pdf is not None and len(filter_pdf):
            for row in filter_pdf.itertuples(index=False):
                bitmaps[(row.field, row.value)] = unpack_doc_set(
                    bytes(row.bits), docs_per_part
                )

        decoded: dict[tuple[str, str], dict] = {}
        for row in post_pdf.itertuples(index=False):
            docs, tfs, dls = unpack_postings(
                bytes(row.docs_bin), bytes(row.tfs_bin), bytes(row.dls_bin)
            )
            decoded[(row.fld, row.term)] = {
                "docs": docs.astype(np.int64),
                "tfn": _tfn(tfs, dls, avgdl_by_fld[row.fld]),
            }

        qids: list[str] = []
        didx: list[int] = []
        scores: list[float] = []
        for qid, per_fld in mf_q.items():
            pq = parts_by_query.get(qid)
            if pq is not None and part not in pq:
                continue
            bits = None
            missing_pred = False
            for f, vals in preds_by_query.get(qid) or []:
                fb = None  # OR within the field (ES terms filter)
                for v in vals:
                    b = bitmaps.get((f, v))
                    if b is not None:
                        fb = b if fb is None else (fb | b)
                if fb is None:
                    missing_pred = True
                    break
                bits = fb if bits is None else (bits & fb)
            if missing_pred or (bits is not None and not bits.any()):
                continue
            dis_max = qid in modes
            n_flds = len(per_fld)
            terms = []
            for fi, (f, widf) in enumerate(per_fld.items()):
                for t, w in widf.items():
                    ent = decoded.get((f, t))
                    if ent is None:
                        continue
                    docs, tfn = ent["docs"], ent["tfn"]
                    if bits is not None:
                        keep = bits[docs - base]
                        if not keep.any():
                            continue
                        docs, tfn = docs[keep], tfn[keep]
                    if dis_max:
                        # key per (doc, field) so the combine sees each
                        # field's clause-sum — same trick as the single
                        # dis_max kernel
                        docs = docs * n_flds + fi
                    terms.append({"w": w, "docs": docs, "tfn": tfn})
            if not terms:
                continue
            if dis_max:
                keys = np.concatenate([t["docs"] for t in terms])
                contrib = np.concatenate(
                    [t["w"] * t["tfn"] for t in terms])
                uniqk, invk = np.unique(keys, return_inverse=True)
                acc = np.zeros(len(uniqk), dtype=np.float64)
                np.add.at(acc, invk, contrib)
                uniq, inv2 = np.unique(uniqk // n_flds,
                                       return_inverse=True)
                mx = np.zeros(len(uniq), dtype=np.float64)
                np.maximum.at(mx, inv2, acc)
                sm = np.zeros(len(uniq), dtype=np.float64)
                np.add.at(sm, inv2, acc)
                tb = modes[qid][1]
                d, s = _topk_arrays(uniq, mx + tb * (sm - mx),
                                    n_by_query[qid],
                                    after=after_by_query.get(qid))
            else:
                d, s = _exhaustive_topk(terms, n_by_query[qid],
                                        after=after_by_query.get(qid))
            qids.extend([qid] * len(d))
            didx.extend(d.tolist())
            scores.extend(s.tolist())
        if not qids:
            return empty
        return pd.DataFrame({"query_id": qids, "doc_idx": didx,
                             "score": scores})

    return kernel


def get_by_id(index: InvertedIndex, doc_id: str) -> DataFrame:
    """B19: point lookup by document id (elastic/client.go:170-185)."""
    return index.doc_stats.filter(F.col("id") == doc_id)


def mget(index: InvertedIndex, doc_ids: list[str]) -> DataFrame:
    """B19 batch: the ES ``_mget`` analog — every requested id in ONE
    doc_stats lookup, missing ids reported ``found=false`` (ES returns
    one entry per requested id, found or not).

    Physical plan: a single pushed ``In()`` filter over the id-sorted
    doc_stats files (row-group pruning, same path as :func:`get_by_id`),
    then the ≤ len(ids)-row hit set broadcast-joins back onto the tiny
    requested-id relation — cost tracks the id list, never the corpus.
    """
    spark = index.doc_stats.sparkSession
    ids = list(dict.fromkeys(doc_ids))
    if not ids:
        raise ValueError("mget needs at least one id")
    req = spark.createDataFrame([(i,) for i in ids], "id string")
    hits = index.doc_stats.filter(F.col("id").isin(ids)).withColumn(
        "found", F.lit(True)
    )
    return req.join(F.broadcast(hits), "id", "left").withColumn(
        "found", F.coalesce(F.col("found"), F.lit(False))
    )


FACET_SCHEMA = "field string, value string, n long"


_MATCH_ALL_FACET_FIELDS = ("lang", "repo")


def _match_all_docs(index, predicates, repo_t, dl_range):
    """Pure-Catalyst relation of every live doc passing the keyword
    filters / routing / dl range — the ES ``match_all`` query in filter
    context.  One column-pruned ``doc_stats`` scan with every predicate
    pushed to parquet (In/EqualTo/range reach the reader); no postings,
    no Python.  Returns ``None`` when routing proves nothing matches.
    ``dl_range`` is pre-normalized concrete bounds (or None)."""
    stats = index.doc_stats.select(
        "doc_part", "doc_idx", "id", "repo", "path", "lang", "dl"
    )
    parts = _route_parts(index, repo_t)
    if parts is not None:
        if not parts:
            return None
        stats = stats.filter(F.col("doc_part").isin(parts))
    for f, vals in predicates:
        stats = stats.filter(F.col(f).isin(list(vals)))
    if dl_range is not None:
        stats = stats.filter(
            (F.col("dl") >= int(dl_range[0])) & (F.col("dl") <= int(dl_range[1]))
        )
    return stats


def _match_all_neg(index, must_not: str | None):
    """Analyzed live must_not terms for a match_all query (dead terms
    exclude nothing)."""
    if not must_not:
        return []
    analyze_query = QUERY_ANALYZERS.get(index.analyzer, code_search_analyze)
    neg = sorted(set(analyze_query(must_not)))
    idf = index.idf_map(neg)
    return [t for t in neg if t in idf]


def _excluded_sel(postings_pdf, stats_pdf: pd.DataFrame, docs_per_part: int):
    """Shared by the match_all must_not kernels: this doc_part's
    doc_stats rows minus the docs matching any excluded term (decoded
    from the cogrouped neg-pruned postings rows).  Predicates/dl-range
    are already pushed into the stats scan natively."""
    from ..functions.codecs import delta_decode, varint_decode

    if postings_pdf is None or not len(postings_pdf):
        return stats_pdf
    part = int(stats_pdf["doc_part"].iloc[0])
    base = part * docs_per_part
    excl = np.zeros(docs_per_part, dtype=bool)
    for row in postings_pdf.itertuples(index=False):
        docs = delta_decode(varint_decode(bytes(row.docs_bin)))
        excl[docs.astype(np.int64) - base] = True
    return stats_pdf[~excl[stats_pdf["doc_idx"].to_numpy(np.int64) - base]]


def _make_match_all_facet_kernel(
    fields: tuple[str, ...], docs_per_part: int, include_total: bool
):
    """match_all + must_not facet kernel (cogroup signature: neg-pruned
    postings, natively-filtered doc_stats): per-part (field, value, n)
    partials from the surviving metadata rows — nothing per-doc leaves
    the partition."""

    def kernel(postings_pdf: pd.DataFrame, stats_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"field": [], "value": [], "n": []})
        if not len(stats_pdf):
            return empty
        sel = _excluded_sel(postings_pdf, stats_pdf, docs_per_part)
        if not len(sel):
            return empty
        frames = []
        for f in fields:
            vc = sel[f].fillna("").value_counts()
            frames.append(pd.DataFrame({
                "field": f,
                "value": vc.index.to_numpy(dtype=object),
                "n": vc.to_numpy(np.int64),
            }))
        if include_total:
            frames.append(pd.DataFrame(
                {"field": ["_total"], "value": [""], "n": [len(sel)]}
            ))
        return pd.concat(frames, ignore_index=True) if frames else empty

    return kernel


def _make_match_all_metric_kernel(docs_per_part: int, interval: int | None):
    """match_all + must_not stats/histogram kernel: dl partials from the
    surviving doc_stats rows (dl is a doc_stats column — no posting
    payloads needed)."""

    def kernel(postings_pdf: pd.DataFrame, stats_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"bucket": [], "n": [], "sum_dl": [], "min_dl": [], "max_dl": []}
        )
        if not len(stats_pdf):
            return empty
        sel = _excluded_sel(postings_pdf, stats_pdf, docs_per_part)
        if not len(sel):
            return empty
        d = sel["dl"].to_numpy(np.int64)
        if interval:
            b = (d // interval) * interval
            ub, cnt = np.unique(b, return_counts=True)
            z = np.zeros(len(ub), dtype=np.int64)
            return pd.DataFrame({"bucket": ub, "n": cnt.astype(np.int64),
                                 "sum_dl": z, "min_dl": z, "max_dl": z})
        return pd.DataFrame({
            "bucket": [0], "n": [int(d.size)], "sum_dl": [int(d.sum())],
            "min_dl": [int(d.min())], "max_dl": [int(d.max())],
        })

    return kernel


def _match_all_cogroup(index, neg_live, stats, kernel, schema):
    """Cogroup plan of the match_all must_not paths: the postings scan
    pruned to ONLY the excluded terms (column-pruned to docs_bin)
    against the natively-filtered doc_stats; per-part partial rows are
    the only shuffle."""
    cand = index.postings.filter(
        F.col("term").isin(list(neg_live))
    ).select("doc_part", "term", "docs_bin")
    return (
        cand.groupBy("doc_part")
        .cogroup(stats.groupBy("doc_part"))
        .applyInPandas(kernel, schema=schema)
    )


def _facet_counts_match_all(
    index, fields, lang, repo, include_total, must_not, dl_range
) -> DataFrame:
    """match_all facet/count plan (see :func:`facet_counts`)."""
    for f in fields:
        if f not in _MATCH_ALL_FACET_FIELDS:
            raise ValueError(
                f"match_all facets support fields {_MATCH_ALL_FACET_FIELDS}, "
                f"got {f!r}"
            )
    spark = index.postings.sparkSession
    empty = _local_result(
        spark, [], [("field", "string"), ("value", "string"), ("n", "long")]
    )
    predicates, repo_t = _kw_predicates(lang, repo)
    dlr = _norm_dl_range(dl_range)
    stats = _match_all_docs(index, predicates, repo_t, dlr)
    if stats is None:
        return empty
    neg_live = _match_all_neg(index, must_not)
    if neg_live:
        partial = _match_all_cogroup(
            index, neg_live, stats,
            _make_match_all_facet_kernel(
                tuple(fields), index.docs_per_part, include_total
            ),
            FACET_SCHEMA,
        )
    else:
        pieces = [
            stats.groupBy(
                F.lit(f).alias("field"),
                F.coalesce(F.col(f), F.lit("")).alias("value"),
            ).agg(F.count(F.lit(1)).alias("n"))
            for f in fields
        ]
        if include_total:
            pieces.append(stats.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit("_total").alias("field"), F.lit("").alias("value"), "n"
            ))
        if not pieces:
            return empty
        partial = pieces[0]
        for p in pieces[1:]:
            partial = partial.unionByName(p)
    return (
        partial.groupBy("field", "value")
        .agg(F.sum("n").alias("n"))
        .filter(F.col("n") > 0)
        .orderBy(F.col("n").desc(), F.col("field"), F.col("value"))
    )


def facet_counts(
    index: InvertedIndex,
    query: str | None,
    fields: tuple[str, ...] = ("lang",),
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    include_total: bool = False,
    operator: str = "or",
    must_not: str | None = None,
    pre_terms: list[str] | None = None,
    minimum_should_match: int = 0,
    dl_range: tuple[int | None, int | None] | None = None,
) -> DataFrame:
    """ES terms-aggregation analog: per-(field, value) counts of ALL
    documents matching the analyzed query (any-term match by default —
    the same matched set BM25 scores; ``operator="and"`` /
    ``must_not`` apply the bool must / must_not semantics of
    :func:`search`, so aggregations stay consistent with the hits they
    accompany), under optional lang/repo keyword filters.
    GitLab's search UI renders exactly this (per-language hit counts
    beside code results; ES ``aggs.terms`` over the mapping's keyword
    fields, elastic/index.go:157-174).

    Physical plan: NOTHING per-doc ever leaves a partition.  Per
    doc_part the kernel unions the query terms' decoded postings into a
    local matched mask, ANDs the predicate bitmaps, then intersects the
    mask with each facet value's packed doc-set from the ``filters``
    sidecar (popcounts, ≤ docs_per_part/8 bytes per value) — emitting
    one (field, value, partial_n) row per value present in the part.
    The only shuffle is the final sum over ≤ n_parts·n_values tiny
    rows.  Postings are read with (term, docs_bin) ONLY (no tf/dl/block
    payloads) so the scan is column-pruned; the term column drives the
    per-term masks the bool semantics need.

    ``include_total=True`` adds a ``("_total", "", n_matched)`` row —
    the ``_count`` API analog (see :func:`match_count`).

    ``pre_terms`` bypasses query analysis with already-analyzed terms
    (the multi-term rewrite seam: counts/facets for prefix / fuzzy /
    wildcard/regexp queries pass their expansions here, so aggregations match
    those hits too); ``query`` is then ignored.

    ``minimum_should_match`` mirrors :func:`search`'s knob so counts
    and facets stay consistent with msm hits: a doc counts only when it
    matches at least N distinct terms (kernel keeps per-doc matched-
    clause counts instead of the boolean union).  ``dl_range`` mirrors
    the ES range filter the same way (the scan then also reads
    dls_bin).

    ``query=None`` (with ``pre_terms=None``) is the ES **match_all**
    query in filter context — aggregations over EVERY live document
    passing the filters (GitLab's repository language-statistics chart
    is exactly this shape).  Without ``must_not`` the whole plan is
    pure Catalyst: a column-pruned doc_stats scan with the predicates
    pushed to parquet, a native groupBy per facet field — no postings,
    no Python, whole-stage codegen end to end.  With ``must_not`` the
    excluded terms' postings cogroup with the filtered doc_stats and a
    per-part kernel subtracts them before the partial counts.  The
    ``operator``/``minimum_should_match`` knobs are ignored for
    match_all (no should clauses to apply them to — ES semantics).
    """
    if operator not in ("or", "and"):
        raise ValueError(f"operator must be 'or' or 'and', got {operator!r}")
    if pre_terms is None and query is None:
        return _facet_counts_match_all(
            index, fields, lang, repo, include_total, must_not, dl_range
        )
    msm = int(minimum_should_match or 0)
    if msm < 0:
        raise ValueError("minimum_should_match must be >= 0")
    if msm > 1 and operator == "and":
        raise ValueError(
            "minimum_should_match applies to operator='or'"
        )
    dlr = _norm_dl_range(dl_range)
    spark = index.postings.sparkSession
    analyze_query = QUERY_ANALYZERS.get(index.analyzer, code_search_analyze)
    terms = (sorted(set(analyze_query(query))) if pre_terms is None
             else sorted(set(pre_terms)))
    idf = index.idf_map(terms)
    live = [t for t in terms if t in idf]
    empty = _local_result(
        spark, [], [("field", "string"), ("value", "string"), ("n", "long")]
    )
    if not live:
        return empty
    neg = frozenset(analyze_query(must_not)) if must_not else frozenset()
    n_required = 0
    if operator == "and":
        # same dead rules as score_plan: required+excluded or df=0 ⇒ ∅
        if (neg & set(terms)) or len(live) < len(terms):
            return empty
        n_required = len(live)
    elif neg:
        live = [t for t in live if t not in neg]
        if not live:
            return empty
    if msm > 1 and msm > len(live):
        return empty  # more required matches than live should clauses

    predicates, repo_t = _kw_predicates(lang, repo)
    if (fields or predicates) and index.filters is None:
        raise ValueError(
            "facet_counts needs the index's filters sidecar "
            "(rebuild or re-save the index with this version)"
        )

    scan_cols = ["doc_part", "term", "docs_bin"]
    if dlr is not None:
        scan_cols.append("dls_bin")  # the range filter needs dl values
    cand = index.postings.filter(
        F.col("term").isin(live + sorted(neg))
    ).select(*scan_cols)
    parts = _route_parts(index, repo_t)
    if parts is not None:
        if not parts:
            return empty
        cand = cand.filter(F.col("doc_part").isin(parts))

    kernel = _make_facet_kernel(
        tuple(fields), predicates, index.docs_per_part, include_total,
        neg_terms=neg, n_required=n_required,
        min_match=msm if msm > 1 else 0, dl_range=dlr,
    )
    if fields or predicates:
        cond = F.col("field").isin(list(fields)) if fields else F.lit(False)
        pc = _filters_cond(predicates)
        if pc is not None:
            cond = cond | pc
        fsel = index.filters.filter(cond).select("doc_part", "field", "value", "bits")
        if parts is not None:
            fsel = fsel.filter(F.col("doc_part").isin(parts))
        partial = (
            cand.groupBy("doc_part")
            .cogroup(fsel.groupBy("doc_part"))
            .applyInPandas(kernel, schema=FACET_SCHEMA)
        )
    else:
        partial = cand.groupBy("doc_part").applyInPandas(
            _wrap_single(kernel), schema=FACET_SCHEMA
        )
    return (
        partial.groupBy("field", "value")
        .agg(F.sum("n").alias("n"))
        .orderBy(F.col("n").desc(), F.col("field"), F.col("value"))
    )


def match_count(
    index: InvertedIndex,
    query: str | None,
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    operator: str = "or",
    must_not: str | None = None,
    pre_terms: list[str] | None = None,
    minimum_should_match: int = 0,
    dl_range: tuple[int | None, int | None] | None = None,
) -> int:
    """ES ``_count`` analog: how many documents match the analyzed
    query (any-term by default; ``operator="and"`` / ``must_not``
    apply the bool must / must_not semantics, under optional keyword
    filters) — same partitioned popcount plan as :func:`facet_counts`,
    no scoring, no fetch.  ``pre_terms`` counts docs matching ANY of
    the given already-analyzed terms (a prefix/fuzzy/wildcard/regexp
    expansion), ignoring ``query``.  ``query=None`` counts every live
    doc passing the filters (ES match_all — pure Catalyst unless
    ``must_not`` is given; see :func:`facet_counts`)."""
    rows = facet_counts(
        index, query, fields=(), lang=lang, repo=repo, include_total=True,
        operator=operator, must_not=must_not, pre_terms=pre_terms,
        minimum_should_match=minimum_should_match, dl_range=dl_range,
    ).collect()
    return int(rows[0]["n"]) if rows else 0


_SIG_FIELDS = [("term", "string"), ("fg", "long"), ("bg", "long"),
               ("score", "double")]


def significant_terms(
    index: InvertedIndex,
    query: str,
    size: int = 10,
    min_doc_count: int = 3,
    sample_parts: int | None = None,
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
) -> DataFrame:
    """ES ``significant_terms`` aggregation — the "uncommonly common"
    terms of a query's match set: terms whose foreground rate (share
    of MATCHING docs containing them) most exceeds their background
    rate (share of ALL docs), scored with ES's JLH —
    ``(fg% − bg%) · (fg% / bg%)`` — and ranked (score desc, term asc).
    Returns (term, fg, bg, score) for the top ``size`` terms with
    foreground df ≥ ``min_doc_count`` (the ES default 3), excluding
    the query's own analyzed terms (they are trivially significant).

    This is the one aggregation whose cost is a SCAN OF THE PART'S
    WHOLE POSTINGS RELATION (every term's doc list intersects the
    matched mask) — exactly why ES documents it as expensive and
    pairs it with the ``sampler`` aggregation.  ``sample_parts=N``
    is that sampler: the foreground restricts to the first N
    doc_parts (a deterministic shard sample; ES samples per shard the
    same way), while the background df stays corpus-global — so cost
    is bounded by N parts' postings regardless of corpus size.  Per
    part the kernel emits one (term, fg_n) row per term present in
    its matches (≤ the matched docs' vocabulary — nothing per-doc
    shuffles); the global sum joins term_stats for the background df.

    Keyword filters compose (the mask ANDs the predicate bitmaps);
    the background stays unfiltered, per ES's default background_set.
    """
    if size < 1 or min_doc_count < 1:
        raise ValueError("size >= 1 and min_doc_count >= 1 required")
    if sample_parts is not None and sample_parts < 1:
        raise ValueError("sample_parts must be >= 1")
    spark = index.postings.sparkSession
    empty = _local_result(spark, [], _SIG_FIELDS)

    analyze_query = QUERY_ANALYZERS.get(index.analyzer, code_search_analyze)
    qterms = sorted(set(analyze_query(query)))
    idf = index.idf_map(qterms)
    live = [t for t in qterms if t in idf]
    if not live:
        return empty

    predicates, repo_t = _kw_predicates(lang, repo)
    parts = _route_parts(index, repo_t)
    if sample_parts is not None:
        sampled = list(range(sample_parts))
        parts = sampled if parts is None else sorted(
            set(parts) & set(sampled))
    if parts is not None and not parts:
        return empty
    if predicates and index.filters is None:
        raise ValueError(
            "filtered significant_terms needs the index's filters sidecar"
        )

    # the FULL per-part postings relation, column-pruned to the doc
    # lists ONLY (the kernel never needs tfs/dls — round-6: ~3× less
    # data crosses into the Python workers) — the documented expensive
    # scan the sampler bounds
    cand = index.postings.select("doc_part", "term", "docs_bin")
    if parts is not None:
        cand = cand.filter(F.col("doc_part").isin(parts))

    kernel = _make_sig_kernel(set(live), index.docs_per_part,
                              len(predicates))
    if predicates:
        fsel = index.filters.filter(_filters_cond(predicates)).select(
            "doc_part", "field", "value", "bits"
        )
        if parts is not None:
            fsel = fsel.filter(F.col("doc_part").isin(parts))
        partial = (
            cand.groupBy("doc_part")
            .cogroup(fsel.groupBy("doc_part"))
            .applyInPandas(kernel, schema="term string, fg long")
        )
    else:
        partial = cand.groupBy("doc_part").applyInPandas(
            _wrap_single(kernel), schema="term string, fg long"
        )

    agg = partial.groupBy("term").agg(F.sum("fg").alias("fg"))
    # the matched-doc total rides the same aggregation as a NULL-term
    # row (no analyzer chain can emit a null term, so the key can never
    # collide with a vocabulary term — the round-5 ADVICE fix replacing
    # the "\x00_total" sentinel string) and rejoins via a broadcast
    # cross join — ONE plan, and Spark reuses the shuffle exchange for
    # both branches
    total = (
        agg.filter(F.col("term").isNull())
        .select(F.col("fg").cast("double").alias("n_matched"))
    )
    n_docs = float(index.n_docs)
    joined = (
        agg.filter(F.col("term").isNotNull()
                   & ~F.col("term").isin(qterms)
                   & (F.col("fg") >= min_doc_count))
        .join(index.term_stats.select("term", "df"), "term")
        .crossJoin(F.broadcast(total))
    )
    fg_rate = F.col("fg") / F.col("n_matched")
    bg_rate = F.col("df") / F.lit(n_docs)
    return (
        joined.select(
            "term", "fg", F.col("df").cast("long").alias("bg"),
            ((fg_rate - bg_rate) * (fg_rate / bg_rate)).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("term").asc())
        .limit(size)
    )


def _make_sig_kernel(
    query_terms: set[str], docs_per_part: int, n_predicates: int
):
    """Per-doc_part significant-terms kernel: build the matched mask
    from the query terms' doc lists (AND the predicate bitmaps), then
    intersect EVERY term's doc list with it — one (term, fg_n) row per
    term present in the matches, plus a NULL-term row carrying the
    part's matched-doc count (the JLH denominator; a null key cannot
    collide with any analyzed term).

    Round-6 ADVICE fix: the vocabulary sweep needs ONLY the doc lists —
    decode ``docs_bin`` alone (never tfs/dls), and reuse the query
    terms' decodes from the mask-building pass instead of decoding them
    twice.  This is the path the repo benchmarks as the expensive
    full-relation scan (the ES ``sampler``-bounded aggregation)."""
    from ..functions.codecs import delta_decode, varint_decode

    def _docs_only(buf) -> np.ndarray:
        return delta_decode(varint_decode(bytes(buf))).astype(np.int64)

    def kernel(post_pdf: pd.DataFrame, filter_pdf=None) -> pd.DataFrame:
        empty = pd.DataFrame({"term": pd.Series([], dtype=object),
                              "fg": pd.Series([], dtype=np.int64)})
        if len(post_pdf) == 0:
            return empty
        part = int(post_pdf["doc_part"].iloc[0])
        base = part * docs_per_part
        bits = None
        if n_predicates:
            bits = _fold_filter_bits(filter_pdf, n_predicates, docs_per_part)
            if bits is None:
                return empty

        mask = np.zeros(docs_per_part, dtype=bool)
        qdocs: dict[str, np.ndarray] = {}
        for row in post_pdf.itertuples(index=False):
            if row.term not in query_terms:
                continue
            docs = _docs_only(row.docs_bin)
            qdocs[row.term] = docs
            mask[docs - base] = True
        if not qdocs:
            return empty
        if bits is not None:
            mask &= bits
        n_matched = int(mask.sum())
        if n_matched == 0:
            return empty

        terms: list = [None]
        fgs: list[int] = [n_matched]
        for row in post_pdf.itertuples(index=False):
            docs = qdocs.get(row.term)
            if docs is None:
                docs = _docs_only(row.docs_bin)
            n = int(mask[docs - base].sum())
            if n:
                terms.append(row.term)
                fgs.append(n)
        return pd.DataFrame({"term": np.asarray(terms, dtype=object),
                             "fg": np.asarray(fgs, dtype=np.int64)})

    return kernel


def scan(
    index: InvertedIndex,
    query: str,
    page_size: int = 1000,
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    operator: str = "or",
    must_not: str | None = None,
    minimum_should_match: int = 0,
    dl_range: tuple[int | None, int | None] | None = None,
    max_pages: int | None = None,
):
    """ES ``scroll`` / point-in-time + ``search_after`` iteration: a
    generator yielding successive pages (lists of hit Rows) of the
    ENTIRE match set in the global (score desc, id asc) order —
    "export every hit", the shape ES now recommends implementing with
    PIT + search_after rather than the legacy scroll API.  Each page
    is one :func:`search` call seeded with the previous page's last
    (score, id) cursor, so every page costs O(page_size) candidate
    rows per partition at any depth (never offset-style deep paging),
    and the full scan streams the match set through the driver one
    bounded page at a time.  The index handle pins a snapshot
    (versioned loads are immutable), giving the point-in-time
    consistency ES scroll contexts exist for.  ``max_pages`` bounds a
    runaway scan; iteration stops at the first short page."""
    if page_size < 1:
        raise ValueError("page_size must be >= 1")
    cursor = None
    pages = 0
    while max_pages is None or pages < max_pages:
        rows = search(
            index, query, k=page_size, lang=lang, repo=repo,
            operator=operator, must_not=must_not,
            minimum_should_match=minimum_should_match,
            dl_range=dl_range, search_after=cursor,
        ).collect()
        if not rows:
            return
        yield rows
        pages += 1
        if len(rows) < page_size:
            return
        last = rows[-1]
        cursor = (float(last["score"]), last["id"])


def scan_all(
    index: InvertedIndex,
    query: str,
    page_size: int = 1000,
    **knobs,
) -> DataFrame:
    """Materialize :func:`scan`'s pages into one DataFrame — the
    whole match set in global order (the gate/test shape; real
    exports consume the generator page by page)."""
    spark = index.postings.sparkSession
    rows = [tuple(r) for page in scan(index, query, page_size, **knobs)
            for r in page]
    return _local_result(spark, rows, _HITS_FIELDS)


GROUPED_SCHEMA = "value string, doc_idx long, score double"
_GROUPED_HIT_FIELDS = [("value", "string"), ("rank", "int"),
                       ("id", "string"), ("score", "double"),
                       ("repo", "string"), ("path", "string"),
                       ("lang", "string")]


def grouped_search(
    index: InvertedIndex,
    query: str,
    by: str = "repo",
    k_per_group: int = 1,
    groups: int = 10,
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    operator: str = "or",
    must_not: str | None = None,
    minimum_should_match: int = 0,
    dl_range: tuple[int | None, int | None] | None = None,
) -> DataFrame:
    """ES field collapsing + top_hits aggregation in one operator:
    the best ``k_per_group`` hits per distinct value of keyword field
    ``by``, for the top ``groups`` groups.  ``k_per_group=1`` is ES
    ``collapse: {field}`` (one best hit per project — the GitLab
    "group results by project" view); ``k_per_group>1`` is the
    ``terms`` aggregation with a ``top_hits`` sub-aggregation
    (``inner_hits`` size).  Groups order by their best hit's score
    (desc, value asc — how ES orders collapsed hits), hits within a
    group by (score desc, id asc); full bool
    (operator/must_not/minimum_should_match) + keyword-filter +
    dl_range surface of :func:`search`.

    Physical plan: ONE job over the term-pruned postings scan
    cogrouped with the filters sidecar (the ``by`` field's packed
    per-value doc-sets ride the SAME sidecar rows the facet kernel
    reads — no doc_stats join, no per-doc shuffle).  Per doc_part the
    kernel scores the bool-filtered matches once, then intersects the
    score vector with each value's bitmap for a per-(part, value)
    top-k — ≤ n_values_present·k_per_group tiny rows leave each
    partition.  The driver merges per value (a doc lives in exactly
    one part, so per-part per-value top-k's merge exactly), orders
    groups, and point-reads metadata for only the winners — the same
    O(hit parts) fetch as :func:`search`."""
    if by not in _MATCH_ALL_FACET_FIELDS:
        raise ValueError(
            f"by must be one of {_MATCH_ALL_FACET_FIELDS}, got {by!r}"
        )
    if k_per_group < 1 or groups < 1:
        raise ValueError("k_per_group >= 1 and groups >= 1 required")
    if operator not in ("or", "and"):
        raise ValueError(f"operator must be 'or' or 'and', got {operator!r}")
    msm = int(minimum_should_match or 0)
    if msm < 0:
        raise ValueError("minimum_should_match must be >= 0")
    if msm > 1 and operator == "and":
        raise ValueError("minimum_should_match applies to operator='or'")
    if index.filters is None:
        raise ValueError(
            "grouped_search needs the index's filters sidecar "
            "(rebuild or re-save the index with this version)"
        )
    spark = index.postings.sparkSession
    empty = _local_result(spark, [], _GROUPED_HIT_FIELDS)

    analyze_query = QUERY_ANALYZERS.get(index.analyzer, code_search_analyze)
    weights = Counter(analyze_query(query))
    idf = index.idf_map(list(weights))
    widf = {t: idf[t] * w for t, w in weights.items() if t in idf}
    if not widf:
        return empty
    neg = frozenset(analyze_query(must_not)) if must_not else frozenset()
    n_required = 0
    if operator == "and":
        if (neg & set(weights)) or len(widf) < len(weights):
            return empty
        n_required = len(widf)
    elif neg:
        widf = {t: w for t, w in widf.items() if t not in neg}
        if not widf:
            return empty
    if msm > 1 and msm > len(widf):
        return empty

    scan_terms = list(widf) + sorted(neg)
    cand = index.postings.filter(F.col("term").isin(scan_terms)).select(
        "doc_part", "term", "docs_bin", "tfs_bin", "dls_bin"
    )
    predicates, repo_t = _kw_predicates(lang, repo)
    parts = _route_parts(index, repo_t)
    if parts is not None:
        if not parts:
            return empty
        cand = cand.filter(F.col("doc_part").isin(parts))

    fcond = F.col("field") == by
    if predicates:
        fcond = fcond | _filters_cond(predicates)
    fsel = index.filters.filter(fcond).select(
        "doc_part", "field", "value", "bits"
    )
    if parts is not None:
        fsel = fsel.filter(F.col("doc_part").isin(parts))

    kernel = _make_grouped_kernel(
        widf, index.avgdl, k_per_group, index.docs_per_part, by,
        predicates, neg_terms=neg, n_required=n_required,
        min_match=msm if msm > 1 else 0, dl_range=_norm_dl_range(dl_range),
    )
    scored = (
        cand.groupBy("doc_part")
        .cogroup(fsel.groupBy("doc_part"))
        .applyInPandas(kernel, schema=GROUPED_SCHEMA)
    )

    # driver merge: per-part per-value top-k's combine exactly (a doc
    # lives in one part); ≤ n_parts·n_values·k bounded rows
    by_value: dict[str, list[tuple[float, int]]] = {}
    for r in scored.collect():
        by_value.setdefault(r["value"], []).append(
            (float(r["score"]), int(r["doc_idx"]))
        )
    if not by_value:
        return empty
    winners: list[tuple[str, list[tuple[float, int]]]] = []
    for v, cands in by_value.items():
        cands.sort(key=lambda t: (-t[0], t[1]))
        winners.append((v, cands[:k_per_group]))
    winners.sort(key=lambda g: (-g[1][0][0], g[0]))
    winners = winners[:groups]

    idxs = [d for _, hits in winners for _, d in hits]
    meta = _fetch_doc_meta(index, idxs, ["id", "repo", "path", "lang"])
    if meta is None:
        ds = index.doc_stats
        if index.docs_per_part > 0:
            hit_parts = sorted({i // index.docs_per_part for i in idxs})
            ds = ds.filter(F.col("doc_part").isin(hit_parts))
        meta = {
            int(r["doc_idx"]): r.asDict()
            for r in ds.filter(F.col("doc_idx").isin(idxs))
            .select("doc_idx", "id", "repo", "path", "lang").collect()
        }
    rows = [
        (v, rank, m["id"], s, m["repo"], m["path"], m["lang"])
        for v, hits in winners
        for rank, (s, d) in enumerate(hits, 1)
        if (m := meta.get(d)) is not None
    ]
    return _local_result(spark, rows, _GROUPED_HIT_FIELDS)


def _make_grouped_kernel(
    widf: dict[str, float],
    avgdl: float,
    k_per_group: int,
    docs_per_part: int,
    by_field: str,
    predicates: list[tuple[str, tuple[str, ...]]],
    neg_terms: frozenset[str] = frozenset(),
    n_required: int = 0,
    min_match: int = 0,
    dl_range: tuple[int, int] | None = None,
):
    """Per-doc_part grouped-top-k kernel (cogroup: postings, filters —
    where the filter side carries BOTH the predicate rows and the
    ``by`` field's per-value doc-set rows).  Scores the bool-filtered
    matches ONCE (exhaustive accumulate + clause counting for the
    and/msm modes), then per ``by`` value intersects with its bitmap
    and emits that value's local top ``k_per_group``."""
    from ..functions.codecs import unpack_doc_set

    pred_pairs = {(f, v) for f, vals in predicates for v in vals}

    def kernel(post_pdf: pd.DataFrame, filter_pdf=None) -> pd.DataFrame:
        empty = pd.DataFrame({"value": pd.Series([], dtype=object),
                              "doc_idx": pd.Series([], dtype=np.int64),
                              "score": pd.Series([], dtype=np.float64)})
        if len(post_pdf) == 0 or filter_pdf is None or len(filter_pdf) == 0:
            return empty
        base = int(filter_pdf["doc_part"].iloc[0]) * docs_per_part
        by_rows = filter_pdf[filter_pdf["field"] == by_field]
        if not len(by_rows):
            return empty
        bits = None
        if predicates:
            keep = [
                (f, v) in pred_pairs
                for f, v in zip(filter_pdf["field"], filter_pdf["value"])
            ]
            bits = _fold_filter_bits(filter_pdf[keep], len(predicates),
                                     docs_per_part)
            if bits is None:
                return empty

        excl = None
        if neg_terms:
            neg_docs = [
                unpack_postings(
                    bytes(row.docs_bin), bytes(row.tfs_bin),
                    bytes(row.dls_bin)
                )[0].astype(np.int64)
                for row in post_pdf.itertuples(index=False)
                if row.term in neg_terms
            ]
            if neg_docs:
                excl = np.unique(np.concatenate(neg_docs))

        all_docs: list[np.ndarray] = []
        all_contrib: list[np.ndarray] = []
        n_live = 0
        for row in post_pdf.itertuples(index=False):
            if row.term in neg_terms:
                continue
            w = widf.get(row.term)
            if w is None:
                continue
            n_live += 1
            docs, tfs, dls = unpack_postings(
                bytes(row.docs_bin), bytes(row.tfs_bin), bytes(row.dls_bin)
            )
            docs = docs.astype(np.int64)
            if dl_range is not None:
                m = (dls >= dl_range[0]) & (dls <= dl_range[1])
                if not m.any():
                    continue
                docs, tfs, dls = docs[m], tfs[m], dls[m]
            if bits is not None:
                m = bits[docs - base]
                if not m.any():
                    continue
                docs, tfs, dls = docs[m], tfs[m], dls[m]
            if excl is not None:
                m = ~_sorted_member(docs, excl)
                if not m.any():
                    continue
                docs, tfs, dls = docs[m], tfs[m], dls[m]
            all_docs.append(docs)
            all_contrib.append(w * _tfn(tfs, dls, avgdl))
        if not all_docs:
            return empty
        if n_required and n_live < n_required:
            return empty
        uniq, inv = np.unique(np.concatenate(all_docs), return_inverse=True)
        acc = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(acc, inv, np.concatenate(all_contrib))
        need = n_required or min_match
        if need > 1:
            cnt = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(cnt, inv, 1)
            ok = cnt >= need
            if not ok.any():
                return empty
            uniq, acc = uniq[ok], acc[ok]

        out_v: list[str] = []
        out_d: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        for row in by_rows.itertuples(index=False):
            vb = unpack_doc_set(bytes(row.bits), docs_per_part)
            m = vb[uniq - base]
            if not m.any():
                continue
            d, s = _topk_arrays(uniq[m], acc[m], k_per_group)
            out_v.extend([row.value] * len(d))
            out_d.append(d)
            out_s.append(s)
        if not out_v:
            return empty
        return pd.DataFrame({
            "value": out_v,
            "doc_idx": np.concatenate(out_d),
            "score": np.concatenate(out_s),
        })

    return kernel


def multi_terms(
    index: InvertedIndex,
    query: str | None,
    fields: tuple[str, str] = ("lang", "repo"),
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    operator: str = "or",
    must_not: str | None = None,
    minimum_should_match: int = 0,
    dl_range: tuple[int | None, int | None] | None = None,
) -> DataFrame:
    """ES ``multi_terms`` aggregation: match counts per COMPOUND bucket
    of two keyword fields — "(language, project) pairs this search
    hits" — under the full bool + keyword-filter + dl_range surface.
    Returns (v1, v2, n) rows, count desc then keys asc (the ES order).

    Physical plan: ``query=None`` (match_all, no must_not) is pure
    Catalyst — a column-pruned doc_stats scan with pushed predicates
    feeding a native two-key groupBy.  With a query, the facet plan
    generalizes: per doc_part the kernel builds the bool-filtered
    matched mask once, then counts ``popcount(matched & bits₁ &
    bits₂)`` for each pair of sidecar values PRESENT in the part —
    ≤ n_v1·n_v2 tiny rows leave each partition (zero pairs skipped),
    nothing per-doc shuffles."""
    if len(fields) != 2 or fields[0] == fields[1]:
        raise ValueError("fields must be two distinct keyword fields")
    for f in fields:
        if f not in _MATCH_ALL_FACET_FIELDS:
            raise ValueError(
                f"multi_terms supports fields {_MATCH_ALL_FACET_FIELDS}, "
                f"got {f!r}"
            )
    spark = index.postings.sparkSession
    out_fields = [("v1", "string"), ("v2", "string"), ("n", "long")]
    empty = _local_result(spark, [], out_fields)
    f1, f2 = fields

    if query is None:
        if must_not:
            raise ValueError(
                "match_all multi_terms does not take must_not — give a "
                "query for the bool surface"
            )
        ds = index.doc_stats.select(f1, f2, "dl")
        predicates, repo_t = _kw_predicates(lang, repo)
        for f, vals in predicates:
            ds = ds.filter(F.col(f).isin(list(vals)))
        dlr = _norm_dl_range(dl_range)
        if dlr is not None:
            ds = ds.filter(F.col("dl").between(*dlr))
        return (
            ds.groupBy(F.col(f1).alias("v1"), F.col(f2).alias("v2"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), "v1", "v2")
        )

    msm = int(minimum_should_match or 0)
    if msm < 0:
        raise ValueError("minimum_should_match must be >= 0")
    if msm > 1 and operator == "and":
        raise ValueError("minimum_should_match applies to operator='or'")
    if operator not in ("or", "and"):
        raise ValueError(f"operator must be 'or' or 'and', got {operator!r}")
    if index.filters is None:
        raise ValueError("multi_terms needs the index's filters sidecar")
    dlr = _norm_dl_range(dl_range)
    analyze_query = QUERY_ANALYZERS.get(index.analyzer, code_search_analyze)
    terms = sorted(set(analyze_query(query)))
    idf = index.idf_map(terms)
    live = [t for t in terms if t in idf]
    if not live:
        return empty
    neg = frozenset(analyze_query(must_not)) if must_not else frozenset()
    n_required = 0
    if operator == "and":
        if (neg & set(terms)) or len(live) < len(terms):
            return empty
        n_required = len(live)
    elif neg:
        live = [t for t in live if t not in neg]
        if not live:
            return empty
    if msm > 1 and msm > len(live):
        return empty

    predicates, repo_t = _kw_predicates(lang, repo)
    scan_cols = ["doc_part", "term", "docs_bin"]
    if dlr is not None:
        scan_cols.append("dls_bin")
    cand = index.postings.filter(
        F.col("term").isin(live + sorted(neg))
    ).select(*scan_cols)
    parts = _route_parts(index, repo_t)
    if parts is not None:
        if not parts:
            return empty
        cand = cand.filter(F.col("doc_part").isin(parts))

    kernel = _make_multi_terms_kernel(
        (f1, f2), predicates, index.docs_per_part,
        neg_terms=neg, n_required=n_required,
        min_match=msm if msm > 1 else 0, dl_range=dlr,
    )
    cond = F.col("field").isin([f1, f2])
    pc = _filters_cond(predicates)
    if pc is not None:
        cond = cond | pc
    fsel = index.filters.filter(cond).select(
        "doc_part", "field", "value", "bits"
    )
    if parts is not None:
        fsel = fsel.filter(F.col("doc_part").isin(parts))
    partial = (
        cand.groupBy("doc_part")
        .cogroup(fsel.groupBy("doc_part"))
        .applyInPandas(kernel, schema="v1 string, v2 string, n long")
    )
    return (
        partial.groupBy("v1", "v2").agg(F.sum("n").alias("n"))
        .orderBy(F.col("n").desc(), "v1", "v2")
    )


def _make_multi_terms_kernel(
    fields: tuple[str, str],
    predicates: list[tuple[str, tuple[str, ...]]],
    docs_per_part: int,
    neg_terms: frozenset[str] = frozenset(),
    n_required: int = 0,
    min_match: int = 0,
    dl_range: tuple[int, int] | None = None,
):
    """Per-doc_part compound-bucket kernel: the facet kernel's matched
    mask (same bool semantics), then ``popcount(matched & bits₁ &
    bits₂)`` per pair of the two fields' sidecar values present."""
    from ..functions.codecs import delta_decode, unpack_doc_set, varint_decode

    pred_vals = {f: frozenset(vals) for f, vals in predicates}
    f1, f2 = fields

    def kernel(postings_pdf: pd.DataFrame, filter_pdf=None) -> pd.DataFrame:
        empty = pd.DataFrame({"v1": [], "v2": [], "n": []})
        if len(postings_pdf) == 0 or filter_pdf is None \
                or len(filter_pdf) == 0:
            return empty
        part = int(postings_pdf["doc_part"].iloc[0])
        base = part * docs_per_part
        matched = None
        counts = (np.zeros(docs_per_part, dtype=np.int32)
                  if min_match > 1 else None)
        excl = np.zeros(docs_per_part, dtype=bool) if neg_terms else None
        n_pos_seen = 0
        for row in postings_pdf.itertuples(index=False):
            docs = delta_decode(varint_decode(bytes(row.docs_bin)))
            if row.term in neg_terms:
                m = np.zeros(docs_per_part, dtype=bool)
                m[docs.astype(np.int64) - base] = True
                excl |= m
                continue
            if dl_range is not None:
                dls = varint_decode(bytes(row.dls_bin))
                docs = docs[(dls >= dl_range[0]) & (dls <= dl_range[1])]
            m = np.zeros(docs_per_part, dtype=bool)
            m[docs.astype(np.int64) - base] = True
            n_pos_seen += 1
            if counts is not None:
                counts += m
            elif matched is None:
                matched = m
            elif n_required:
                matched &= m
            else:
                matched |= m
        if counts is not None:
            if n_pos_seen < min_match:
                return empty
            matched = counts >= min_match
        if matched is None or (n_required and n_pos_seen < n_required):
            return empty
        if excl is not None:
            matched &= ~excl

        b1: list[tuple[str, np.ndarray]] = []
        b2: list[tuple[str, np.ndarray]] = []
        pred_masks: dict[str, np.ndarray] = {}
        for row in filter_pdf.itertuples(index=False):
            bits = unpack_doc_set(bytes(row.bits), docs_per_part)
            fv = pred_vals.get(row.field)
            if fv is not None and row.value in fv:
                m = pred_masks.get(row.field)
                pred_masks[row.field] = bits if m is None else (m | bits)
            if row.field == f1:
                b1.append((row.value, bits))
            if row.field == f2:
                b2.append((row.value, bits))
        if len(pred_masks) < len(pred_vals):
            return empty
        for m in pred_masks.values():
            matched &= m
        if not matched.any() or not b1 or not b2:
            return empty

        out1: list[str] = []
        out2: list[str] = []
        outn: list[int] = []
        for v1, m1 in b1:
            inter = matched & m1
            if not inter.any():
                continue
            for v2, m2 in b2:
                n = int((inter & m2).sum())
                if n:
                    out1.append(v1)
                    out2.append(v2)
                    outn.append(n)
        if not out1:
            return empty
        return pd.DataFrame({"v1": out1, "v2": out2, "n": outn})

    return kernel


def rare_terms(
    index: InvertedIndex,
    query: str | None,
    field: str = "lang",
    max_doc_count: int = 1,
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    operator: str = "or",
    must_not: str | None = None,
    pre_terms: list[str] | None = None,
    minimum_should_match: int = 0,
    dl_range: tuple[int | None, int | None] | None = None,
) -> DataFrame:
    """ES ``rare_terms`` aggregation: the LONG-TAIL values of a keyword
    field among the matching docs — values with match count ≤
    ``max_doc_count``, ordered count asc then value asc (ES orders
    rare-first; the agg exists because a terms agg ordered count-asc
    is unboundedly inaccurate on sharded data).  Exact here: the facet
    partials already materialize every (value, count) — the same
    bounded per-part rows — so the tail filter is a post-aggregation
    predicate, with none of the ES CuckooFilter approximation.
    ``query=None`` = match_all (the rare languages/repos of the whole
    corpus).  Full bool/filter/dl_range surface of
    :func:`facet_counts`."""
    if max_doc_count < 1:
        raise ValueError("max_doc_count must be >= 1")
    fc = facet_counts(
        index, query, fields=(field,), lang=lang, repo=repo,
        operator=operator, must_not=must_not, pre_terms=pre_terms,
        minimum_should_match=minimum_should_match, dl_range=dl_range,
    )
    return (
        fc.filter(F.col("n") <= max_doc_count)
        .select("value", "n")
        .orderBy(F.col("n").asc(), F.col("value").asc())
    )


def field_cardinality(
    index: InvertedIndex,
    query: str | None,
    fields: tuple[str, ...] = ("repo",),
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    operator: str = "or",
    must_not: str | None = None,
    pre_terms: list[str] | None = None,
    minimum_should_match: int = 0,
    dl_range: tuple[int | None, int | None] | None = None,
    approximate: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """ES ``cardinality`` aggregation analog: the number of DISTINCT
    values of a keyword field among ALL documents matching the query —
    "this search hits files in how many projects / languages" (the
    GitLab scope counts), under the full bool + keyword-filter +
    dl_range surface of :func:`facet_counts` (``query=None`` =
    match_all).  One row (field, cardinality) per requested field;
    zero matches returns cardinality 0, as ES does.

    Physical plan: rides the facet partials — per doc_part one tiny
    (field, value) row per value present among that part's matches
    (nothing per-doc leaves a partition), then a countDistinct over
    ≤ n_parts·n_values rows.  EXACT by default (the value domain is
    the keyword sidecar's, already materialized per part); pass
    ``approximate=True`` for Spark's native HyperLogLog++
    (``approx_count_distinct`` with relative error ``rsd``) — the
    ES-parity sketch path for extreme-cardinality fields, where the
    partial rows themselves would be the bottleneck."""
    fc = facet_counts(
        index, query, fields=fields, lang=lang, repo=repo,
        operator=operator, must_not=must_not, pre_terms=pre_terms,
        minimum_should_match=minimum_should_match, dl_range=dl_range,
    )
    agg = (F.approx_count_distinct("value", rsd) if approximate
           else F.count_distinct("value")).alias("cardinality")
    got = fc.groupBy("field").agg(agg)
    # guarantee one row per requested field (ES returns 0 on no match)
    spark = index.postings.sparkSession
    want = spark.createDataFrame([(f,) for f in fields], "field string")
    return (
        want.join(got, "field", "left")
        .select("field",
                F.coalesce("cardinality", F.lit(0)).alias("cardinality"))
        .orderBy("field")
    )


def _metric_partials(
    index: InvertedIndex,
    query: str,
    interval: int | None,
    lang: str | list[str] | None,
    repo: str | list[str] | None,
    operator: str,
    must_not: str | None,
    minimum_should_match: int,
    pre_terms: list[str] | None,
    dl_range: tuple[int | None, int | None] | None = None,
) -> DataFrame | None:
    """Shared plan of :func:`dl_stats` / :func:`dl_histogram`: per
    doc_part partial aggregates over the dl of EVERY matching document
    (the same matched set :func:`facet_counts` popcounts — bool
    must/must_not/minimum_should_match and keyword filters included).

    Physical plan mirrors the facet kernel: the postings scan is pruned
    to the query terms and column-pruned to (term, docs_bin, dls_bin) —
    dl rides the posting lists themselves (every term entry carries its
    doc's dl for BM25), so NO doc_stats join and nothing per-doc ever
    leaves a partition.  Only ≤ n_parts (stats) or ≤ n_parts·n_buckets
    (histogram) tiny partial rows shuffle.  ``None`` means nothing can
    match.

    ``query=None`` (with ``pre_terms=None``) aggregates over EVERY live
    doc passing the filters (ES match_all): without ``must_not`` the
    partials are a native Catalyst aggregation of the doc_stats ``dl``
    column (predicates pushed to parquet, no postings, no Python); with
    ``must_not`` the excluded terms' postings cogroup with the filtered
    doc_stats and a per-part kernel subtracts them.  The bool knobs are
    ignored for match_all (no should clauses — ES semantics)."""
    if operator not in ("or", "and"):
        raise ValueError(f"operator must be 'or' or 'and', got {operator!r}")
    msm = int(minimum_should_match or 0)
    if msm < 0:
        raise ValueError("minimum_should_match must be >= 0")
    if msm > 1 and operator == "and":
        raise ValueError("minimum_should_match applies to operator='or'")
    if pre_terms is None and query is None:
        predicates, repo_t = _kw_predicates(lang, repo)
        stats = _match_all_docs(index, predicates, repo_t,
                                _norm_dl_range(dl_range))
        if stats is None:
            return None
        neg_live = _match_all_neg(index, must_not)
        if neg_live:
            return _match_all_cogroup(
                index, neg_live, stats,
                _make_match_all_metric_kernel(index.docs_per_part, interval),
                METRIC_PARTIAL_SCHEMA,
            )
        z = F.lit(0).cast("long")
        if interval:
            return stats.groupBy(
                (F.floor(F.col("dl") / interval) * interval)
                .cast("long").alias("bucket")
            ).agg(F.count(F.lit(1)).alias("n"),
                  z.alias("sum_dl"), z.alias("min_dl"), z.alias("max_dl"))
        return stats.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("dl"), F.lit(0)).alias("sum_dl"),
            F.min("dl").alias("min_dl"), F.max("dl").alias("max_dl"),
        ).select(F.lit(0).cast("long").alias("bucket"),
                 "n", "sum_dl", "min_dl", "max_dl")
    analyze_query = QUERY_ANALYZERS.get(index.analyzer, code_search_analyze)
    terms = (sorted(set(analyze_query(query))) if pre_terms is None
             else sorted(set(pre_terms)))
    idf = index.idf_map(terms)
    live = [t for t in terms if t in idf]
    if not live:
        return None
    neg = frozenset(analyze_query(must_not)) if must_not else frozenset()
    n_required = 0
    if operator == "and":
        if (neg & set(terms)) or len(live) < len(terms):
            return None
        n_required = len(live)
    elif neg:
        live = [t for t in live if t not in neg]
        if not live:
            return None
    if msm > 1 and msm > len(live):
        return None

    predicates, repo_t = _kw_predicates(lang, repo)
    if predicates and index.filters is None:
        raise ValueError(
            "filtered dl_stats/dl_histogram needs the index's filters "
            "sidecar (rebuild or re-save the index with this version)"
        )
    cand = index.postings.filter(
        F.col("term").isin(live + sorted(neg))
    ).select("doc_part", "term", "docs_bin", "dls_bin")
    parts = _route_parts(index, repo_t)
    if parts is not None:
        if not parts:
            return None
        cand = cand.filter(F.col("doc_part").isin(parts))

    kernel = _make_metric_kernel(
        predicates, index.docs_per_part, interval,
        neg_terms=neg, n_required=n_required,
        min_match=msm if msm > 1 else 0, dl_range=_norm_dl_range(dl_range),
    )
    if predicates:
        fsel = index.filters.filter(_filters_cond(predicates)).select(
            "doc_part", "field", "value", "bits"
        )
        if parts is not None:
            fsel = fsel.filter(F.col("doc_part").isin(parts))
        return (
            cand.groupBy("doc_part")
            .cogroup(fsel.groupBy("doc_part"))
            .applyInPandas(kernel, schema=METRIC_PARTIAL_SCHEMA)
        )
    return cand.groupBy("doc_part").applyInPandas(
        _wrap_single(kernel), schema=METRIC_PARTIAL_SCHEMA
    )


METRIC_PARTIAL_SCHEMA = (
    "bucket long, n long, sum_dl long, min_dl long, max_dl long"
)
_STATS_FIELDS = [("count", "long"), ("sum_dl", "long"), ("min_dl", "long"),
                 ("max_dl", "long"), ("avg_dl", "double")]


def dl_stats(
    index: InvertedIndex,
    query: str,
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    operator: str = "or",
    must_not: str | None = None,
    minimum_should_match: int = 0,
    pre_terms: list[str] | None = None,
    dl_range: tuple[int | None, int | None] | None = None,
) -> DataFrame:
    """ES ``stats`` aggregation analog over the index's numeric doc
    property ``dl`` (analyzed token count — the numeric field the index
    maintains for every doc): one row (count, sum_dl, min_dl, max_dl,
    avg_dl) over ALL documents matching the query, under the same bool
    (operator/must_not/minimum_should_match) and keyword-filter
    semantics as :func:`search` — "how big are the matching files"
    beside the hit list, the agg shape ES returns with hits in one
    request.  Zero matches returns count=0 with NULL min/max/avg,
    as ES does.  See :func:`_metric_partials` for the plan."""
    spark = index.postings.sparkSession
    partial = _metric_partials(index, query, None, lang, repo, operator,
                               must_not, minimum_should_match, pre_terms,
                               dl_range=dl_range)
    if partial is None:
        return _local_result(spark, [(0, 0, None, None, None)], _STATS_FIELDS)
    return partial.agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("count"),
        F.coalesce(F.sum("sum_dl"), F.lit(0)).alias("sum_dl"),
        F.min("min_dl").alias("min_dl"),
        F.max("max_dl").alias("max_dl"),
        (F.sum("sum_dl") / F.sum("n")).alias("avg_dl"),
    )


_PCT_FIELDS = [("percent", "double"), ("value", "long")]


def dl_percentiles(
    index: InvertedIndex,
    query: str | None,
    percents: tuple[float, ...] = (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0),
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    operator: str = "or",
    must_not: str | None = None,
    minimum_should_match: int = 0,
    pre_terms: list[str] | None = None,
    dl_range: tuple[int | None, int | None] | None = None,
) -> DataFrame:
    """ES ``percentiles`` aggregation analog over ``dl`` — the default
    percent set is ES's own ([1, 5, 25, 50, 75, 95, 99]).  One row
    (percent, value) per requested percentile over ALL docs matching
    the query, under the full bool + keyword-filter + dl_range surface
    (``query=None`` = match_all, like the other dl aggregations).

    Where ES approximates with a t-digest sketch, this computes the
    EXACT discrete (nearest-rank: value at ceil(p·n/100), DuckDB's
    ``quantile_disc``) percentile — affordable because dl is a bounded
    small-int domain: the same per-(part, dl) partial rows as
    :func:`dl_histogram` at interval=1 aggregate to one global (dl, n)
    histogram of ≤ distinct-dl tiny rows (≤ max doc length at ANY
    corpus size — the histogram IS the sketch), and the percentiles
    read off its cumulative counts driver-side.  Zero matches returns
    NULL values, as ES does."""
    ps = [float(p) for p in percents]
    if not ps or any(not 0.0 < p <= 100.0 for p in ps):
        raise ValueError("percents must be in (0, 100]")
    if len(set(ps)) != len(ps):
        raise ValueError("duplicate percents")
    spark = index.postings.sparkSession
    partial = _metric_partials(index, query, 1, lang, repo, operator,
                               must_not, minimum_should_match, pre_terms,
                               dl_range=dl_range)
    nulls = _local_result(spark, [(p, None) for p in ps], _PCT_FIELDS)
    if partial is None:
        return nulls
    hist = (
        partial.groupBy("bucket").agg(F.sum("n").alias("n"))
        .orderBy("bucket").collect()
    )
    if not hist:
        return nulls
    cum = np.cumsum([int(r["n"]) for r in hist])
    n = int(cum[-1])
    out = []
    for p in ps:
        rank = max(1, math.ceil(p / 100.0 * n))
        out.append((p, int(hist[int(np.searchsorted(cum, rank))]["bucket"])))
    return _local_result(spark, out, _PCT_FIELDS)


def dl_histogram(
    index: InvertedIndex,
    query: str,
    interval: int,
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    operator: str = "or",
    must_not: str | None = None,
    minimum_should_match: int = 0,
    pre_terms: list[str] | None = None,
    dl_range: tuple[int | None, int | None] | None = None,
) -> DataFrame:
    """ES ``histogram`` aggregation analog over ``dl``: rows
    (bucket, n) where bucket = floor(dl / interval) · interval, counting
    ALL matching documents per bucket (empty buckets omitted — ES
    ``min_doc_count: 1``), under the same bool and keyword-filter
    semantics as :func:`search`.  Partials are per-(part, bucket) rows,
    so the final shuffle carries ≤ n_parts·n_buckets tiny rows."""
    if int(interval) <= 0:
        raise ValueError("interval must be a positive integer")
    spark = index.postings.sparkSession
    partial = _metric_partials(index, query, int(interval), lang, repo,
                               operator, must_not, minimum_should_match,
                               pre_terms, dl_range=dl_range)
    if partial is None:
        return _local_result(spark, [], [("bucket", "long"), ("n", "long")])
    return (
        partial.groupBy("bucket")
        .agg(F.sum("n").alias("n"))
        .orderBy("bucket")
    )


def histogram_bucket_stats(
    index: InvertedIndex,
    query: str | None,
    interval: int,
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    operator: str = "or",
    must_not: str | None = None,
    minimum_should_match: int = 0,
    pre_terms: list[str] | None = None,
    dl_range: tuple[int | None, int | None] | None = None,
) -> DataFrame:
    """ES pipeline aggregations — ``max_bucket`` / ``min_bucket`` /
    ``avg_bucket`` / ``sum_bucket`` over the dl histogram's sibling
    buckets: one row (max_key, max_n, min_key, min_n, avg_n, sum_n).
    Ties resolve to the SMALLEST bucket key (ES returns a keys list;
    documented simplification).

    Pure Catalyst and fully LAZY: :func:`dl_histogram` is a DataFrame,
    so the pipeline agg composes into the SAME plan — the per-part
    metric partials, the ≤ n_parts·n_buckets-row shuffle, and one
    global struct-max/min/avg — no second pass over anything, exactly
    how ES computes pipeline aggs from sibling buckets at reduce
    time."""
    h = dl_histogram(index, query, interval, lang=lang, repo=repo,
                     operator=operator, must_not=must_not,
                     minimum_should_match=minimum_should_match,
                     pre_terms=pre_terms, dl_range=dl_range)
    # struct ordering picks the extreme n; the negated key breaks ties
    # toward the smallest bucket
    mx = F.max(F.struct(F.col("n"), (-F.col("bucket")).alias("nk")))
    mn = F.min(F.struct(F.col("n"), F.col("bucket")))
    return h.agg(
        (-mx.getField("nk")).cast("long").alias("max_key"),
        mx.getField("n").alias("max_n"),
        mn.getField("bucket").alias("min_key"),
        mn.getField("n").alias("min_n"),
        F.avg("n").alias("avg_n"),
        F.sum("n").alias("sum_n"),
    )


SORT_FIELDS = ("id", "repo", "path", "lang", "dl")
_SORT_HIT_FIELDS = [("id", "string"), ("repo", "string"), ("path", "string"),
                    ("lang", "string"), ("dl", "long")]


def sort_search(
    index: InvertedIndex,
    query: str | None,
    sort: str = "path",
    ascending: bool = True,
    k: int = 10,
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    operator: str = "or",
    must_not: str | None = None,
    minimum_should_match: int = 0,
    offset: int = 0,
    search_after: tuple | None = None,
    dl_range: tuple[int | None, int | None] | None = None,
) -> DataFrame:
    """ES ``sort`` clause analog: top-k matching docs ordered by a doc
    FIELD instead of relevance (``sort: [{"path": "asc"}]``); scores
    are not computed, exactly like ES when sorting by field.  ``sort``
    is one of the doc properties the index maintains — id, repo, path,
    lang (keyword order) or dl (numeric).  Ties break id-asc (the ES
    convention of a uniqueness-guaranteeing tiebreak field).

    Physical plan = the ES sorted-search plan: each doc_part (shard)
    computes its OWN matching docs and returns only its top
    offset+k by the sort key, the driver (coordinator) merges.  The
    kernel cogroups the term-pruned postings scan with the doc_part's
    doc_stats rows (column-pruned to the hit columns), so lang/repo
    predicates evaluate directly on the metadata columns — no filters
    sidecar needed — and repo routing prunes parts as usual.  Bool
    knobs (operator / must_not / minimum_should_match) reuse the facet
    kernel's mask logic.  ``search_after=(sort_value, id)`` pages the
    sorted order with the usual O(k)-per-page cursor (ES search_after
    over sort values); mutually exclusive with ``offset``.

    ``query=None`` is the ES **match_all** + sort shape — "browse every
    file in this repo ordered by path" (the GitLab file listing).
    Without ``must_not`` the plan is pure Catalyst: the filtered
    doc_stats scan feeds a native orderBy+limit, which Spark executes
    as TakeOrderedAndProject — per-partition top-k then a driver merge,
    exactly the ES sorted-search shard plan, with zero Python and the
    cursor predicate pushed into the scan.  With ``must_not`` the
    excluded terms' postings cogroup with doc_stats and the kernel
    subtracts them before its per-part top-k.  The ``operator``/
    ``minimum_should_match`` knobs are ignored for match_all (no
    should clauses — ES semantics)."""
    if sort not in SORT_FIELDS:
        raise ValueError(f"sort must be one of {SORT_FIELDS}, got {sort!r}")
    if operator not in ("or", "and"):
        raise ValueError(f"operator must be 'or' or 'and', got {operator!r}")
    msm = int(minimum_should_match or 0)
    if msm < 0:
        raise ValueError("minimum_should_match must be >= 0")
    if msm > 1 and operator == "and":
        raise ValueError("minimum_should_match applies to operator='or'")
    if search_after is not None and offset:
        raise ValueError("offset and search_after are mutually exclusive")
    if query is None:
        return _sort_search_match_all(index, sort, ascending, k, lang, repo,
                                      must_not, offset, search_after, dl_range)
    spark = index.postings.sparkSession
    analyze_query = QUERY_ANALYZERS.get(index.analyzer, code_search_analyze)
    terms = sorted(set(analyze_query(query)))
    idf = index.idf_map(terms)
    live = [t for t in terms if t in idf]
    empty = _local_result(spark, [], _SORT_HIT_FIELDS)
    if not live:
        return empty
    neg = frozenset(analyze_query(must_not)) if must_not else frozenset()
    n_required = 0
    if operator == "and":
        if (neg & set(terms)) or len(live) < len(terms):
            return empty
        n_required = len(live)
    elif neg:
        live = [t for t in live if t not in neg]
        if not live:
            return empty
    if msm > 1 and msm > len(live):
        return empty

    predicates, repo_t = _kw_predicates(lang, repo)
    cand = index.postings.filter(
        F.col("term").isin(live + sorted(neg))
    ).select("doc_part", "term", "docs_bin")
    stats_cols = ["doc_part", "doc_idx", "id", "repo", "path", "lang", "dl"]
    stats = index.doc_stats.select(*stats_cols)
    parts = _route_parts(index, repo_t)
    if parts is not None:
        if not parts:
            return empty
        cand = cand.filter(F.col("doc_part").isin(parts))
        stats = stats.filter(F.col("doc_part").isin(parts))

    cursor = None
    if search_after is not None:
        cv, cid = search_after
        cursor = (int(cv) if sort == "dl" else str(cv), str(cid))
    kernel = _make_sort_kernel(
        sort, ascending, k + offset, index.docs_per_part, predicates,
        neg_terms=neg, n_required=n_required,
        min_match=msm if msm > 1 else 0, after=cursor,
        dl_range=_norm_dl_range(dl_range),
    )
    partial = (
        cand.groupBy("doc_part")
        .cogroup(stats.groupBy("doc_part"))
        .applyInPandas(
            kernel,
            schema="id string, repo string, path string, lang string, dl long",
        )
    )
    rows = partial.collect()
    fkey = ((lambda r: int(r["dl"])) if sort == "dl"
            else (lambda r: r[sort] or ""))
    if ascending:
        rows.sort(key=lambda r: (fkey(r), r["id"]))
    else:
        # field desc, id-asc tiebreak: two-pass stable sort
        rows.sort(key=lambda r: r["id"])
        rows.sort(key=fkey, reverse=True)
    out = [(r["id"], r["repo"], r["path"], r["lang"], int(r["dl"]))
           for r in rows[offset:offset + k]]
    return _local_result(spark, out, _SORT_HIT_FIELDS)


def match_all_sorted_plan(
    index,
    sort: str = "path",
    ascending: bool = True,
    n: int = 10,
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    dl_range: tuple[int | None, int | None] | None = None,
    search_after: tuple | None = None,
) -> DataFrame | None:
    """Lazy native plan of the no-must_not match_all browse (exposed so
    plan invariants can be asserted): the filtered doc_stats scan —
    predicates pushed to parquet — feeding orderBy+limit, which Spark
    executes as TakeOrderedAndProject (per-partition top-n, driver
    merge; zero Python).  ``None`` when routing proves nothing
    matches."""
    predicates, repo_t = _kw_predicates(lang, repo)
    stats = _match_all_docs(index, predicates, repo_t, _norm_dl_range(dl_range))
    if stats is None:
        return None
    if sort != "dl":
        # NULL keywords sort as "" — same rule as the kernel path
        stats = stats.withColumn(sort, F.coalesce(F.col(sort), F.lit("")))
    key = F.col(sort)
    if search_after is not None:
        cv, cid = search_after
        tie = (key == F.lit(cv)) & (F.col("id") > F.lit(cid))
        cond = ((key > F.lit(cv)) if ascending else (key < F.lit(cv))) | tie
        stats = stats.filter(cond)
    return (
        stats.orderBy(key.asc() if ascending else key.desc(),
                      F.col("id").asc())
        .limit(n)
        .select("id", "repo", "path", "lang", "dl")
    )


def _sort_search_match_all(
    index, sort, ascending, k, lang, repo, must_not, offset, search_after,
    dl_range,
) -> DataFrame:
    """match_all sorted browse (see :func:`sort_search`): native
    TakeOrderedAndProject over the filtered doc_stats, or the cogroup
    kernel when must_not terms must be subtracted."""
    spark = index.postings.sparkSession
    empty = _local_result(spark, [], _SORT_HIT_FIELDS)
    cursor = None
    if search_after is not None:
        cv, cid = search_after
        cursor = (int(cv) if sort == "dl" else str(cv), str(cid))
    neg_live = _match_all_neg(index, must_not)
    if neg_live:
        predicates, repo_t = _kw_predicates(lang, repo)
        stats = _match_all_docs(index, predicates, repo_t,
                                _norm_dl_range(dl_range))
        if stats is None:
            return empty
        kernel = _make_sort_kernel(
            sort, ascending, k + offset, index.docs_per_part, [],
            neg_terms=frozenset(neg_live), after=cursor, match_all=True,
        )
        rows = _match_all_cogroup(
            index, neg_live, stats, kernel,
            "id string, repo string, path string, lang string, dl long",
        ).collect()
    else:
        plan = match_all_sorted_plan(
            index, sort, ascending, offset + k, lang=lang, repo=repo,
            dl_range=dl_range, search_after=cursor,
        )
        if plan is None:
            return empty
        rows = plan.collect()
    # global merge of the per-part top-k (the native path is already
    # ordered; resorting ≤ offset+k rows is free)
    fkey = ((lambda r: int(r["dl"])) if sort == "dl"
            else (lambda r: r[sort] or ""))
    if ascending:
        rows.sort(key=lambda r: (fkey(r), r["id"]))
    else:
        rows.sort(key=lambda r: r["id"])
        rows.sort(key=fkey, reverse=True)
    out = [(r["id"], r["repo"], r["path"], r["lang"], int(r["dl"]))
           for r in rows[offset:offset + k]]
    return _local_result(spark, out, _SORT_HIT_FIELDS)


def _make_sort_kernel(
    sort: str,
    ascending: bool,
    k: int,
    docs_per_part: int,
    predicates: list[tuple[str, tuple[str, ...]]],
    neg_terms: frozenset[str] = frozenset(),
    n_required: int = 0,
    min_match: int = 0,
    after: tuple | None = None,
    dl_range: tuple[int, int] | None = None,
    match_all: bool = False,
):
    """Per-doc_part sorted-search kernel (cogroup signature: postings,
    doc_stats): matched mask via the facet-kernel bool logic, predicate
    filters directly on the metadata columns, per-part top-k by
    (sort key, id) — ≤ k rows leave each part.  ``match_all=True``
    starts from every doc in the part (the postings side then carries
    ONLY excluded terms, possibly none for this part)."""
    from ..functions.codecs import delta_decode, varint_decode

    pred_vals = {f: frozenset(vals) for f, vals in predicates}

    def kernel(postings_pdf: pd.DataFrame, stats_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id": [], "repo": [], "path": [], "lang": [], "dl": []}
        )
        if len(stats_pdf) == 0 or (not match_all and len(postings_pdf) == 0):
            return empty
        part = int(stats_pdf["doc_part"].iloc[0] if match_all
                   else postings_pdf["doc_part"].iloc[0])
        base = part * docs_per_part
        matched = None
        counts = (np.zeros(docs_per_part, dtype=np.int32)
                  if min_match > 1 else None)
        excl = np.zeros(docs_per_part, dtype=bool) if neg_terms else None
        n_pos_seen = 0
        for row in postings_pdf.itertuples(index=False):
            docs = delta_decode(varint_decode(bytes(row.docs_bin)))
            mask = np.zeros(docs_per_part, dtype=bool)
            mask[docs.astype(np.int64) - base] = True
            if row.term in neg_terms:
                excl |= mask
                continue
            n_pos_seen += 1
            if counts is not None:
                counts += mask
            elif matched is None:
                matched = mask
            elif n_required:
                matched &= mask
            else:
                matched |= mask
        if match_all:
            matched = np.ones(docs_per_part, dtype=bool)
        elif counts is not None:
            if n_pos_seen < min_match:
                return empty
            matched = counts >= min_match
        if matched is None or (n_required and n_pos_seen < n_required):
            return empty
        if excl is not None:
            matched &= ~excl

        sel = stats_pdf[matched[
            stats_pdf["doc_idx"].to_numpy(np.int64) - base
        ]]
        if sort != "dl":
            # a NULL keyword sorts as "" (first asc, last desc) — keeps
            # the kernel's pandas sort and the driver merge consistent
            sel = sel.assign(**{sort: sel[sort].fillna("")})
        for f, vals in pred_vals.items():
            sel = sel[sel[f].isin(vals)]
            if not len(sel):
                return empty
        if dl_range is not None:
            dlv = sel["dl"].to_numpy(np.int64)
            sel = sel[(dlv >= dl_range[0]) & (dlv <= dl_range[1])]
        if not len(sel):
            return empty
        if after is not None:
            av, aid = after
            col = sel[sort]
            ids = sel["id"]
            if ascending:
                keep = (col > av) | ((col == av) & (ids > aid))
            else:
                keep = (col < av) | ((col == av) & (ids > aid))
            sel = sel[keep]
            if not len(sel):
                return empty
        sel = sel.sort_values(
            [sort, "id"], ascending=[ascending, True], kind="stable"
        ).head(k)
        return pd.DataFrame({
            "id": sel["id"].to_numpy(dtype=object),
            "repo": sel["repo"].to_numpy(dtype=object),
            "path": sel["path"].to_numpy(dtype=object),
            "lang": sel["lang"].to_numpy(dtype=object),
            "dl": sel["dl"].to_numpy(np.int64),
        })

    return kernel


def term_vector(index: InvertedIndex, doc_id: str) -> list[tuple[str, int]]:
    """ES ``_termvectors`` analog: the (term, tf) vector of one document,
    re-derived from the inverted index exactly as Lucene does without
    stored term vectors — scan ONE doc_part's postings (a partition
    filter on the doc_part-partitioned scan, column-pruned to
    (term, docs_bin, tfs_bin)) and keep the rows whose doc list contains
    the doc.  Cost is bounded by that part's postings, never the corpus.
    Returns [] for a doc that indexed zero terms; raises for an unknown
    id."""
    drows = index.doc_stats.filter(F.col("id") == doc_id).select(
        "doc_idx", "doc_part"
    ).collect()
    if not drows:
        raise ValueError(f"doc id {doc_id!r} not found in the index")
    doc_idx, doc_part = int(drows[0]["doc_idx"]), int(drows[0]["doc_part"])
    scan = index.postings.filter(F.col("doc_part") == doc_part).select(
        "term", "docs_bin", "tfs_bin"
    )
    from ..functions.codecs import delta_decode, varint_decode

    def extract(batches):
        for pdf in batches:
            terms: list[str] = []
            tfs: list[int] = []
            for row in pdf.itertuples(index=False):
                docs = delta_decode(varint_decode(bytes(row.docs_bin)))
                pos = int(np.searchsorted(docs, doc_idx))
                if pos < len(docs) and int(docs[pos]) == doc_idx:
                    terms.append(row.term)
                    tfs.append(int(varint_decode(bytes(row.tfs_bin))[pos]))
            yield pd.DataFrame({"term": terms, "tf": tfs})

    rows = scan.mapInPandas(extract, "term string, tf long").collect()
    return sorted((r["term"], int(r["tf"])) for r in rows)


def _term_dfs(index: InvertedIndex, terms: list[str]) -> dict[str, int]:
    """df per term — the same bucket-pruned term_stats lookup as
    :meth:`InvertedIndex.idf_map`, reading the df column."""
    if not terms:
        return {}
    ts = index.term_stats
    if "term_bucket" in ts.columns:
        from ..functions.hashing import term_bucket_py
        from .index_build import TERM_BUCKETS

        bks = sorted({term_bucket_py(t, TERM_BUCKETS) for t in set(terms)})
        ts = ts.filter(F.col("term_bucket").isin(bks))
    rows = ts.filter(F.col("term").isin(list(set(terms)))).select(
        "term", "df"
    ).collect()
    return {r["term"]: int(r["df"]) for r in rows}


TERMVECTOR_FIELDS = [("term", "string"), ("tf", "long"),
                     ("df", "long"), ("ttf", "long")]


def term_vectors(index: InvertedIndex, doc_id: str) -> DataFrame:
    """ES ``_termvectors`` (``term_statistics: true``) analog: one row
    per analyzed term of ``doc_id`` with ``tf`` (term_freq in the doc),
    ``df`` (doc_freq) and ``ttf`` (total term frequency across the
    collection) — re-derived from the inverted index exactly as Lucene
    serves the API without stored term vectors.

    Cost is a point plan: the :func:`term_vector` single-doc_part
    postings scan, then ONE term_stats lookup pruned to the doc's own
    terms (term_bucket + ``In(term)`` both reach the parquet scan —
    the same pruning as :meth:`InvertedIndex.idf_map`).  Rows are
    term-ascending; a doc that indexed zero terms returns an empty
    frame; an unknown id raises (as ES returns ``found: false``)."""
    tv = term_vector(index, doc_id)
    spark = index.postings.sparkSession
    if not tv:
        return _local_result(spark, [], TERMVECTOR_FIELDS)
    terms = [t for t, _ in tv]
    ts = index.term_stats
    if "term_bucket" in ts.columns:
        from ..functions.hashing import term_bucket_py
        from .index_build import TERM_BUCKETS

        bks = sorted({term_bucket_py(t, TERM_BUCKETS) for t in set(terms)})
        ts = ts.filter(F.col("term_bucket").isin(bks))
    stat = {
        r["term"]: (int(r["df"]), int(r["cf"]))
        for r in ts.filter(F.col("term").isin(terms))
        .select("term", "df", "cf")
        .collect()
    }
    rows = [(t, tf, *stat.get(t, (0, 0))) for t, tf in tv]
    return _local_result(spark, rows, TERMVECTOR_FIELDS)


_DH_INTERVALS = ("minute", "hour", "day", "week", "month", "quarter",
                 "year")

# the reference's Person.time wire format (indexer/person.go:10,
# "20060102T150405-0700" = basic_date_time_no_millis in the mapping,
# elastic/index.go:189-192)
PERSON_TIME_FMT = "yyyyMMdd'T'HHmmssZ"


def date_histogram(
    docs: DataFrame,
    field: str = "author.time",
    interval: str = "month",
    rid: str | list[str] | None = None,
) -> DataFrame:
    """ES ``date_histogram`` (``calendar_interval``) analog over a
    document table in filter context — the commit-activity-graph shape
    GitLab renders: rows ``(bucket, n)`` where bucket is the
    ``date_trunc(interval)`` of the parsed time field, empty buckets
    omitted (``min_doc_count: 1``), with an optional ``rid`` terms
    filter (the routing key).  ``field`` may be a struct path
    (``author.time``); the value is a Person.time string in the
    reference's wire format (:data:`PERSON_TIME_FMT`).

    Pure Catalyst: a column-pruned scan → timestamp parse →
    ``date_trunc`` → map-side partial groupBy, so ≤ n_buckets tiny rows
    per partition cross the one shuffle regardless of corpus size —
    the same 100-TB shape as a native count aggregation.

    Timezone semantics (documented per the round-5 ADVICE): the
    offset-bearing Person.time parses to an instant and ``date_trunc``
    buckets in ``spark.sql.session.timeZone``.  The engine's session
    factory PINS that to UTC (session.py), which is exactly ES's
    date_histogram default — running under a session with a different
    timezone shifts day/month boundaries accordingly, like setting the
    ES ``time_zone`` parameter."""
    if interval not in _DH_INTERVALS:
        raise ValueError(
            f"interval must be one of {_DH_INTERVALS}, got {interval!r}"
        )
    out = docs
    r = _norm_kw(rid)
    if r:
        out = out.filter(F.col("rid").isin(list(r)))
    ts = F.to_timestamp(F.col(field), PERSON_TIME_FMT)
    return (
        out.select(
            F.date_format(
                F.date_trunc(interval, ts), "yyyy-MM-dd HH:mm:ss"
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


def more_like_this(
    index: InvertedIndex,
    doc_id: str,
    k: int = 10,
    max_query_terms: int = 25,
    min_term_freq: int = 1,
    min_doc_freq: int = 1,
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    fetch: str = "auto",
) -> DataFrame:
    """ES ``more_like_this`` analog: find documents similar to
    ``doc_id``.  Lucene's MLT recipe — read the doc's term vector
    (:func:`term_vector`), keep terms with tf ≥ ``min_term_freq`` and
    corpus df ≥ ``min_doc_freq``, rank by interestingness tf·idf and
    keep the top ``max_query_terms`` (ties broken term-asc, where
    Lucene's PriorityQueue order is unspecified), then run a bool-should
    BM25 search over the selected terms with equal clause weights (ES
    ``boost_terms`` disabled, its default) — through the ordinary
    ``pre_weights`` scoring seam, so filters/routing/fetch behave like
    :func:`search`.  The source doc itself is excluded from the hits
    (ES ``include: false``, its default): kernels keep top k+1 per part
    so dropping it never under-fills the page."""
    if max_query_terms < 1:
        raise ValueError("max_query_terms must be >= 1")
    spark = index.postings.sparkSession
    tv = term_vector(index, doc_id)
    cand = [(t, tf) for t, tf in tv if tf >= min_term_freq]
    dfs = _term_dfs(index, [t for t, _ in cand])
    idf = index.idf_map([t for t, _ in cand])
    scored_terms = [
        (tf * idf[t], t)
        for t, tf in cand
        if t in idf and dfs.get(t, 0) >= min_doc_freq
    ]
    scored_terms.sort(key=lambda x: (-x[0], x[1]))
    selected = [t for _, t in scored_terms[:max_query_terms]]
    if not selected:
        return _local_result(spark, [], _HITS_FIELDS)
    drows = index.doc_stats.filter(F.col("id") == doc_id).select(
        "doc_idx"
    ).collect()
    src_idx = int(drows[0]["doc_idx"])
    plan = score_plan(index, "", k=k + 1, lang=lang, repo=repo,
                      pre_weights={t: 1.0 for t in selected})
    if plan is None:
        return _local_result(spark, [], _HITS_FIELDS)
    cand_rows = [r for r in plan.collect() if int(r["doc_idx"]) != src_idx]
    return _rank_and_fetch(index, cand_rows, k, fetch)


def _make_metric_kernel(
    predicates: list[tuple[str, tuple[str, ...]]],
    docs_per_part: int,
    interval: int | None,
    neg_terms: frozenset[str] = frozenset(),
    n_required: int = 0,
    min_match: int = 0,
    dl_range: tuple[int, int] | None = None,
):
    """Per-doc_part metric kernel (cogroup signature: postings,
    filters): build the matched mask exactly like the facet kernel
    (OR / AND / ≥min_match counting, minus exclusions, AND predicate
    bitmaps), fill a per-slot dl array from the decoded posting lists
    (every term entry carries its doc's dl; any term's value is THE
    value), then emit either ONE stats partial row (interval=None) or
    per-bucket count rows."""
    from ..functions.codecs import delta_decode, unpack_doc_set, varint_decode

    pred_vals = {f: frozenset(vals) for f, vals in predicates}

    def kernel(postings_pdf: pd.DataFrame, filter_pdf=None) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"bucket": [], "n": [], "sum_dl": [], "min_dl": [], "max_dl": []}
        )
        if len(postings_pdf) == 0:
            return empty
        part = int(postings_pdf["doc_part"].iloc[0])
        base = part * docs_per_part
        matched = None
        counts = (np.zeros(docs_per_part, dtype=np.int32)
                  if min_match > 1 else None)
        excl = np.zeros(docs_per_part, dtype=bool) if neg_terms else None
        dls_arr = np.zeros(docs_per_part, dtype=np.int64)
        n_pos_seen = 0
        for row in postings_pdf.itertuples(index=False):
            docs = delta_decode(varint_decode(bytes(row.docs_bin)))
            if row.term in neg_terms:
                mask = np.zeros(docs_per_part, dtype=bool)
                mask[docs.astype(np.int64) - base] = True
                excl |= mask
                continue
            dls = varint_decode(bytes(row.dls_bin))
            if dl_range is not None:
                # ES range filter over dl, applied before the mask
                keep = (dls >= dl_range[0]) & (dls <= dl_range[1])
                docs, dls = docs[keep], dls[keep]
            local = docs.astype(np.int64) - base
            mask = np.zeros(docs_per_part, dtype=bool)
            mask[local] = True
            dls_arr[local] = dls
            n_pos_seen += 1
            if counts is not None:
                counts += mask
            elif matched is None:
                matched = mask
            elif n_required:
                matched &= mask
            else:
                matched |= mask
        if counts is not None:
            if n_pos_seen < min_match:
                return empty
            matched = counts >= min_match
        if matched is None or (n_required and n_pos_seen < n_required):
            return empty
        if excl is not None:
            matched &= ~excl

        if filter_pdf is not None and len(filter_pdf):
            pred_masks: dict[str, np.ndarray] = {}
            for row in filter_pdf.itertuples(index=False):
                bits = unpack_doc_set(bytes(row.bits), docs_per_part)
                fv = pred_vals.get(row.field)
                if fv is not None and row.value in fv:
                    m = pred_masks.get(row.field)
                    pred_masks[row.field] = bits if m is None else (m | bits)
            if len(pred_masks) < len(pred_vals):
                return empty
            for m in pred_masks.values():
                matched &= m
        elif pred_vals:
            return empty

        d = dls_arr[matched]
        if d.size == 0:
            return empty
        if interval:
            b = (d // interval) * interval
            ub, cnt = np.unique(b, return_counts=True)
            z = np.zeros(len(ub), dtype=np.int64)
            return pd.DataFrame({"bucket": ub, "n": cnt.astype(np.int64),
                                 "sum_dl": z, "min_dl": z, "max_dl": z})
        return pd.DataFrame({
            "bucket": [0], "n": [int(d.size)], "sum_dl": [int(d.sum())],
            "min_dl": [int(d.min())], "max_dl": [int(d.max())],
        })

    return kernel


EXPLAIN_FIELDS = [("term", "string"), ("occurrences", "int"),
                  ("idf", "double"), ("tf", "long"), ("dl", "long"),
                  ("tfn", "double"), ("contribution", "double")]


def explain(index: InvertedIndex, query: str, doc_id: str) -> DataFrame:
    """ES ``_explain`` analog: the per-term BM25 breakdown of ``doc_id``'s
    score for ``query`` — one row per matching analyzed term with
    (occurrences, idf, tf, dl, tfn, contribution); summing
    ``contribution`` reproduces the doc's :func:`search` score exactly.

    Cost is a point plan, not a search: one pushed doc_stats lookup for
    the doc's (doc_idx, doc_part), then a postings scan pruned to the
    query terms AND that single doc_part (both filters reach the
    parquet scan), decoded driver-side for just this doc."""
    analyze_query = QUERY_ANALYZERS.get(index.analyzer, code_search_analyze)
    weights = Counter(analyze_query(query))
    spark = index.postings.sparkSession
    if not weights:
        return _local_result(spark, [], EXPLAIN_FIELDS)
    drows = index.doc_stats.filter(F.col("id") == doc_id).select(
        "doc_idx", "doc_part"
    ).collect()
    if not drows:
        raise ValueError(f"doc id {doc_id!r} not found in the index")
    doc_idx, doc_part = int(drows[0]["doc_idx"]), int(drows[0]["doc_part"])
    idf = index.idf_map(list(weights))
    prows = index.postings.filter(
        (F.col("term").isin(list(weights))) & (F.col("doc_part") == doc_part)
    ).select("term", "docs_bin", "tfs_bin", "dls_bin").collect()
    out = []
    for r in prows:
        docs, tfs, dls = unpack_postings(
            bytes(r["docs_bin"]), bytes(r["tfs_bin"]), bytes(r["dls_bin"])
        )
        pos = int(np.searchsorted(docs, doc_idx))
        if pos >= len(docs) or int(docs[pos]) != doc_idx:
            continue  # term absent from this doc: contributes nothing
        tf, dl = int(tfs[pos]), int(dls[pos])
        tfn = float(_tfn(np.array([tf]), np.array([dl]), index.avgdl)[0])
        occ = int(weights[r["term"]])
        out.append((r["term"], occ, float(idf[r["term"]]), tf, dl, tfn,
                    occ * idf[r["term"]] * tfn))
    out.sort(key=lambda t: t[0])
    return _local_result(spark, out, EXPLAIN_FIELDS)


EXPLAIN_MF_FIELDS = [("field", "string")] + EXPLAIN_FIELDS


def explain_fields(
    index: InvertedIndex,
    query: str,
    doc_id: str,
    fields: tuple[str, ...] | None = None,
) -> DataFrame:
    """ES ``_explain`` for the multi-field bool-should shape: one row
    per (field, matching analyzed term) with the same clause columns as
    :func:`explain` — each field analyzes the query with ITS chain and
    normalizes with ITS avgdl/idf; a ``^boost`` suffix folds into the
    contribution exactly as :func:`multi_score_plan` folds it into the
    clause weight.  Summing ``contribution`` reproduces the doc's
    :func:`multi_search` score exactly.

    Same point plan as :func:`explain`, once per involved field: a
    pushed doc_stats id lookup, then per-field postings scans pruned to
    that field's query terms AND the doc's single doc_part."""
    spark = index.postings.sparkSession
    built = index.fields or {}
    if fields is None:
        fields = ("content", *sorted(built))
    boosted = _parse_field_boosts(fields)
    unknown = [f for f, _ in boosted if f != "content" and f not in built]
    if unknown:
        raise ValueError(f"index has no field(s) {unknown!r}")
    drows = index.doc_stats.filter(F.col("id") == doc_id).select(
        "doc_idx", "doc_part"
    ).collect()
    if not drows:
        raise ValueError(f"doc id {doc_id!r} not found in the index")
    doc_idx, doc_part = int(drows[0]["doc_idx"]), int(drows[0]["doc_part"])

    out = []
    for f, boost in boosted:
        if f == "content":
            chain = QUERY_ANALYZERS.get(index.analyzer, code_search_analyze)
            weights = Counter(chain(query))
            idf = index.idf_map(list(weights))
            post, avgdl = index.postings, index.avgdl
        else:
            fh = built[f]
            chain = FIELD_QUERY_ANALYZERS.get(fh.analyzer,
                                              code_search_analyze)
            weights = Counter(chain(query))
            idf = index.field_idf(f, list(weights))
            post, avgdl = fh.postings, fh.avgdl
        live = [t for t in weights if t in idf]
        if not live:
            continue
        prows = post.filter(
            (F.col("term").isin(live)) & (F.col("doc_part") == doc_part)
        ).select("term", "docs_bin", "tfs_bin", "dls_bin").collect()
        for r in prows:
            docs, tfs, dls = unpack_postings(
                bytes(r["docs_bin"]), bytes(r["tfs_bin"]), bytes(r["dls_bin"])
            )
            pos = int(np.searchsorted(docs, doc_idx))
            if pos >= len(docs) or int(docs[pos]) != doc_idx:
                continue
            tf, dl = int(tfs[pos]), int(dls[pos])
            tfn = float(_tfn(np.array([tf]), np.array([dl]), avgdl)[0])
            occ = int(weights[r["term"]])
            out.append((f, r["term"], occ, float(idf[r["term"]]), tf, dl,
                        tfn, occ * idf[r["term"]] * boost * tfn))
    out.sort(key=lambda t: (t[0], t[1]))
    return _local_result(spark, out, EXPLAIN_MF_FIELDS)


def _make_facet_kernel(
    fields: tuple[str, ...],
    predicates: list[tuple[str, tuple[str, ...]]],
    docs_per_part: int,
    include_total: bool,
    neg_terms: frozenset[str] = frozenset(),
    n_required: int = 0,
    min_match: int = 0,
    dl_range: tuple[int, int] | None = None,
):
    """Per-doc_part facet kernel (cogroup signature: postings, filters).

    matched = union of the query terms' posting docs (OR), or the
    intersection of the ``n_required`` distinct terms' docs (bool must /
    ``operator="and"``), minus any ``neg_terms`` doc (bool must_not) —
    then ANDed with the predicate bitmaps (multi-value predicates OR
    their values' bitmaps first — ES terms filter); each facet row
    counts ``popcount(matched & bits)``.
    Postings carry live docs only (deltas repack dead docs out), so a
    stale set bit for a dead doc in a sidecar bitmap can never count.
    """
    from ..functions.codecs import delta_decode, unpack_doc_set, varint_decode

    pred_vals = {f: frozenset(vals) for f, vals in predicates}

    def kernel(postings_pdf: pd.DataFrame, filter_pdf=None) -> pd.DataFrame:
        empty = pd.DataFrame({"field": [], "value": [], "n": []})
        if len(postings_pdf) == 0:
            return empty
        part = int(postings_pdf["doc_part"].iloc[0])
        base = part * docs_per_part
        matched = None  # lazily seeded: OR starts empty, AND starts full
        counts = (np.zeros(docs_per_part, dtype=np.int32)
                  if min_match > 1 else None)
        excl = np.zeros(docs_per_part, dtype=bool) if neg_terms else None
        n_pos_seen = 0
        for row in postings_pdf.itertuples(index=False):
            docs = delta_decode(varint_decode(bytes(row.docs_bin)))
            if row.term in neg_terms:
                mask = np.zeros(docs_per_part, dtype=bool)
                mask[docs.astype(np.int64) - base] = True
                excl |= mask
                continue
            if dl_range is not None:
                # ES range filter: drop positive-match docs outside
                # [lo, hi] before they enter the matched mask
                dls = varint_decode(bytes(row.dls_bin))
                docs = docs[(dls >= dl_range[0]) & (dls <= dl_range[1])]
            mask = np.zeros(docs_per_part, dtype=bool)
            mask[docs.astype(np.int64) - base] = True
            n_pos_seen += 1
            if counts is not None:
                counts += mask
            elif matched is None:
                matched = mask
            elif n_required:
                matched &= mask
            else:
                matched |= mask
        if counts is not None:
            # minimum_should_match: a doc counts when it matches ≥ N
            # distinct terms (each term contributes its mask once)
            if n_pos_seen < min_match:
                return empty
            matched = counts >= min_match
        if matched is None or (n_required and n_pos_seen < n_required):
            return empty  # no positive term / a required term absent here
        if excl is not None:
            matched &= ~excl

        facet_rows: list[tuple[str, str, np.ndarray]] = []
        if filter_pdf is not None and len(filter_pdf):
            pred_masks: dict[str, np.ndarray] = {}
            for row in filter_pdf.itertuples(index=False):
                bits = unpack_doc_set(bytes(row.bits), docs_per_part)
                fv = pred_vals.get(row.field)
                if fv is not None and row.value in fv:
                    m = pred_masks.get(row.field)
                    pred_masks[row.field] = bits if m is None else (m | bits)
                if row.field in fields:
                    facet_rows.append((row.field, row.value, bits))
            if len(pred_masks) < len(pred_vals):
                return empty  # some predicate matches nothing in this part
            for m in pred_masks.values():
                matched &= m
        elif pred_vals:
            return empty

        out_f: list[str] = []
        out_v: list[str] = []
        out_n: list[int] = []
        if include_total:
            out_f.append("_total")
            out_v.append("")
            out_n.append(int(matched.sum()))
        for f, v, bits in facet_rows:
            n = int((matched & bits).sum())
            if n:
                out_f.append(f)
                out_v.append(v)
                out_n.append(n)
        if not out_f:
            return empty
        return pd.DataFrame({"field": out_f, "value": out_v, "n": out_n})

    return kernel


def phrase_search(
    index: InvertedIndex,
    phrase: str,
    k: int = 10,
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    fetch: str = "auto",
    slop: int = 0,
    offset: int = 0,
    search_after: tuple[float, str] | None = None,
) -> DataFrame:
    """Phrase query (ES ``match_phrase`` analog) over the
    positional-postings sidecar, scored the Lucene PhraseQuery way —
    BM25 with tf = phrase frequency and idf = the sum of the constituent
    terms' idfs.

    ``slop=0`` (default) matches the analyzed tokens at CONSECUTIVE
    positions.  ``slop>0`` is ES ``match_phrase`` with ``slop``: Lucene
    sloppy-phrase semantics, where terms may spread apart or transpose
    as long as the edit-distance-like match length stays ≤ slop, and
    each match contributes ``1/(1+matchLength)`` to a fractional phrase
    frequency (see :func:`sloppy_freq`).  Sloppy matching of a phrase
    containing the same analyzed term twice is not supported (raises —
    Lucene's repeat-cursor disambiguation is out of scope).

    Physical plan mirrors :func:`search`: per doc_part the kernel
    intersects the cheap delta-decoded doc-id lists FIRST (docs-first,
    like Lucene's conjunction cursors), then byte-slices and decodes
    ONLY the surviving docs' position blobs; for slop=0, term i's
    positions offset by −i intersect as sorted (local_doc, pos) keys —
    surviving keys ARE the phrase occurrences.  Keyword filters ride
    the same sidecar bitmaps, repo routing prunes doc_parts, and only
    ≤ k·n_parts candidate rows reach the driver; the fetch phase is
    shared with ``search``.
    """
    import math

    spark = index.postings.sparkSession
    if index.pos_postings is None:
        raise ValueError(
            "phrase_search needs the positional-postings sidecar "
            "(build_index(..., positions=True))"
        )
    if slop < 0:
        raise ValueError("slop must be >= 0")
    if offset < 0:
        raise ValueError("offset must be >= 0")
    cursor = None
    if search_after is not None:
        # ES supports search_after on any query shape; phrase pages with
        # the same O(k)-per-page cursor as term search
        if offset:
            raise ValueError("offset and search_after are mutually exclusive")
        cursor = _resolve_cursors(index, {"_": search_after})["_"]
    # the sidecar is its own field (ES sub-field pattern): analyze the
    # phrase with ITS chain and take idf from ITS dfs — one tiny
    # term-pruned aggregation, global like Lucene's PhraseWeight idf
    analyze_query = {"simple": code_search_analyze,
                     "default": default_analyze}[index.pos_analyzer or "simple"]
    terms = analyze_query(phrase)
    if not terms:
        return _local_result(spark, [], _HITS_FIELDS)
    if slop and len(set(terms)) != len(terms):
        raise ValueError(
            "slop > 0 with a repeated analyzed term is not supported"
        )
    dfs = {
        r["term"]: int(r["df"])
        for r in index.pos_postings.filter(F.col("term").isin(sorted(set(terms))))
        .groupBy("term").agg(F.sum("df").alias("df")).collect()
    }
    if any(t not in dfs for t in terms):
        # a term absent from the collection cannot phrase-match anywhere
        return _local_result(spark, [], _HITS_FIELDS)
    n = float(index.n_docs)
    idf = {t: math.log(1.0 + (n - d + 0.5) / (d + 0.5)) for t, d in dfs.items()}
    idf_sum = float(sum(idf[t] for t in terms))  # duplicates count twice

    cand = index.pos_postings.filter(
        F.col("term").isin(sorted(set(terms)))
    ).select("doc_part", "term", "docs_bin", "cnt_bin", "dls_bin", "pos_bin")

    predicates, repo_t = _kw_predicates(lang, repo)
    parts = _route_parts(index, repo_t)
    if parts is not None:
        if not parts:
            return _local_result(spark, [], _HITS_FIELDS)
        cand = cand.filter(F.col("doc_part").isin(parts))
    if predicates and index.filters is None:
        raise ValueError(
            "keyword-filtered phrase_search needs the index's filters sidecar"
        )

    avgdl = index.pos_avgdl if index.pos_avgdl is not None else index.avgdl
    kernel = _make_phrase_kernel(
        list(terms), idf_sum, avgdl, k + offset, index.docs_per_part,
        len(predicates), slop, after=cursor,
    )
    if predicates:
        fsel = index.filters.filter(_filters_cond(predicates)).select(
            "doc_part", "field", "value", "bits"
        )
        if parts is not None:
            fsel = fsel.filter(F.col("doc_part").isin(parts))
        scored = (
            cand.groupBy("doc_part")
            .cogroup(fsel.groupBy("doc_part"))
            .applyInPandas(kernel, schema=TOPK_SCHEMA)
        )
    else:
        scored = cand.groupBy("doc_part").applyInPandas(
            _wrap_single(kernel), schema=TOPK_SCHEMA
        )
    return _rank_and_fetch(index, scored.collect(), k, fetch, offset=offset)


_RESCORE_MODES = ("total", "multiply", "max", "min", "avg")


def rescore_phrase(
    index: InvertedIndex,
    query: str,
    phrase: str,
    window_size: int = 50,
    k: int = 10,
    query_weight: float = 1.0,
    rescore_query_weight: float = 1.0,
    slop: int = 0,
    score_mode: str = "total",
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    fetch: str = "auto",
) -> DataFrame:
    """ES ``rescore`` with a ``match_phrase`` rescorer — the classic
    two-phase ranking: a cheap BM25 first pass selects the top
    ``window_size`` docs, then ONLY those docs are re-scored by phrase
    proximity and re-ranked by ``query_weight · primary  <score_mode>
    rescore_query_weight · secondary`` (ES score_mode total/multiply/
    max/min/avg; a window doc the phrase doesn't match keeps its
    weighted primary score, as ES does).  ``slop`` passes through to
    the sloppy-phrase matcher.

    Physical plan: phase 1 is :func:`score_plan` (≤ window·n_parts
    candidate rows); phase 2 prunes the positional scan to the WINDOW
    DOCS' doc_parts and terms, and the phrase kernel folds the window
    ids into its filter bitmap before any position blob decodes — so
    rescoring costs O(window) regardless of how many docs match the
    phrase corpus-wide.  That per-window cost bound is the entire
    point of the ES rescore API, preserved here."""
    import math as _m

    if score_mode not in _RESCORE_MODES:
        raise ValueError(f"score_mode must be one of {_RESCORE_MODES}, "
                         f"got {score_mode!r}")
    if window_size < 1 or k < 1:
        raise ValueError("window_size >= 1 and k >= 1 required")
    if k > window_size:
        raise ValueError("k must be <= window_size (ES returns the "
                         "rescored window)")
    if slop < 0:
        raise ValueError("slop must be >= 0")
    spark = index.postings.sparkSession
    if index.pos_postings is None:
        raise ValueError(
            "rescore_phrase needs the positional-postings sidecar "
            "(build_index(..., positions=True))"
        )
    empty = _local_result(spark, [], _HITS_FIELDS)

    scored = score_plan(index, query, k=window_size, lang=lang, repo=repo)
    if scored is None:
        return empty
    cand = [(float(r["score"]), int(r["doc_idx"])) for r in scored.collect()]
    if not cand:
        return empty
    cand.sort(key=lambda t: (-t[0], t[1]))
    window = cand[:window_size]

    analyze_pos = {"simple": code_search_analyze,
                   "default": default_analyze}[index.pos_analyzer or "simple"]
    terms = analyze_pos(phrase)
    if slop and len(set(terms)) != len(terms):
        raise ValueError(
            "slop > 0 with a repeated analyzed term is not supported"
        )
    sec: dict[int, float] = {}
    if terms:
        dfs = {
            r["term"]: int(r["df"])
            for r in index.pos_postings.filter(
                F.col("term").isin(sorted(set(terms))))
            .groupBy("term").agg(F.sum("df").alias("df")).collect()
        }
        if all(t in dfs for t in terms):
            n = float(index.n_docs)
            idf_sum = float(sum(
                _m.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
                for t in terms
            ))
            allowed: dict[int, list[int]] = {}
            for _, d in window:
                allowed.setdefault(d // index.docs_per_part, []).append(d)
            allowed_np = {p: np.asarray(v, dtype=np.int64)
                          for p, v in allowed.items()}
            pcand = index.pos_postings.filter(
                F.col("term").isin(sorted(set(terms)))
                & F.col("doc_part").isin(sorted(allowed_np))
            ).select("doc_part", "term", "docs_bin", "cnt_bin", "dls_bin",
                     "pos_bin")
            avgdl = (index.pos_avgdl if index.pos_avgdl is not None
                     else index.avgdl)
            kernel = _make_phrase_kernel(
                list(terms), idf_sum, avgdl, window_size,
                index.docs_per_part, 0, slop, allowed_by_part=allowed_np,
            )
            sec = {
                int(r["doc_idx"]): float(r["score"])
                for r in pcand.groupBy("doc_part")
                .applyInPandas(_wrap_single(kernel), schema=TOPK_SCHEMA)
                .collect()
            }

    qw, rw = float(query_weight), float(rescore_query_weight)
    final: list[dict] = []
    for orig, d in window:
        p = qw * orig
        if d in sec:
            s = rw * sec[d]
            v = {"total": p + s, "multiply": p * s, "max": max(p, s),
                 "min": min(p, s), "avg": (p + s) / 2.0}[score_mode]
        else:
            v = p
        final.append({"doc_idx": d, "score": v})
    return _rank_and_fetch(index, final, k, fetch)


def expand_phrase_prefix(
    index: InvertedIndex, prefix: str, max_expansions: int = 50
) -> list[tuple[str, int]]:
    """Expansion for the LAST position of a ``match_phrase_prefix``
    query: vocabulary terms of the POSITIONAL sidecar field starting
    with ``prefix``, ranked (df desc, term asc) and capped at
    ``max_expansions`` — the same Lucene top-terms rewrite as the other
    multi-term queries, but GLOBAL and deterministic where ES expands
    per-shard (an ES match_phrase_prefix caveat this engine improves
    on).  Returns (term, df) pairs — dfs feed the MultiPhraseQuery idf
    sum.  One column-pruned sidecar aggregation with the ``startswith``
    predicate pushed to parquet."""
    return _expand_phrase_prefixes(index, {"_": (prefix, max_expansions)})["_"]


def _expand_phrase_prefixes(
    index: InvertedIndex, wants: dict[str, tuple[str, int]]
) -> dict[str, list[tuple[str, int]]]:
    """Batch form of :func:`expand_phrase_prefix`: ONE sidecar (term,
    df) aggregation with the OR'd startswith predicates pushed;
    per-entry membership and the ranked cap resolve driver-side (rows
    bounded by the matching vocabulary)."""
    from functools import reduce

    if index.pos_postings is None:
        raise ValueError(
            "phrase_prefix expansion needs the positional-postings sidecar "
            "(build_index(..., positions=True))"
        )
    conds = []
    for _, (prefix, cap) in wants.items():
        if cap < 1:
            raise ValueError("max_expansions must be >= 1")
        conds.append(F.col("term").startswith(str(prefix)))
    rows = (
        index.pos_postings.filter(reduce(lambda a, b: a | b, conds))
        .groupBy("term").agg(F.sum("df").alias("df"))
        .collect()
    )
    out: dict[str, list[tuple[str, int]]] = {}
    for key, (prefix, cap) in wants.items():
        m = sorted(
            ((int(r["df"]), r["term"]) for r in rows
             if r["term"].startswith(prefix)),
            key=lambda x: (-x[0], x[1]),
        )
        out[key] = [(t, d) for d, t in m[:cap]]
    return out


def phrase_prefix_search(
    index: InvertedIndex,
    phrase: str,
    k: int = 10,
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    max_expansions: int = 50,
    fetch: str = "auto",
    offset: int = 0,
    search_after: tuple[float, str] | None = None,
) -> DataFrame:
    """ES ``match_phrase_prefix`` (the search-as-you-type / autocomplete
    query): the analyzed tokens must appear at consecutive positions,
    with the LAST token treated as a prefix whose expansions (see
    :func:`expand_phrase_prefix`) may complete the phrase — the Lucene
    MultiPhraseQuery rewrite ES compiles it to.

    Scoring follows MultiPhraseQuery: a position holds exactly one
    token, so each phrase occurrence ends with exactly ONE expansion
    and the phrase frequency is the SUM of the per-expansion phrase
    frequencies; idf is the sum over all positions' terms — fixed terms
    plus every expansion (Lucene's idfExplain over the termStats array).
    Slop is not supported with a prefix position (per-expansion sloppy
    windows can interact; ES defaults slop=0 here too).

    Physical plan: the expansion is ONE pushed-startswith sidecar
    aggregation; the phrase job then scans pos_postings pruned to
    fixed ∪ expansions, and per doc_part each expansion reuses the
    fixed terms' memoized decodes/boundary scans (:func:`_phrase_hits`)
    — cost tracks max_expansions, bounded like the other rewrites.
    Filters/routing/pagination/cursors compose as in
    :func:`phrase_search`."""
    import math

    spark = index.postings.sparkSession
    if index.pos_postings is None:
        raise ValueError(
            "phrase_prefix_search needs the positional-postings sidecar "
            "(build_index(..., positions=True))"
        )
    if offset < 0:
        raise ValueError("offset must be >= 0")
    cursor = None
    if search_after is not None:
        if offset:
            raise ValueError("offset and search_after are mutually exclusive")
        cursor = _resolve_cursors(index, {"_": search_after})["_"]
    analyze_query = {"simple": code_search_analyze,
                     "default": default_analyze}[index.pos_analyzer or "simple"]
    tokens = analyze_query(phrase)
    if not tokens:
        return _local_result(spark, [], _HITS_FIELDS)
    fixed, last = tokens[:-1], tokens[-1]

    exps = expand_phrase_prefix(index, last, max_expansions=max_expansions)
    if not exps:
        return _local_result(spark, [], _HITS_FIELDS)
    if fixed:
        dfs = {
            r["term"]: int(r["df"])
            for r in index.pos_postings.filter(
                F.col("term").isin(sorted(set(fixed)))
            ).groupBy("term").agg(F.sum("df").alias("df")).collect()
        }
        if any(t not in dfs for t in fixed):
            return _local_result(spark, [], _HITS_FIELDS)
    else:
        dfs = {}
    n = float(index.n_docs)

    def _idf(d: int) -> float:
        return math.log(1.0 + (n - d + 0.5) / (d + 0.5))

    # MultiPhraseQuery idf: every position's terms contribute — the
    # fixed terms (duplicates count) plus every expansion
    idf_sum = float(sum(_idf(dfs[t]) for t in fixed)
                    + sum(_idf(d) for _, d in exps))
    exp_terms = [t for t, _ in exps]

    scan_terms = sorted(set(fixed) | set(exp_terms))
    cand = index.pos_postings.filter(
        F.col("term").isin(scan_terms)
    ).select("doc_part", "term", "docs_bin", "cnt_bin", "dls_bin", "pos_bin")

    predicates, repo_t = _kw_predicates(lang, repo)
    parts = _route_parts(index, repo_t)
    if parts is not None:
        if not parts:
            return _local_result(spark, [], _HITS_FIELDS)
        cand = cand.filter(F.col("doc_part").isin(parts))
    if predicates and index.filters is None:
        raise ValueError(
            "keyword-filtered phrase_prefix_search needs the index's "
            "filters sidecar"
        )

    avgdl = index.pos_avgdl if index.pos_avgdl is not None else index.avgdl
    kernel = _make_phrase_prefix_kernel(
        list(fixed), exp_terms, idf_sum, avgdl, k + offset,
        index.docs_per_part, len(predicates), after=cursor,
    )
    if predicates:
        fsel = index.filters.filter(_filters_cond(predicates)).select(
            "doc_part", "field", "value", "bits"
        )
        if parts is not None:
            fsel = fsel.filter(F.col("doc_part").isin(parts))
        scored = (
            cand.groupBy("doc_part")
            .cogroup(fsel.groupBy("doc_part"))
            .applyInPandas(kernel, schema=TOPK_SCHEMA)
        )
    else:
        scored = cand.groupBy("doc_part").applyInPandas(
            _wrap_single(kernel), schema=TOPK_SCHEMA
        )
    return _rank_and_fetch(index, scored.collect(), k, fetch, offset=offset)


def _make_phrase_prefix_kernel(
    fixed: list[str],
    expansions: list[str],
    idf_sum: float,
    avgdl: float,
    k: int,
    docs_per_part: int,
    n_predicates: int,
    after: tuple[float, int] | None = None,
):
    """Per-doc_part match_phrase_prefix kernel: one docs-first
    :func:`_phrase_hits` run per expansion over SHARED decodes (the
    fixed terms' doc lists, position boundaries, and full-decode caches
    memoize on the decoded entries), phrase frequencies summed per doc
    (a position holds one token, so per-expansion occurrences are
    disjoint), then one BM25 evaluation of the summed tf."""

    def kernel(pos_pdf: pd.DataFrame, filter_pdf=None) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_idx": [], "score": []})
        if len(pos_pdf) == 0:
            return empty
        part = int(pos_pdf["doc_part"].iloc[0])
        base = np.int64(part) * np.int64(docs_per_part)
        bits = None
        if n_predicates:
            bits = _fold_filter_bits(filter_pdf, n_predicates, docs_per_part)
            if bits is None:
                return empty

        decoded = _phrase_cheap_decode(pos_pdf)
        docs_l: list[np.ndarray] = []
        pf_l: list[np.ndarray] = []
        dl_l: list[np.ndarray] = []
        for e in expansions:
            hit = _phrase_hits(decoded, fixed + [e], base, bits, 0)
            if hit is None:
                continue
            hit_local, pf, dl = hit
            docs_l.append(hit_local)
            pf_l.append(pf)
            dl_l.append(dl.astype(np.int64))
        if not docs_l:
            return empty
        uniq, inv = np.unique(np.concatenate(docs_l), return_inverse=True)
        pf_tot = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(pf_tot, inv, np.concatenate(pf_l))
        dl_arr = np.zeros(len(uniq), dtype=np.int64)
        dl_arr[inv] = np.concatenate(dl_l)  # same doc → same dl
        scores = idf_sum * _tfn(pf_tot, dl_arr, avgdl)
        doc_idx, score = _topk_arrays(uniq + base, scores, k, after=after)
        return pd.DataFrame({"doc_idx": doc_idx, "score": score})

    return kernel


def sloppy_freq(arrays: list[np.ndarray], slop: int) -> float:
    """Lucene sloppy-phrase frequency for ONE document.

    ``arrays[i]`` is phrase term i's offset-adjusted positions
    (``position − i``), sorted ascending; terms must be distinct.
    Transcribes the public SloppyPhraseScorer/SloppyPhraseMatcher
    algorithm: a min-heap of per-term cursors slides a window; each
    time the minimum cursor would overtake the runner-up, the smallest
    match length seen for the current configuration contributes
    ``1/(1+matchLength)`` if ``matchLength ≤ slop``.  Transpositions
    are allowed when slop affords them (adjusted positions may go
    negative), matching ES ``match_phrase`` with ``slop``.
    """
    import heapq

    heap = [(int(a[0]), i, 0) for i, a in enumerate(arrays)]
    heapq.heapify(heap)
    end = max(int(a[0]) for a in arrays)
    freq = 0.0
    pos, i, c = heapq.heappop(heap)
    match_length = end - pos
    next_pos = heap[0][0] if heap else pos
    while True:
        c += 1
        if c >= len(arrays[i]):
            break
        pos = int(arrays[i][c])
        if pos > end:
            end = pos
        while pos > next_pos:
            if match_length <= slop:
                freq += 1.0 / (1.0 + match_length)
            heapq.heappush(heap, (pos, i, c))
            pos, i, c = heapq.heappop(heap)
            next_pos = heap[0][0] if heap else pos
            match_length = end - pos
        ml2 = end - pos
        if ml2 < match_length:
            match_length = ml2
    if match_length <= slop:
        freq += 1.0 / (1.0 + match_length)
    return freq


def parse_simple_query_string(q: str) -> dict:
    """Parse the ES ``simple_query_string`` subset GitLab's search box
    speaks: bare tokens are term clauses, ``"..."`` quoted groups are
    phrase clauses, ``-token`` excludes (bool must_not), and a trailing
    ``*`` on a token is stripped (the edgeNGram'd index already
    prefix-matches bare tokens, so ``tok*`` ≡ ``tok``).  Returns
    ``{"terms": [...], "phrases": [...], "must_not": [...]}``.

    Unsupported ES extras raise instead of silently mis-matching:
    ``|`` OR groups, ``( )`` precedence, ``-"..."`` negated phrases,
    and unbalanced quotes.
    """
    import re

    if q.count('"') % 2:
        raise ValueError("unbalanced quotes in simple_query_string")
    phrases: list[str] = []
    terms: list[str] = []
    neg: list[str] = []
    for m in re.finditer(r'(-?)"([^"]*)"|(-?)([^\s"]+)', q):
        if m.group(2) is not None:
            if m.group(1):
                raise ValueError("negated phrases are not supported")
            if m.group(2).strip():
                phrases.append(m.group(2))
            continue
        tok = m.group(4)
        for bad in "|()":
            if bad in tok:
                raise ValueError(
                    f"simple_query_string operator {bad!r} is not supported"
                )
        tok = tok.rstrip("*")
        if not tok or tok == "-":
            continue
        if m.group(3):
            neg.append(tok)
        else:
            terms.append(tok)
    return {"terms": terms, "phrases": phrases, "must_not": neg}


def simple_query_string(
    index: InvertedIndex,
    q: str,
    k: int = 10,
    default_operator: str = "and",
    lang: str | list[str] | None = None,
    repo: str | list[str] | None = None,
    fetch: str = "auto",
    offset: int = 0,
    search_after: tuple[float, str] | None = None,
) -> DataFrame:
    """ES ``simple_query_string`` (the query GitLab advanced search
    issues, with ``default_operator: and``): term clauses, quoted
    phrase clauses, and ``-token`` exclusions combined under one bool —
    a hit must match every clause (AND) or any clause (OR), scores are
    the clause BM25 sums (terms over the content field, phrases the
    Lucene PhraseQuery way over the positional sub-field).

    Pure-term or pure-phrase queries dispatch to :func:`search` /
    :func:`phrase_search`; mixed queries run ONE combined kernel per
    doc_part over a tagged union of the postings and positional scans
    (each clause evaluated partition-locally, clause doc-sets
    intersected/unioned and exclusion applied before the local top-k —
    only ≤ k·n_parts candidates shuffle, same bound as every other
    query path).  Identical quoted phrases dedupe to one clause.
    """
    if default_operator not in ("or", "and"):
        raise ValueError("default_operator must be 'or' or 'and'")
    parsed = parse_simple_query_string(q)
    terms_q = " ".join(parsed["terms"])
    neg_q = " ".join(parsed["must_not"]) or None
    if not parsed["terms"] and not parsed["phrases"]:
        raise ValueError(
            "simple_query_string needs at least one positive clause "
            "(pure-negation match-all queries are not supported)"
        )
    if not parsed["phrases"]:
        return search(index, terms_q, k=k, lang=lang, repo=repo,
                      operator=default_operator, must_not=neg_q,
                      fetch=fetch, offset=offset, search_after=search_after)
    if len(parsed["phrases"]) == 1 and not parsed["terms"] and not neg_q:
        return phrase_search(index, parsed["phrases"][0], k=k, lang=lang,
                             repo=repo, fetch=fetch, offset=offset,
                             search_after=search_after)
    return _bool_search(index, parsed, default_operator, k, lang, repo,
                        fetch, offset, search_after=search_after)


def _bool_search(
    index: InvertedIndex,
    parsed: dict,
    operator: str,
    k: int,
    lang: str | list[str] | None,
    repo: str | list[str] | None,
    fetch: str,
    offset: int,
    search_after: tuple[float, str] | None = None,
) -> DataFrame:
    """Mixed term+phrase bool evaluation (see
    :func:`simple_query_string`)."""
    if offset < 0:
        raise ValueError("offset must be >= 0")
    cursor = None
    if search_after is not None:
        if offset:
            raise ValueError("offset and search_after are mutually exclusive")
        cursor = _resolve_cursors(index, {"_": search_after})["_"]
    scored = _bool_scored(index, parsed, operator, k + offset, lang, repo,
                          after_cursor=cursor)
    if scored is None:
        return _local_result(
            index.postings.sparkSession, [], _HITS_FIELDS
        )
    return _rank_and_fetch(index, scored.collect(), k, fetch, offset=offset)


def _bool_scored(
    index: InvertedIndex,
    parsed: dict,
    operator: str,
    k: int,
    lang: str | list[str] | None,
    repo: str | list[str] | None,
    after_cursor: tuple[float, int] | None = None,
) -> DataFrame | None:
    """The LAZY scoring phase of :func:`_bool_search`: per-doc_part
    top-k (doc_idx, score) candidates, or None when nothing can match
    — also the per-entry evaluator for mixed ``qs`` bodies in
    :func:`search_many`."""
    import math

    spark = index.postings.sparkSession
    empty = None
    if index.pos_postings is None:
        raise ValueError(
            "phrase clauses need the positional-postings sidecar "
            "(build_index(..., positions=True))"
        )
    analyze_q = QUERY_ANALYZERS.get(index.analyzer, code_search_analyze)
    p_analyze = {"simple": code_search_analyze,
                 "default": default_analyze}[index.pos_analyzer or "simple"]

    weights = Counter(t for w in parsed["terms"] for t in analyze_q(w))
    neg = frozenset(t for w in parsed["must_not"] for t in analyze_q(w))
    idf = index.idf_map(list(weights))
    widf = {t: idf[t] * n for t, n in weights.items() if t in idf}

    # phrase clauses: analyzed with the sidecar's chain, idf from ITS
    # dfs (one term-pruned aggregation over every clause's terms)
    phrase_terms = {p: p_analyze(p) for p in dict.fromkeys(parsed["phrases"])}
    phrase_terms = {p: ts for p, ts in phrase_terms.items() if ts}
    all_pterms = sorted({t for ts in phrase_terms.values() for t in ts})
    dfs: dict[str, int] = {}
    if all_pterms:
        dfs = {
            r["term"]: int(r["df"])
            for r in index.pos_postings.filter(F.col("term").isin(all_pterms))
            .groupBy("term").agg(F.sum("df").alias("df")).collect()
        }
    n_docs = float(index.n_docs)
    p_idf = {t: math.log(1.0 + (n_docs - d + 0.5) / (d + 0.5))
             for t, d in dfs.items()}

    if operator == "and":
        if neg & set(weights):
            return empty  # a term required AND excluded
        if len(widf) < len(weights):
            return empty  # a required term has df=0
        for ts in phrase_terms.values():
            if any(t not in dfs for t in ts):
                return empty  # a required phrase can't match anywhere
    else:
        widf = {t: w for t, w in widf.items() if t not in neg}
        phrase_terms = {
            p: ts for p, ts in phrase_terms.items()
            if all(t in dfs for t in ts)
        }
    if not widf and not phrase_terms:
        return empty

    phrase_specs = [
        (list(ts), float(sum(p_idf[t] for t in ts)))
        for ts in phrase_terms.values()
    ]

    predicates, repo_t = _kw_predicates(lang, repo)
    if predicates and index.filters is None:
        raise ValueError(
            "keyword-filtered simple_query_string needs the index's "
            "filters sidecar"
        )

    term_scan = sorted(set(widf) | neg)
    pos_scan = sorted({t for ts, _ in phrase_specs for t in ts})
    sides = []
    if term_scan:
        sides.append(
            index.postings.filter(F.col("term").isin(term_scan)).select(
                "doc_part", "term", "docs_bin", "tfs_bin", "dls_bin",
            ).withColumn("src", F.lit("t"))
        )
    if pos_scan:
        sides.append(
            index.pos_postings.filter(F.col("term").isin(pos_scan)).select(
                "doc_part", "term", "docs_bin",
                F.col("dls_bin"), "cnt_bin", "pos_bin",
            ).withColumn("src", F.lit("p"))
        )
    cand = sides[0]
    for s in sides[1:]:
        cand = cand.unionByName(s, allowMissingColumns=True)

    parts = _route_parts(index, repo_t)
    if parts is not None:
        if not parts:
            return empty
        cand = cand.filter(F.col("doc_part").isin(parts))

    pos_avgdl = index.pos_avgdl if index.pos_avgdl is not None else index.avgdl
    kernel = _make_bool_kernel(
        widf, neg, phrase_specs, index.avgdl, pos_avgdl, k,
        index.docs_per_part, len(predicates), operator, after=after_cursor,
    )
    if predicates:
        fsel = index.filters.filter(_filters_cond(predicates)).select(
            "doc_part", "field", "value", "bits"
        )
        if parts is not None:
            fsel = fsel.filter(F.col("doc_part").isin(parts))
        scored = (
            cand.groupBy("doc_part")
            .cogroup(fsel.groupBy("doc_part"))
            .applyInPandas(kernel, schema=TOPK_SCHEMA)
        )
    else:
        scored = cand.groupBy("doc_part").applyInPandas(
            _wrap_single(kernel), schema=TOPK_SCHEMA
        )
    return scored


def _make_bool_kernel(
    widf: dict[str, float],
    neg_terms: frozenset[str],
    phrase_specs: list[tuple[list[str], float]],
    avgdl: float,
    pos_avgdl: float,
    k: int,
    docs_per_part: int,
    n_predicates: int,
    operator: str,
    after: tuple[float, int] | None = None,
):
    """Per-doc_part mixed bool kernel: the input frame carries BOTH
    scans, tagged ``src='t'`` (postings: docs/tfs/dls) and ``src='p'``
    (positional sidecar rows for the phrase clauses).  Each clause
    produces a partition-local (sorted docs, scores) pair — term
    clauses by the usual decode (+ keyword bitmap mask), phrase clauses
    through the shared docs-first :func:`_phrase_hits` — then clause
    doc-sets intersect (AND) or union (OR), exclusion docs are removed,
    and the local top-k is emitted.  Exactly the ES bool query a
    simple_query_string compiles to, evaluated shard-locally.
    """

    n_req = (len(widf) + len(phrase_specs)) if operator == "and" else 0

    def kernel(pdf: pd.DataFrame, filter_pdf=None) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_idx": [], "score": []})
        if len(pdf) == 0:
            return empty
        part = int(pdf["doc_part"].iloc[0])
        base = np.int64(part) * np.int64(docs_per_part)
        bits = None
        if n_predicates:
            bits = _fold_filter_bits(filter_pdf, n_predicates, docs_per_part)
            if bits is None:
                return empty

        tpdf = pdf[pdf["src"] == "t"]
        ppdf = pdf[pdf["src"] == "p"]

        clauses: list[tuple[np.ndarray, np.ndarray]] = []
        excl_parts: list[np.ndarray] = []
        for row in tpdf.itertuples(index=False):
            docs, tfs, dls = unpack_postings(
                bytes(row.docs_bin), bytes(row.tfs_bin), bytes(row.dls_bin)
            )
            docs = docs.astype(np.int64)
            if row.term in neg_terms:
                excl_parts.append(docs)
                continue
            if bits is not None:
                keep = bits[docs - base]
                docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
            if len(docs) == 0:
                if n_req:
                    return empty  # a required clause is empty here
                continue
            clauses.append((docs, widf[row.term] * _tfn(tfs, dls, avgdl)))
        if n_req and len(clauses) < len(widf):
            return empty  # a required term has no row in this part

        if phrase_specs:
            decoded = _phrase_cheap_decode(ppdf)
            for terms_list, idf_sum in phrase_specs:
                hit = _phrase_hits(decoded, terms_list, base, bits, 0)
                if hit is None:
                    if n_req:
                        return empty  # required phrase absent here
                    continue
                hit_local, pf, dl = hit
                clauses.append(
                    (hit_local + base, idf_sum * _tfn(pf, dl, pos_avgdl))
                )
        if not clauses or (n_req and len(clauses) < n_req):
            return empty

        if n_req:
            order = sorted(range(len(clauses)),
                           key=lambda i: len(clauses[i][0]))
            inter = clauses[order[0]][0]
            for i in order[1:]:
                inter = inter[_sorted_member(inter, clauses[i][0])]
                if len(inter) == 0:
                    return empty
            acc = np.zeros(len(inter), dtype=np.float64)
            for docs, scores in clauses:
                acc += scores[np.searchsorted(docs, inter)]
            uniq = inter
        else:
            all_docs = np.concatenate([c[0] for c in clauses])
            all_scores = np.concatenate([c[1] for c in clauses])
            uniq, inv = np.unique(all_docs, return_inverse=True)
            acc = np.zeros(len(uniq), dtype=np.float64)
            np.add.at(acc, inv, all_scores)

        if excl_parts:
            excl = (excl_parts[0] if len(excl_parts) == 1
                    else np.unique(np.concatenate(excl_parts)))
            keep = ~_sorted_member(uniq, excl)
            uniq, acc = uniq[keep], acc[keep]
        doc_idx, score = _topk_arrays(uniq, acc, k, after=after)
        return pd.DataFrame({"doc_idx": doc_idx, "score": score})

    return kernel


def _make_phrase_kernel(
    terms: list[str],
    idf_sum: float,
    avgdl: float,
    k: int,
    docs_per_part: int,
    n_predicates: int,
    slop: int = 0,
    after: tuple[float, int] | None = None,
    allowed_by_part: dict[int, np.ndarray] | None = None,
):
    """Per-doc_part phrase kernel, docs-first and positions-lazy.

    ``allowed_by_part`` restricts evaluation to an explicit bounded
    doc set (global doc_idx arrays keyed by doc_part) — the rescore
    window: the allowed ids fold into the same bitmap the keyword
    filters use, so only window docs' position blobs ever decode.

    The doc-id lists (one cheap delta+varint stream per term) and the
    keyword-filter bitmap intersect FIRST — like Lucene's conjunction
    doc cursors — so a hot term's corpus-wide position list is never
    materialized; only the surviving docs' position blobs are
    byte-sliced out of the concatenated per-doc stream
    (``pos_blob_boundaries`` finds varint ends without decoding) and
    decoded.  For slop=0, (local_doc << 32 | position−i) keys per term
    are strictly increasing, so successive ``np.intersect1d(
    assume_unique=True)`` leaves exactly the phrase start positions;
    counts per surviving local_doc are the phrase frequencies.  For
    slop>0 each surviving doc runs :func:`sloppy_freq`."""

    def kernel(pos_pdf: pd.DataFrame, filter_pdf=None) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_idx": [], "score": []})
        if len(pos_pdf) == 0:
            return empty
        part = int(pos_pdf["doc_part"].iloc[0])
        base = np.int64(part) * np.int64(docs_per_part)
        bits = None
        if n_predicates:
            bits = _fold_filter_bits(filter_pdf, n_predicates, docs_per_part)
            if bits is None:
                return empty
        if allowed_by_part is not None:
            arr = allowed_by_part.get(part)
            if arr is None or not len(arr):
                return empty
            abits = np.zeros(docs_per_part, dtype=bool)
            abits[np.asarray(arr, dtype=np.int64) - base] = True
            bits = abits if bits is None else (bits & abits)

        decoded = _phrase_cheap_decode(pos_pdf)
        hit = _phrase_hits(decoded, terms, base, bits, slop)
        if hit is None:
            return empty
        hit_local, pf, dl = hit
        scores = idf_sum * _tfn(pf, dl, avgdl)
        doc_idx, score = _topk_arrays(hit_local + base, scores, k, after=after)
        return pd.DataFrame({"doc_idx": doc_idx, "score": score})

    return kernel


def _phrase_cheap_decode(pos_pdf: pd.DataFrame) -> dict[str, dict]:
    """Cheap decodes only — doc ids, per-doc counts, dls; the position
    stream stays raw bytes until the surviving docs are known."""
    from ..functions.codecs import varint_decode, delta_decode

    decoded: dict[str, dict] = {}
    for row in pos_pdf.itertuples(index=False):
        decoded[row.term] = {
            "docs": delta_decode(varint_decode(bytes(row.docs_bin))).astype(np.int64),
            "counts": varint_decode(bytes(row.cnt_bin)).astype(np.int64),
            "dls": varint_decode(bytes(row.dls_bin)).astype(np.int64),
            "pos_bin": bytes(row.pos_bin),
        }
    return decoded


def _isect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of two SORTED-UNIQUE int64 arrays without the
    re-sort ``np.intersect1d`` pays: binary-search the smaller array
    into the larger (O(min·log max) vs O((n+m)·log(n+m)))."""
    if len(a) > len(b):
        a, b = b, a
    if len(b) == 0:
        return b[:0]
    idx = np.searchsorted(b, a)
    idx[idx == len(b)] = 0  # out-of-range probes can't match b[idx]
    return a[b[idx] == a]


def _phrase_hits(
    decoded: dict[str, dict],
    terms: list[str],
    base: np.int64,
    bits: np.ndarray | None,
    slop: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """Docs-first, positions-lazy phrase matching within ONE doc_part.

    Returns ``(hit_local, phrase_freq, dl)`` or None when no doc
    matches.  Each term's pos-blob boundary scan is memoized on its
    ``decoded`` entry, so a batch of phrase queries sharing a hot term
    walks its position stream's varint ends exactly once per part.
    """
    from ..functions.codecs import pos_blob_boundaries, varint_decode

    SHIFT = np.int64(1) << np.int64(32)
    uniq_terms = list(dict.fromkeys(terms))
    if any(t not in decoded for t in terms):
        return None  # some phrase term absent from this part

    # 1) docs-first: intersect doc ids across terms, then the filter.
    # Every array here is already sorted-unique (delta-decoded doc ids;
    # (doc<<32|pos) keys below), so a searchsorted merge replaces
    # intersect1d's full re-sort — the dominant cost on hot-hot pairs.
    surv: np.ndarray | None = None
    for t in uniq_terms:
        d = decoded[t]["docs"]
        surv = d if surv is None else _isect_sorted(surv, d)
        if len(surv) == 0:
            return None
    if bits is not None:
        surv = surv[bits[(surv - base)]]
        if len(surv) == 0:
            return None

    # 2) positions: HYBRID per term.  The lazy byte-slice (boundary
    # scan + ragged gather + re-decode of selected bytes) wins when the
    # doc intersection is selective; for an unselective one (a hot-hot
    # pair where most docs survive) it costs ~2x a single straight
    # decode of the whole stream — so when survivors carry most of the
    # term's positions, decode everything once and mask (both branches
    # use the same segment-reset cumsum as unpack_pos_lists: each
    # per-doc blob's first delta is its absolute first position)
    pos_of: dict[str, dict] = {}
    for t in uniq_terms:
        ent = decoded[t]
        idx = np.searchsorted(ent["docs"], surv)
        counts = ent["counts"][idx]
        sel = int(counts.sum())
        total = int(ent["counts"].sum())
        if sel * 2 >= total:  # unselective: full decode + mask
            full = ent.get("full_pos")
            if full is None:
                deltas = varint_decode(ent["pos_bin"]).astype(np.int64)
                csum = np.cumsum(deltas)
                fstarts = np.cumsum(ent["counts"]) - ent["counts"]
                seg0 = np.where(fstarts > 0, csum[fstarts - 1], 0)
                full = ent["full_pos"] = csum - np.repeat(
                    seg0, ent["counts"]
                )
            mask = np.zeros(len(ent["docs"]), dtype=bool)
            mask[idx] = True
            pos = full[np.repeat(mask, ent["counts"])]
        else:  # selective: slice only the survivors' blobs
            bnd = ent.get("bnd")
            if bnd is None:
                bnd = ent["bnd"] = pos_blob_boundaries(
                    ent["counts"], ent["pos_bin"]
                )
            raw = np.frombuffer(ent["pos_bin"], dtype=np.uint8)
            starts, ends = bnd[idx], bnd[idx + 1]
            lens = ends - starts
            # ragged gather: one vectorized index build, no per-doc loop
            shift = np.repeat(
                starts - (np.cumsum(lens) - lens), lens
            )
            blob = raw[np.arange(int(lens.sum()), dtype=np.int64) + shift]
            deltas = varint_decode(blob.tobytes()).astype(np.int64)
            csum = np.cumsum(deltas)
            sstarts = np.cumsum(counts) - counts
            seg0 = np.where(sstarts > 0, csum[sstarts - 1], 0)
            pos = csum - np.repeat(seg0, counts)
        pos_of[t] = {
            "counts": counts,
            "pos": pos,
            "ends": np.cumsum(counts),
        }

    if slop == 0:
        inter: np.ndarray | None = None
        for i, t in enumerate(terms):
            p = pos_of[t]
            local = np.repeat(surv - base, p["counts"])
            keys = local * SHIFT + (p["pos"] - np.int64(i))
            if i:
                keys = keys[p["pos"] >= i]  # negative starts can't match
            inter = keys if inter is None else _isect_sorted(inter, keys)
            if len(inter) == 0:
                return None
        hit_local, pf = np.unique(inter // SHIFT, return_counts=True)
        pf = pf.astype(np.float64)
    else:
        hit_list: list[int] = []
        pf_list: list[float] = []
        for j in range(len(surv)):
            arrays: list[np.ndarray] = []
            for i, t in enumerate(terms):
                p = pos_of[t]
                e = int(p["ends"][j])
                s = e - int(p["counts"][j])
                arrays.append(p["pos"][s:e] - np.int64(i))
            f = sloppy_freq(arrays, slop)
            if f > 0.0:
                hit_list.append(int(surv[j] - base))
                pf_list.append(f)
        if not hit_list:
            return None
        hit_local = np.asarray(hit_list, dtype=np.int64)
        pf = np.asarray(pf_list, dtype=np.float64)

    t0 = decoded[terms[0]]
    dl = t0["dls"][np.searchsorted(t0["docs"] - base, hit_local)]
    return hit_local, pf, dl


def _make_batch_phrase_kernel(
    phrase_q: dict[str, dict],
    preds_by_query: dict[str, list[tuple[str, tuple[str, ...]]]],
    parts_by_query: dict[str, set[int]],
    avgdl: float,
    n_by_query: dict[str, int],
    docs_per_part: int,
    after_by_query: dict[str, tuple[float, int]] | None = None,
):
    """Per-doc_part BATCHED phrase kernel (the ES ``_msearch`` mixed-body
    analog): every phrase entry of the batch scores in this one job.
    Each term's cheap decodes (doc ids / counts / dls) happen once and
    the pos-blob boundary scan is memoized by :func:`_phrase_hits`, so
    entries sharing a hot term amortize its stream walk; per entry the
    docs-first intersection and lazy position slicing are identical to
    the single-query kernel."""
    after_by_query = after_by_query or {}
    from ..functions.codecs import unpack_doc_set

    def kernel(pos_pdf: pd.DataFrame, filter_pdf=None) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": [], "doc_idx": [], "score": []})
        if len(pos_pdf) == 0:
            return empty
        part = int(pos_pdf["doc_part"].iloc[0])
        base = np.int64(part) * np.int64(docs_per_part)
        bitmaps: dict[tuple[str, str], np.ndarray] = {}
        if filter_pdf is not None and len(filter_pdf):
            for row in filter_pdf.itertuples(index=False):
                bitmaps[(row.field, row.value)] = unpack_doc_set(
                    bytes(row.bits), docs_per_part
                )

        decoded = _phrase_cheap_decode(pos_pdf)
        qids: list[str] = []
        didx: list[int] = []
        scores: list[float] = []
        for qid, spec in phrase_q.items():
            pq = parts_by_query.get(qid)
            if pq is not None and part not in pq:
                continue  # repo routing excludes this part for this query
            bits = None
            missing_pred = False
            for f, vals in preds_by_query.get(qid) or []:
                fb = None  # OR within the field (ES terms filter)
                for v in vals:
                    b = bitmaps.get((f, v))
                    if b is not None:
                        fb = b if fb is None else (fb | b)
                if fb is None:  # no value of this field matches here
                    missing_pred = True
                    break
                bits = fb if bits is None else (bits & fb)
            if missing_pred or (bits is not None and not bits.any()):
                continue
            alts = spec.get("alts")
            if alts:
                # phrase_prefix entry: sum per-expansion phrase freqs
                # over the shared decodes (same argument as
                # _make_phrase_prefix_kernel)
                docs_l: list[np.ndarray] = []
                pf_l: list[np.ndarray] = []
                dl_l: list[np.ndarray] = []
                for e in alts:
                    hit = _phrase_hits(decoded, list(spec["terms"]) + [e],
                                       base, bits, 0)
                    if hit is None:
                        continue
                    hl, pf, dl = hit
                    docs_l.append(hl)
                    pf_l.append(pf)
                    dl_l.append(dl.astype(np.int64))
                if not docs_l:
                    continue
                uniq, inv = np.unique(np.concatenate(docs_l),
                                      return_inverse=True)
                pf_tot = np.zeros(len(uniq), dtype=np.float64)
                np.add.at(pf_tot, inv, np.concatenate(pf_l))
                dl_arr = np.zeros(len(uniq), dtype=np.int64)
                dl_arr[inv] = np.concatenate(dl_l)
                sc = spec["idf_sum"] * _tfn(pf_tot, dl_arr, avgdl)
                d, s = _topk_arrays(uniq + base, sc, n_by_query[qid],
                                    after=after_by_query.get(qid))
            else:
                hit = _phrase_hits(decoded, spec["terms"], base, bits,
                                   spec["slop"])
                if hit is None:
                    continue
                hit_local, pf, dl = hit
                sc = spec["idf_sum"] * _tfn(pf, dl, avgdl)
                d, s = _topk_arrays(hit_local + base, sc, n_by_query[qid],
                                    after=after_by_query.get(qid))
            qids.extend([qid] * len(d))
            didx.extend(d.tolist())
            scores.extend(s.tolist())
        if not qids:
            return empty
        return pd.DataFrame({"query_id": qids, "doc_idx": didx,
                             "score": scores})

    return kernel
