"""BMW must return exactly the exhaustive top-k (docs AND scores)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gitlab_elasticsearch_indexer_spark.functions.codecs import block_stats
from gitlab_elasticsearch_indexer_spark.operators.query import (
    _bmw_topk,
    _exhaustive_topk,
)


def _mk_term(rng, n_docs, w, max_tf=5):
    n = rng.integers(1, n_docs + 1)
    docs = np.sort(rng.choice(n_docs, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, max_tf + 1, size=n)
    dls = rng.integers(5, 200, size=n)
    avgdl = 60.0
    from gitlab_elasticsearch_indexer_spark.operators.query import _tfn

    tfn = _tfn(tfs, dls, avgdl)
    last, bmax_tf, bmin_dl = block_stats(docs, tfs, dls, block=4)  # tiny blocks
    bmax = _tfn(bmax_tf, bmin_dl, avgdl)
    return {
        "w": w, "docs": docs, "tfn": tfn,
        "block_last": last, "block_max": bmax,
        "ub": w * float(_tfn(np.array([tfs.max()]), np.array([dls.min()]), avgdl)[0]),
    }


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=10_000), st.integers(min_value=1, max_value=4),
       st.integers(min_value=1, max_value=12))
def test_bmw_equals_exhaustive(seed, n_terms, k):
    rng = np.random.default_rng(seed)
    terms = [_mk_term(rng, 60, float(rng.random() * 3 + 0.1)) for _ in range(n_terms)]
    ed, es = _exhaustive_topk(terms, k)
    bd, bs = _bmw_topk(terms, k)
    assert np.array_equal(ed, bd), (ed, bd)
    assert np.allclose(es, bs, rtol=0, atol=0)


def test_bmw_empty():
    d, s = _bmw_topk([], 5)
    assert len(d) == 0 and len(s) == 0


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=10_000),
       st.integers(min_value=1, max_value=4),
       st.integers(min_value=1, max_value=12),
       st.integers(min_value=0, max_value=30))
def test_bmw_cursor_equals_exhaustive(seed, n_terms, k, depth):
    """search_after cursors stay exact through BOTH the forced DAAT
    loop and the adaptive dispatch (which may route degenerate cursors
    to the vectorized exhaustive kernel)."""
    rng = np.random.default_rng(seed)
    terms = [_mk_term(rng, 60, float(rng.random() * 3 + 0.1)) for _ in range(n_terms)]
    # derive a real cursor from the full ranking at the given depth
    full_d, full_s = _exhaustive_topk(terms, 10_000)
    if len(full_d) == 0:
        return
    i = min(depth, len(full_d) - 1)
    after = (float(full_s[i]), int(full_d[i]))
    ed, es = _exhaustive_topk(terms, k, after=after)
    for force in (True, False):
        bd, bs = _bmw_topk(terms, k, after=after, force=force)
        assert np.array_equal(ed, bd), (force, ed, bd)
        assert np.allclose(es, bs, rtol=0, atol=0)


def test_bmw_cursor_dispatch_heuristic():
    """A deep cursor (score below every block bound) is routed away
    from the DAAT loop; a shallow cursor (score above nearly all
    bounds) keeps BMW."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        _bmw_cursor_can_skip,
    )

    rng = np.random.default_rng(7)
    terms = [_mk_term(rng, 60, 1.0) for _ in range(2)]
    ceiling = max(float((t["w"] * t["block_max"]).max()) for t in terms)
    assert not _bmw_cursor_can_skip(terms, a_s=0.0)          # deep: θ capped at 0
    assert _bmw_cursor_can_skip(terms, a_s=ceiling * 2.0)    # shallow: all skippable
