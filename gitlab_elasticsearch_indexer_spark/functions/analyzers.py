"""Analyzer kernels — the Elasticsearch analysis chain rebuilt natively.

The reference delegates all tokenization to ES; the chain is fully
specified by the index mapping at ``/root/reference/elastic/index.go:9-109``:

* ``code_analyzer``        (index side for blob content / file_name):
  whitespace tokenizer → pattern_capture "code" filter (7 Java regexes,
  preserve_original) → lowercase → asciifolding → edgeNGram(2..40).
  (`elastic/index.go:69-78`, patterns `:18-30`, ngram `:31-35`)
* ``code_search_analyzer`` (query side): whitespace → lowercase →
  asciifolding.  (`elastic/index.go:45-52`; search_analyzer wiring
  `:143-145,148-150`)
* ``path_analyzer``: reversed path_hierarchy tokenizer → lowercase →
  asciifolding → all '/'-suffixes.  (`elastic/index.go:53-60,105-108`)
* ``sha_analyzer``: edgeNGram tokenizer 5..40 over letter/digit runs →
  lowercase → asciifolding.  (`elastic/index.go:61-68,96-104`)

Everything here is a *pure Python kernel* operating on single strings,
plus Arrow-vectorized pandas wrappers in :mod:`..operators.index_build`.
The pure kernels are shared verbatim by the single-node oracle
(:mod:`..oracle`), which makes the rank-identity contract definitional:
Spark and oracle literally run the same tokenizer bytes.

Lucene fidelity notes (documented deviations):

* pattern_capture replicates Lucene's ``PatternCaptureGroupTokenFilter``:
  per token, for every pattern, for every ``find()`` match, every
  non-empty capture group is emitted unless it spans the whole token;
  the original token is preserved (``preserve_original: true``).
  Emission order is (start offset, pattern index) — order only matters
  for golden tests, not for bag-of-words scoring.
* Java ``\\d`` is ASCII-only → we use ``[0-9]``; ``\\p{..}`` classes are
  Unicode (the ``regex`` module provides them).  Java's ASCII ``\\b``
  vs Python's Unicode ``\\b`` differ only on non-ASCII word chars —
  negligible for source code and pinned by goldens.
* asciifolding is approximated by NFKD-decompose + strip combining
  marks + an explicit table for the common non-decomposable Latin
  letters Lucene maps (æ ø ß đ ħ ł œ þ ...).
* Document length (BM25 ``dl``) counts position-bearing tokens, i.e.
  whitespace tokens whose folded form is ≥ min_gram chars — this
  mirrors Lucene's ``discountOverlaps=true`` default where capture
  groups and non-first n-grams carry positionIncrement 0.
"""

from __future__ import annotations

import unicodedata
from collections import Counter

try:  # the `regex` module supports \p{Lu} classes like Java regex
    import regex as _re
except ImportError:  # pragma: no cover
    raise ImportError("the 'regex' module is required for pattern_capture")

# The 7 pattern_capture regexes, transcribed from
# /root/reference/elastic/index.go:21-29 (Java regex → `regex` module).
# The quoted-string patterns are the JSON-UNESCAPED forms ES actually
# compiles: the Go literal "\"((?:\\\"|[^\"]|\\\")*)\"" is the JSON text
# "((?:\"|[^"]|\")*)" and JSON unescaping turns \" into a literal quote,
# so the alternation is ("|[^"]|") — greedy across quotes (a token like
# '"a","b"' captures 'a","b', not 'a' and 'b').
_CODE_PATTERN_SRC = [
    r"(\p{Ll}+|\p{Lu}\p{Ll}+|\p{Lu}+)",  # camelCase / PascalCase / CAPS runs
    r"([0-9]+)",  # digit runs (Java \d is ASCII)
    r"(?=([\p{Lu}]+[\p{L}]+))",  # lookahead capital-run splits
    "\"((?:\"|[^\"]|\")*)\"",  # double-quoted contents (greedy, per ES)
    "'((?:'|[^']|')*)'",  # single-quoted contents (greedy, per ES)
    r"\.([^.]+)(?=\.|\s|\Z)",  # dot-path segments
    r"\/?([^\/]+)(?=\/|\b)",  # slash-path segments
]
_CODE_PATTERNS = [_re.compile(p) for p in _CODE_PATTERN_SRC]

# Lucene ASCIIFoldingFilter extras that NFKD cannot decompose.
_FOLD_EXTRA = str.maketrans(
    {
        "æ": "ae", "Æ": "AE", "ø": "o", "Ø": "O", "ß": "ss", "ẞ": "SS",
        "œ": "oe", "Œ": "OE", "đ": "d", "Đ": "D", "ħ": "h", "Ħ": "H",
        "ł": "l", "Ł": "L", "ŋ": "n", "Ŋ": "N", "ŧ": "t", "Ŧ": "T",
        "þ": "th", "Þ": "TH", "ð": "d", "Ð": "D", "ı": "i", "ĸ": "q",
    }
)

MIN_GRAM = 2
MAX_GRAM = 40
SHA_MIN_GRAM = 5
SHA_MAX_GRAM = 40


def fold_ascii(s: str) -> str:
    """asciifolding filter: diacritics → ASCII (`elastic/index.go:48`)."""
    if s.isascii():
        return s
    s = s.translate(_FOLD_EXTRA)
    nfkd = unicodedata.normalize("NFKD", s)
    return "".join(c for c in nfkd if not unicodedata.combining(c))


def pattern_capture(token: str) -> list[str]:
    """All capture-group emissions of the "code" filter for one token.

    Excludes the original token (callers handle preserve_original).
    Skips empty captures and captures spanning the entire token, exactly
    like Lucene's PatternCaptureGroupTokenFilter.
    """
    out: list[tuple[int, int, str]] = []
    n = len(token)
    for pi, pat in enumerate(_CODE_PATTERNS):
        for m in pat.finditer(token):
            for gi in range(1, pat.groups + 1):
                s, e = m.span(gi)
                if s < 0 or s == e or (s == 0 and e == n):
                    continue
                out.append((s, pi, token[s:e]))
    out.sort(key=lambda t: (t[0], t[1]))
    return [t for _, _, t in out]


def edge_ngrams(token: str, lo: int = MIN_GRAM, hi: int = MAX_GRAM) -> list[str]:
    """edgeNGram filter: all prefixes of length lo..hi (`elastic/index.go:31-35`).

    Tokens shorter than ``lo`` vanish; tokens longer than ``hi`` are only
    represented by their prefixes (the full token is NOT kept) — faithful
    to Lucene's EdgeNGramTokenFilter without preserve_original.
    """
    n = len(token)
    return [token[:k] for k in range(lo, min(n, hi) + 1)]


# ---------------------------------------------------------------------------
# per-token expansion caches — tokens are Zipfian, so memoization turns the
# Python-level capture loop into a dict hit for the hot terms.
_code_cache: dict[str, tuple[tuple[str, ...], int]] = {}
_CACHE_MAX = 1 << 20


def _expand_code_token(tok: str) -> tuple[tuple[str, ...], int]:
    """One whitespace token → (indexed grams, position count 0/1)."""
    hit = _code_cache.get(tok)
    if hit is not None:
        return hit
    grams: list[str] = []
    for t in (tok, *pattern_capture(tok)):
        grams.extend(edge_ngrams(fold_ascii(t.lower())))
    pos = 1 if len(fold_ascii(tok.lower())) >= MIN_GRAM else 0
    res = (tuple(grams), pos)
    if len(_code_cache) < _CACHE_MAX:
        _code_cache[tok] = res
    return res


# ---------------------------------------------------------------------------
# full-text analyzers


def code_analyze_tf(text: str) -> tuple[dict[str, int], int]:
    """Index-side ``code_analyzer``: (term → tf, doc length).

    tf counts duplicate emissions (two patterns capturing the same
    substring both count), matching Lucene postings.
    """
    tfs: Counter[str] = Counter()
    dl = 0
    for tok in text.split():
        grams, pos = _expand_code_token(tok)
        tfs.update(grams)
        dl += pos
    return dict(tfs), dl


# capture-level cache: token → (Counter of folded emissions len>=2, pos)
_capture_cache: dict[str, tuple[dict[str, int], int]] = {}


def _token_captures(tok: str) -> tuple[dict[str, int], int]:
    hit = _capture_cache.get(tok)
    if hit is not None:
        return hit
    caps: Counter[str] = Counter()
    for t in (tok, *pattern_capture(tok)):
        folded = fold_ascii(t.lower())
        if len(folded) >= MIN_GRAM:
            caps[folded] += 1
    pos = 1 if len(fold_ascii(tok.lower())) >= MIN_GRAM else 0
    res = (dict(caps), pos)
    if len(_capture_cache) < _CACHE_MAX:
        _capture_cache[tok] = res
    return res


# multiplicity-expanded capture LIST per token (a capture emitted twice
# appears twice): lets code_capture_tf count a whole doc with ONE
# C-level Counter() instead of a Python-level dict-merge per token —
# measured 2.3× on the tokenize kernel (guide §4.2: per-task work).
_caplist_cache: dict[str, tuple[list[str], int]] = {}


def _token_caplist(tok: str) -> tuple[list[str], int]:
    hit = _caplist_cache.get(tok)
    if hit is not None:
        return hit
    d, pos = _token_captures(tok)
    lst: list[str] = []
    for c, k in d.items():
        if k == 1:
            lst.append(c)
        else:
            lst.extend([c] * k)
    res = (lst, pos)
    if len(_caplist_cache) < _CACHE_MAX:
        _caplist_cache[tok] = res
    return res


def code_capture_tf(text: str) -> tuple[dict[str, int], int]:
    """Capture-level pre-aggregation of ``code_analyzer``.

    Emits (folded capture → emission count, dl) WITHOUT the edgeNGram
    expansion: every gram of a capture is one of its prefixes, so
    downstream kernels can expand prefixes 2..40 after shuffling —
    expanding post-shuffle cuts shuffle volume by the gram multiplicity.
    Identity: expanding each capture into its 2..40-prefixes with these
    counts reproduces code_analyze_tf exactly (pytest-enforced).

    Counting is one C-level ``Counter`` over the memoized per-token
    capture lists; key order (first emission) and counts are identical
    to the per-token dict-merge it replaces (pytest-pinned).
    """
    lst: list[str] = []
    dl = 0
    for tok in text.split():
        caps, pos = _token_caplist(tok)
        lst += caps
        dl += pos
    return dict(Counter(lst)), dl


# expansion mode per analyzer: gram set of a shuffled term row
EXPAND_PREFIXES = {"code": (MIN_GRAM, MAX_GRAM), "simple": None,
                   "default": None, "path": None, "sha": None}


# dl-only per-token cache: pos needs ONLY lower+fold+len (never
# pattern_capture or edgeNGram), so the stats-only dl pass must not pay
# the full gram expansion of `_expand_code_token` on its cache misses —
# measured round 6: the expansion-free pass cuts the doc_stats phase
# multiple-fold on a cold worker (guide §4.2: per-task work).
_dl_cache: dict[str, int] = {}


def code_dl(text: str) -> int:
    """Doc length of ``code_analyzer`` WITHOUT any gram or capture work.

    dl counts position-bearing whitespace tokens — tokens whose folded
    lowercase form is ≥ MIN_GRAM chars, i.e. exactly the `pos` term of
    :func:`_expand_code_token` — so only lower+fold+len is needed.
    Definitionally equal to the `pos` sum of :func:`code_analyze_tf`
    (pytest-pinned identity)."""
    n = 0
    for tok in text.split():
        pos = _dl_cache.get(tok)
        if pos is None:
            pos = 1 if len(fold_ascii(tok.lower())) >= MIN_GRAM else 0
            if len(_dl_cache) < _CACHE_MAX:
                _dl_cache[tok] = pos
        n += pos
    return n


def simple_dl(text: str) -> int:
    return len(text.split())


def default_dl(text: str) -> int:
    return len(_re.findall(r"[\p{L}\p{N}]+", text))


DL_FNS = {"code": code_dl, "simple": simple_dl, "default": default_dl}
# path/sha registered below (their analyze fns are defined later)


def code_analyze_tokens(text: str) -> list[str]:
    """Index-side token stream (ordered, with duplicates) — for goldens."""
    out: list[str] = []
    for tok in text.split():
        out.extend(_expand_code_token(tok)[0])
    return out


def code_search_analyze(text: str) -> list[str]:
    """Query-side ``code_search_analyzer``: whitespace → lower → fold.

    NO pattern_capture, NO edgeNGram (`elastic/index.go:45-52`): prefix
    search works because the *index* holds the prefixes.
    """
    return [fold_ascii(t.lower()) for t in text.split()]


def simple_analyze_tf(text: str) -> tuple[dict[str, int], int]:
    """Symmetric whitespace+lower+fold index (oracle-expressible variant).

    Not a reference analyzer — used for the SQL-checkable scoring path
    where index and search analysis coincide; dl = token count.
    """
    toks = code_search_analyze(text)
    return dict(Counter(toks)), len(toks)


def path_analyze(path: str) -> list[str]:
    """``path_analyzer``: reversed path_hierarchy → lower → fold.

    'a/B/c.rb' → ['a/b/c.rb', 'b/c.rb', 'c.rb'] (`elastic/index.go:105-108`).
    """
    folded = fold_ascii(path.lower())
    parts = folded.split("/")
    return ["/".join(parts[i:]) for i in range(len(parts))]


def sha_analyze(text: str) -> list[str]:
    """``sha_analyzer``: edgeNGram tokenizer 5..40 over letter/digit runs.

    (`elastic/index.go:96-104`) then lowercase+fold.
    """
    out: list[str] = []
    for run in _re.findall(r"[\p{L}0-9]+", text):
        out.extend(edge_ngrams(fold_ascii(run.lower()), SHA_MIN_GRAM, SHA_MAX_GRAM))
    return out


def path_analyze_tf(text: str) -> tuple[dict[str, int], int]:
    """Index-side ``path_analyzer`` field kernel: (suffix-token → tf,
    dl).  Empty tokens (an empty path) index nothing; dl counts the
    emitted suffix tokens — each carries a position in Lucene's
    path_hierarchy stream."""
    toks = [t for t in path_analyze(text) if t]
    return dict(Counter(toks)), len(toks)


def path_dl(text: str) -> int:
    return len([t for t in path_analyze(text) if t])


def sha_analyze_tf(text: str) -> tuple[dict[str, int], int]:
    """Index-side ``sha_analyzer`` field kernel: (gram → tf, dl); the
    edgeNGram TOKENIZER emits each gram as a position-bearing token, so
    dl = gram count."""
    toks = sha_analyze(text)
    return dict(Counter(toks)), len(toks)


def sha_dl(text: str) -> int:
    return len(sha_analyze(text))


def light_english_stem(token: str) -> str:
    """Approximation of the ``my_stemmer`` (type stemmer, name
    light_english — `elastic/index.go:13-17`).

    ES's light_english maps to a dictionary stemmer (KStem); a faithful
    replica isn't possible without its lexicon, so this applies Lucene's
    EnglishMinimalStemFilter rule (plural stripping) — a documented
    deviation confined to the commit-message/default analyzer path.
    The oracle shares this kernel, so engine/oracle identity holds.
    """
    if len(token) < 3 or token[-1] != "s":
        return token
    if token[-2] in ("u", "s"):  # -us / -ss kept, per EnglishMinimalStemmer
        return token
    return token[:-1]


def default_analyze(text: str) -> list[str]:
    """The mapping's ``default`` analyzer: standard tokenizer →
    lowercase → my_stemmer (`elastic/index.go:38-44`).

    The standard (Unicode word-break) tokenizer is approximated by
    maximal letter/digit runs — equivalent for source text and commit
    messages; pinned by goldens.
    """
    toks = _re.findall(r"[\p{L}\p{N}]+", text)
    return [light_english_stem(t.lower()) for t in toks]


def default_analyze_tf(text: str) -> tuple[dict[str, int], int]:
    toks = default_analyze(text)
    return dict(Counter(toks)), len(toks)


def ngram_analyze(text: str, lo: int = 2, hi: int = 3) -> list[str]:
    """``my_ngram_analyzer``: nGram tokenizer 2..3 over letter/digit
    runs → lowercase (`elastic/index.go:79-95`)."""
    out: list[str] = []
    for run in _re.findall(r"[\p{L}\p{N}]+", text.lower()):
        n = len(run)
        for size in range(lo, hi + 1):
            for i in range(0, n - size + 1):
                out.append(run[i : i + size])
    return out


ANALYZERS_TF = {
    "code": code_analyze_tf,
    "simple": simple_analyze_tf,
    "default": default_analyze_tf,
    "path": path_analyze_tf,
    "sha": sha_analyze_tf,
}

# shuffle-level term rows per analyzer: "code" ships captures (expanded
# to prefixes 2..40 post-shuffle, see EXPAND_PREFIXES); others ship the
# final terms directly
CAPTURE_TF = {
    "code": code_capture_tf,
    "simple": simple_analyze_tf,
    "default": default_analyze_tf,
    "path": path_analyze_tf,
    "sha": sha_analyze_tf,
}

DL_FNS["path"] = path_dl
DL_FNS["sha"] = sha_dl
