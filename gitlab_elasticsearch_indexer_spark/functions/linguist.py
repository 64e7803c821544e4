"""A7: linguist language detection (linguist/language.go:62-95).

Lookup semantics transcribed from the reference:

* candidates by exact basename match (``DetectLanguageByFilename``,
  language.go:62-64) — a *unique* filename match wins immediately
  (language.go:79-82);
* else candidates by last-dot extension (``path.Ext`` semantics:
  everything from the final '.' of the basename, so ``foo.go.rb`` →
  ``.rb`` and a bare ``.go`` → ``.go``; language.go:66-68);
* an *ambiguous* filename match is intersected with the extension
  candidates, preserving filename-candidate order (``and()``,
  language.go:46-58,84-86);
* first surviving candidate wins; none → None, which the blob builder
  maps to "Text" (indexer/blob.go:113-120).

Candidate-list order: the reference builds its indexes by iterating a
Go map (languages.go init), whose iteration order is randomized per
process — ambiguous extensions like ``.h`` (C / C++ / Objective-C)
resolve nondeterministically there.  This port uses the table's
alphabetical order (the generated file's literal order), making the
same resolution deterministic.  Documented deviation; every case the
reference's own tests pin (language_test.go:11-47) is unambiguous.
"""

from __future__ import annotations

from gitlab_elasticsearch_indexer_spark.functions.linguist_data import LANGUAGES

EXT_INDEX: dict[str, list[str]] = {}
FILENAME_INDEX: dict[str, list[str]] = {}
LANGUAGE_NAMES: frozenset[str] = frozenset(n for n, _, _, _ in LANGUAGES)

for _name, _type, _exts, _fns in LANGUAGES:
    for _e in _exts:
        EXT_INDEX.setdefault(_e, []).append(_name)
    for _f in _fns:
        FILENAME_INDEX.setdefault(_f, []).append(_name)


def path_base(path: str) -> str:
    """Go path.Base for slash paths (language.go uses the slash-only lib)."""
    return path.rstrip("/").rsplit("/", 1)[-1] or "/"


def path_ext(path: str) -> str:
    """Go path.Ext: suffix from the final '.' in the final element."""
    base = path_base(path)
    i = base.rfind(".")
    return base[i:] if i >= 0 else ""


def detect_language_name(path: str) -> str | None:
    """linguist.DetectLanguage(filename, blob) → language name or None."""
    by_filename = FILENAME_INDEX.get(path_base(path), [])
    if len(by_filename) == 1:
        return by_filename[0]
    by_extension = EXT_INDEX.get(path_ext(path), [])
    if len(by_filename) > 1:
        by_extension = [l for l in by_filename if l in by_extension]
    if by_extension:
        return by_extension[0]
    return None


def detect_language_or_text(path: str) -> str:
    """Blob-level wrapper: nil → "Text" (indexer/blob.go:113-120)."""
    return detect_language_name(path) or "Text"
