"""HTML synthesis / extraction and tokenization kernels.

The north rule's per-row invariant: ``extract_text(html)`` must be
byte-identical to the page's reference ``text`` for every url — the
pages fixture is *synthesized* (deterministically, from the driver's
``documents`` table) by :mod:`similaritysearch_jl_ray.sources.pages`
wrapping ``text`` into HTML, and this module is its exact inverse.
Enforced by tests/test_text.py over every row of the fixture.

Tokenization is the correctness contract shared with the DuckDB oracle:
``re.findall('[a-z0-9]+', text.lower())`` ==
``regexp_extract_all(lower(text), '[a-z0-9]+')``.
"""

from __future__ import annotations

import html as _html
import re

import numpy as np
import pyarrow as pa

from ..config import TOKEN_PATTERN

__all__ = [
    "wrap_html",
    "extract_text",
    "batch_extract_text",
    "extract_title",
    "batch_extract_title",
    "tokenize",
    "TOKEN_RE",
    "batch_token_counts",
    "flat_tokens",
]

TOKEN_RE = re.compile(TOKEN_PATTERN)

_BODY_RE = re.compile(rb"<article data-ss=\"text\">(.*?)</article>", re.S)


def wrap_html(text: str, url: str, title: str = "") -> bytes:
    """Deterministic page synthesis: wrap extracted text into HTML.

    The payload lives in one ``<article data-ss="text">`` element,
    HTML-escaped; extract_text() inverts this exactly (byte-identical).
    """
    body = _html.escape(text, quote=False)
    doc = (
        "<!doctype html><html><head><meta charset=\"utf-8\">"
        f"<title>{_html.escape(title, quote=False)}</title>"
        f"<link rel=\"canonical\" href=\"{url}\"></head><body>"
        f"<nav>home | about | contact</nav>"
        f"<article data-ss=\"text\">{body}</article>"
        "<footer>&copy; example</footer></body></html>"
    )
    return doc.encode("utf-8")


def extract_text(html_bytes: bytes) -> str:
    """Inverse of :func:`wrap_html` — byte-identical text per url."""
    m = _BODY_RE.search(html_bytes)
    if m is None:
        return ""
    return _html.unescape(m.group(1).decode("utf-8"))


def batch_extract_text(html):
    """Vectorized :func:`extract_text` over an Arrow binary array —
    byte-identical per row (tests/test_text.py), ~7× the per-row loop.

    The unescape step is three ``replace_substring`` passes
    (``&lt;`` → ``<``, ``&gt;`` → ``>``, ``&amp;`` → ``&`` LAST): an
    ``html.escape(quote=False)`` body contains ``&`` only as the head
    of one of those three entities, so this is the exact inverse of
    the escape (and equals ``html.unescape`` on every such body —
    the longest-entity parse always stops at the entity's own ``;``).
    Rows that are not wrap_html pages extract to ``""`` like the
    scalar path."""
    import pyarrow.compute as pc

    arr = html.combine_chunks() if isinstance(html, pa.ChunkedArray) else html
    if not isinstance(arr, pa.Array):
        arr = pa.array(list(arr), type=pa.binary())
    ext = pc.extract_regex(
        arr, pattern=r'(?s)<article data-ss="text">(?P<body>.*?)</article>'
    )
    body = pc.cast(pc.struct_field(ext, "body"), pa.string())
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&amp;", "&")):
        body = pc.replace_substring(body, pattern=ent, replacement=ch)
    return pc.fill_null(body, "")


_TITLE_RE = re.compile(rb"<title>(.*?)</title>", re.S)


def extract_title(html_bytes: bytes) -> str:
    """The page's <title> payload (unescaped) — the second scorable
    field (fixture contract: text[:TITLE_CHARS], sources/pages.py)."""
    m = _TITLE_RE.search(html_bytes)
    if m is None:
        return ""
    return _html.unescape(m.group(1).decode("utf-8"))


def batch_extract_title(html) -> pa.Array:
    """Vectorized :func:`extract_title` (same 3-entity unescape
    argument as :func:`batch_extract_text`)."""
    import pyarrow.compute as pc

    arr = html.combine_chunks() if isinstance(html, pa.ChunkedArray) else html
    if not isinstance(arr, pa.Array):
        arr = pa.array(list(arr), type=pa.binary())
    ext = pc.extract_regex(arr, pattern=r"(?s)<title>(?P<t>.*?)</title>")
    t = pc.cast(pc.struct_field(ext, "t"), pa.string())
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&amp;", "&")):
        t = pc.replace_substring(t, pattern=ent, replacement=ch)
    return pc.fill_null(t, "")


def tokenize(text: str) -> list[str]:
    """Lowercase ASCII word tokens (the oracle-shared contract)."""
    return TOKEN_RE.findall(text.lower())


def flat_tokens(texts) -> tuple[int, np.ndarray, pa.Array]:
    """Occurrence-level tokenization of a batch — Arrow kernels end to
    end, no per-doc Python. Returns ``(n_docs, doc_of_token, tokens)``
    where ``tokens`` is the flat Arrow string array of every token in
    document order (position order within a doc) and ``doc_of_token``
    maps each to its document index. Same token contract as
    :func:`tokenize` (the shared scalar/oracle definition) — this is
    the feed for the vectorized shingle/simhash kernels
    (functions/hashing.py) and :func:`batch_token_counts`."""
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        arr = texts.combine_chunks()
    elif isinstance(texts, pa.Array):
        arr = texts
    else:
        arr = pa.array(list(texts), type=pa.string())
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    n = len(arr)
    splits = pc.split_pattern_regex(pc.utf8_lower(arr), pattern="[^a-z0-9]+")
    counts = pc.list_value_length(splits).to_numpy().astype(np.int64)
    flat = pc.list_flatten(splits)
    keep = pc.binary_length(flat).to_numpy() > 0
    doc_of_token = np.repeat(np.arange(n, dtype=np.int64), counts)[keep]
    tokens = flat.filter(pa.array(keep))
    return n, doc_of_token, tokens


def batch_token_counts(texts, with_positions: bool = False) -> tuple[np.ndarray, ...]:
    """Per-document term frequencies for a batch of texts — Arrow-
    kernel tokenization end to end, no per-doc Python.

    Accepts a list of strings or an Arrow (Chunked)Array; the build
    pipeline passes the column straight through, so token text never
    materializes as Python objects. Tokenization is ``utf8_lower`` +
    ``split_pattern_regex('[^a-z0-9]+')`` minus empty tokens — the
    same token set as the scalar contract (``findall('[a-z0-9]+')``
    over the lowered text; runs of allowed chars), fixture-parity
    enforced by tests/test_text.py. Lowercasing is utf8proc (Arrow),
    matching DuckDB's ``lower()`` — identical to ``str.lower`` on
    ASCII, which is all the oracle corpus contains.

    Returns ``(doc_idx, terms, tfs, doclens)`` where ``doc_idx`` maps
    each (term, tf) row to its position in ``texts``, ``doclens`` has
    one entry per text. Factorization runs through Arrow's
    ``dictionary_encode`` (C hashing).

    ``with_positions=True`` appends a fifth array: the 0-based token
    positions of every occurrence, grouped by (doc, term) row in row
    order (``tfs`` gives each row's segment length), ascending within
    a row — the positional-postings feed (segment layout v4).
    """
    n, doc_of_token, tokens = flat_tokens(texts)
    doclens = np.bincount(doc_of_token, minlength=n).astype(np.int64)
    total = len(doc_of_token)
    if total == 0:
        empty = (np.empty(0, np.int64), np.empty(0, object), np.empty(0, np.int64), doclens)
        return empty + ((np.empty(0, np.int64),) if with_positions else ())
    enc = tokens.dictionary_encode()
    codes = enc.indices.to_numpy().astype(np.int64)
    vocab = enc.dictionary
    nvocab = len(vocab)
    # group (doc, term) pairs with one stable argsort over a packed key;
    # stability keeps each group's occurrences in token order
    pair = doc_of_token * nvocab + codes
    order = np.argsort(pair, kind="stable")
    pair_s = pair[order]
    bounds = np.flatnonzero(np.r_[True, pair_s[1:] != pair_s[:-1], True])
    tfs = np.diff(bounds).astype(np.int64)
    pair_u = pair_s[bounds[:-1]]
    doc_idx = pair_u // nvocab
    term_idx = pair_u % nvocab
    terms = vocab.take(pa.array(term_idx, type=pa.int64())).to_numpy(zero_copy_only=False)
    if not with_positions:
        return doc_idx, terms, tfs, doclens
    doc_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(doclens[:-1], out=doc_starts[1:])
    tokpos = np.arange(total, dtype=np.int64) - doc_starts[doc_of_token]
    return doc_idx, terms, tfs, doclens, tokpos[order]
