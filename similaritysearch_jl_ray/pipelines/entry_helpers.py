"""Helpers shared by ``__ray_entry__.py`` — index caching and the
oracle-facing result shaping.

The driver compares engine output to DuckDB by sorted-column value
hash, so oracle-facing results round scores to
``SCORE_ROUND_DECIMALS`` *after* ranking at full precision (both sides
rank by (score desc, doc_id asc) at full precision; both sides emit
the same rounded values).
"""

from __future__ import annotations

import hashlib
import os

from ..config import INDEX_LAYOUT_VERSION, SCORE_ROUND_DECIMALS

__all__ = [
    "cached_index_dir",
    "ensure_index",
    "ensure_field_index",
    "ensure_index_variant",
    "SCORE_ROUND_DECIMALS",
]

_CACHE_ROOT = "/tmp/ssjr_cache"


def cached_index_dir(sf_dir: str) -> str:
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(_CACHE_ROOT, f"index_v{INDEX_LAYOUT_VERSION}_{tag}")


def ensure_index(sf_dir: str, **build_kwargs) -> str:
    """Build (or resume) the index for a scale-factor dir, cached in
    /tmp across ``queries()`` callables so the driver's per-query calls
    share one build."""
    from ..sources.pages import pages_dataset
    from .build_index import build_index

    d = cached_index_dir(sf_dir)
    build_index(pages_dataset(sf_dir), d, **build_kwargs)
    return d


def ensure_field_index(sf_dir: str, field: str = "title", **build_kwargs) -> str:
    """Per-field index (multi-field/BM25F serving): same build over
    the same pages, extracting the named field as the text — cached
    beside the body index."""
    from ..sources.pages import pages_dataset
    from ..stages.tokenize import extract_title_batch
    from .build_index import build_index

    if field != "title":
        raise ValueError(f"unknown field {field!r}")
    d = cached_index_dir(sf_dir) + f"_{field}"
    build_index(
        pages_dataset(sf_dir), d, extract_fn=extract_title_batch, **build_kwargs
    )
    return d


def ensure_index_variant(sf_dir: str, tag: str, mutate) -> str:
    """A mutated COPY of the cached base index (deletion entries must
    not tombstone the index every other ``queries()`` entry shares).
    ``mutate(dir)`` runs once; the result is cached like the base."""
    import shutil

    base = ensure_index(sf_dir)
    d = cached_index_dir(sf_dir) + f"_{tag}"
    marker = os.path.join(d, "_variant_done")
    if not os.path.exists(marker):
        shutil.rmtree(d, ignore_errors=True)
        shutil.copytree(base, d)
        mutate(d)
        with open(marker, "w") as f:
            f.write("ok")
    return d
