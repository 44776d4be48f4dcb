"""Deterministic Common-Crawl-style ``pages`` fixture.

``BASELINE.json.input_hint`` fixes the engine's input shape::

    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

No external data is allowed, so the fixture is synthesized
deterministically from the driver's ``documents`` parquet (doc_id,
text, lang, source): url/warc_ts derive from doc_id, html is
``functions.text.wrap_html(text)`` whose extraction is byte-identical
to ``text`` (the north-rule invariant). ``doc_id`` rides along as the
stable join key to the DuckDB oracle's ``documents`` view.

``replicate > 1`` scales the corpus for benchmarks: copy r of doc d
gets ``doc_id + r * stride`` and a distinct url; text is unchanged
(identical copies also exercise exact-dedup paths).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.text import wrap_html

__all__ = ["pages_from_documents", "pages_dataset", "WARC_EPOCH_US", "page_url"]

# 2025-01-01T00:00:00Z in microseconds; warc_ts = epoch + doc_id seconds
WARC_EPOCH_US = 1735689600000000

# the synthesized page title = text[:TITLE_CHARS] — the second
# scorable field; SQL twin: substr(text, 1, TITLE_CHARS)
TITLE_CHARS = 40


def page_url(source: str, lang: str, doc_id: int) -> str:
    return f"https://{source}.example.com/{lang}/{doc_id:08d}"


def _batch_urls(sources: pa.Array, langs: pa.Array, ids: pa.Array) -> pa.Array:
    """Vectorized :func:`page_url` (byte-identical per row)."""
    import pyarrow.compute as pc

    padded = pc.utf8_lpad(pc.cast(ids, pa.string()), 8, "0")
    return pc.binary_join_element_wise(
        "https://",
        sources,
        ".example.com/",
        langs,
        "/",
        padded,
        "",
    )


def _batch_wrap_html(texts: pa.Array, urls: pa.Array, ids: pa.Array) -> pa.Array:
    """Vectorized :func:`..functions.text.wrap_html` — byte-identical
    per row (tests/test_text.py checks every fixture row). The escape
    is the same three substring replacements ``html.escape(quote=
    False)`` performs, in the same order (& first).

    The page TITLE is the text's first ``TITLE_CHARS`` characters —
    the second scorable field (multi-field/BM25F serving); the DuckDB
    oracle derives it as ``substr(text, 1, TITLE_CHARS)`` (ASCII
    corpus: codeunits == characters)."""
    import pyarrow.compute as pc

    def esc(col):
        for ent, ch in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
            col = pc.replace_substring(col, pattern=ent, replacement=ch)
        return col

    title = pc.utf8_slice_codeunits(texts, 0, TITLE_CHARS)
    doc = pc.binary_join_element_wise(
        '<!doctype html><html><head><meta charset="utf-8"><title>',
        esc(title),
        '</title><link rel="canonical" href="',
        urls,
        '"></head><body><nav>home | about | contact</nav>'
        '<article data-ss="text">',
        esc(texts),
        "</article><footer>&copy; example</footer></body></html>",
        "",
    )
    return pc.cast(doc, pa.binary())


def pages_from_documents(batch: pa.Table, replicate: int = 1, stride: int = 0, with_html: bool = True) -> pa.Table:
    """documents batch → pages batch, Arrow kernels end to end (the
    url/html synthesis used to be per-row Python — it sat inside the
    timed build path via the docmap pass and the head sketch)."""
    out_tables = []
    doc_ids = batch["doc_id"].to_numpy()
    text_col = batch["text"].combine_chunks()
    lang_col = batch["lang"].combine_chunks()
    source_col = batch["source"].combine_chunks()
    for r in range(replicate):
        ids = pa.array(doc_ids + r * stride, type=pa.int64())
        urls = _batch_urls(source_col, lang_col, ids)
        cols = {
            "doc_id": ids,
            "url": urls,
            "warc_ts": pa.array(
                WARC_EPOCH_US + (doc_ids + r * stride) * 1_000_000, type=pa.int64()
            ).cast(pa.timestamp("us")),
            "lang": lang_col,
        }
        if with_html:
            cols["html"] = _batch_wrap_html(text_col, urls, ids)
            cols["text"] = text_col
        out_tables.append(pa.table(cols))
    return pa.concat_tables(out_tables)


def pages_dataset(sf_dir: str, replicate: int = 1, num_blocks: int | None = None, with_html: bool = True):
    """Lazy Ray Dataset of synthesized pages for one scale factor.

    The documents file is a single parquet row group, which Ray would
    read as ONE block — serializing every downstream map. ``num_blocks``
    (default: 64 when replicating) repartitions the tiny source first
    so the synthesis fans out across the CPU pool.
    """
    import ray.data as rd

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    if replicate > 1:
        import pyarrow.parquet as pq

        n_rows = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
        stride = int(n_rows)
        docs = docs.repartition(num_blocks or 64)
    else:
        stride = 0
        if num_blocks:
            docs = docs.repartition(num_blocks)
    # batch_size=None → one batch per block. A row-count batch_size here
    # would COALESCE the small source blocks into a handful of giant
    # batches and serialize the ×replicate synthesis onto ~3 CPUs.
    # with_html=False models a columnar crawl read that projects html
    # away (the doc-map pass needs only ids/urls/langs).
    return docs.map_batches(
        lambda b: pages_from_documents(b, replicate=replicate, stride=stride, with_html=with_html),
        batch_format="pyarrow",
        batch_size=None,
    )
