from __future__ import annotations

import duckdb
import numpy as np
import pyarrow.parquet as pq

from similaritysearch_jl_ray.functions.text import (
    batch_token_counts,
    extract_text,
    tokenize,
    wrap_html,
)

SF_DIR = "/root/testdata/sf0.001"


def test_wrap_extract_byte_identical_fixture():
    """North-rule invariant: byte-identical extracted text per url,
    over every row of the documents fixture."""
    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    for row in t.to_pylist():
        url = f"https://{row['source']}.example.com/{row['lang']}/{row['doc_id']:08d}"
        html = wrap_html(row["text"], url, title=row["text"][:40])
        assert extract_text(html) == row["text"]


def test_wrap_extract_special_chars():
    for text in ["a & b < c > d", "x &amp; literal", "", "tag <article data-ss=\"text\"> inside? no",
                 "unicode: café 中文", "line\nbreaks\t\ttabs"]:
        assert extract_text(wrap_html(text, "https://u")) == text


def test_tokenize_matches_duckdb():
    texts = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])["text"].to_pylist()
    con = duckdb.connect()
    for text in texts[:50] + ["MiXeD CaSe 42x, punct!  ", ""]:
        sql = con.execute("select regexp_extract_all(lower(?), '[a-z0-9]+')", [text]).fetchone()[0]
        assert tokenize(text) == sql


def test_batch_token_counts():
    texts = ["a b a c", "", "b b b"]
    doc_idx, terms, tfs, doclens = batch_token_counts(texts)
    assert doclens.tolist() == [4, 0, 3]
    got = sorted(zip(doc_idx.tolist(), terms.tolist(), tfs.tolist()))
    assert got == [(0, "a", 2), (0, "b", 1), (0, "c", 1), (2, "b", 3)]


def test_batch_token_counts_matches_tokenize():
    texts = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])["text"].to_pylist()[:100]
    doc_idx, terms, tfs, doclens = batch_token_counts(texts)
    from collections import Counter

    for j, text in enumerate(texts):
        want = Counter(tokenize(text))
        mask = doc_idx == j
        got = dict(zip(terms[mask].tolist(), tfs[mask].tolist()))
        assert got == dict(want)
        assert doclens[j] == sum(want.values())


def test_batch_extract_text_matches_scalar():
    """Vectorized extract must stay byte-identical to the scalar
    contract, including entity-heavy and non-page inputs."""
    import pyarrow as pa

    from similaritysearch_jl_ray.functions.text import batch_extract_text

    texts = ["a & b < c > d", "x &amp; literal", "", "&#65; &copy; &lt;nested&gt;",
             "unicode: café 中文", "line\nbreaks\t\ttabs", "<article data-ss=\"text\"> inside"]
    cases = [wrap_html(t, "https://u") for t in texts] + [b"not a page at all"]
    got = batch_extract_text(pa.array(cases, type=pa.binary())).to_pylist()
    assert got == [extract_text(h) for h in cases]


def test_batch_token_counts_positions_and_arrow_input():
    """Positions parity vs scalar findall + identical output for a
    ChunkedArray input (the zero-materialization build path)."""
    import pyarrow as pa

    texts = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])["text"].to_pylist()[:50]
    texts += ["", "  !!  ", "A b A b a", "9 lives of a cat 9"]
    doc_idx, terms, tfs, doclens, pos = batch_token_counts(texts, with_positions=True)
    # reconstruct each doc's token stream from (term, positions) rows
    offs = np.zeros(len(tfs) + 1, dtype=np.int64)
    np.cumsum(tfs, out=offs[1:])
    for j, text in enumerate(texts):
        want = tokenize(text)
        got = [None] * len(want)
        for r in np.flatnonzero(doc_idx == j):
            for p in pos[offs[r] : offs[r + 1]]:
                got[p] = terms[r]
        assert got == want, j
    chunked = pa.chunked_array([texts[:20], texts[20:]], type=pa.string())
    for a, b in zip((doc_idx, terms, tfs, doclens, pos), batch_token_counts(chunked, True)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_pack_documents_invariants(ray_session):
    """Next-fit packing: bins never exceed the budget except single
    oversize docs; bin ids are contiguous per shard; every doc packs
    exactly once; fill replays the running totals."""
    from similaritysearch_jl_ray.pipelines.packing import pack_documents

    res = pack_documents("/root/testdata/sf0.001", budget=512, shard_size=1000).to_pandas()
    res = res.sort_values("doc_id").reset_index(drop=True)
    assert len(res) == 500 and res["doc_id"].is_unique
    for (_, _), grp in res.groupby(["shard", "bin_id"]):
        total = grp["tokens"].sum()
        assert total <= 512 or len(grp) == 1
        assert grp["fill"].iloc[-1] == total  # running total ends at bin total
    for _, grp in res.groupby("shard"):
        b = grp.sort_values("doc_id")["bin_id"].to_numpy()
        assert b[0] == 0 and (np.diff(b) >= 0).all() and (np.diff(b) <= 1).all()


def test_vectorized_page_synthesis_byte_identical():
    """pages_from_documents (Arrow-kernel synthesis) must emit the
    EXACT bytes of scalar wrap_html with title = text[:TITLE_CHARS] and
    the page_url contract, for every fixture row."""
    from similaritysearch_jl_ray.functions.text import extract_title
    from similaritysearch_jl_ray.sources.pages import (
        TITLE_CHARS,
        page_url,
        pages_from_documents,
    )

    docs = pq.read_table(f"{SF_DIR}/documents.parquet")
    out = pages_from_documents(docs)
    srcs = docs["source"].to_pylist()
    for i, row in enumerate(out.to_pylist()):
        want_url = page_url(srcs[i], row["lang"], row["doc_id"])
        want_html = wrap_html(row["text"], want_url, title=row["text"][:TITLE_CHARS])
        assert row["url"] == want_url
        assert row["html"] == want_html
        assert extract_title(row["html"]) == row["text"][:TITLE_CHARS]


def test_repetition_kernel_matches_scalar():
    """Vectorized bigram-repetition kernel ≡ a naive per-doc Counter
    (the scalar-twin policy every batch kernel in the repo follows)."""
    from collections import Counter

    import pyarrow as pa

    from similaritysearch_jl_ray.functions.rounding import round6
    from similaritysearch_jl_ray.pipelines.textstats import repetition_batch

    texts = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])["text"].to_pylist()
    texts = texts[:80] + ["", "one", "a b a b a b", "x x x x x", "solo pair solo pair zz"]
    batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})

    def naive(text):
        toks = tokenize(text)
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        nb = len(bgs)
        if nb == 0:
            return 0, 0.0, 0.0
        c = Counter(bgs)
        dup = sum(v for v in c.values() if v > 1)
        mx = max(c.values())
        return (
            nb,
            float(round6(np.array([dup / nb]))[0]),
            float(round6(np.array([mx / nb]))[0]),
        )

    for i, row in enumerate(repetition_batch(batch).to_pylist()):
        nb, dr, tr = naive(texts[i])
        assert row["n_bigrams"] == nb, i
        assert row["dup_bigram_ratio"] == dr, i
        assert row["top_bigram_ratio"] == tr, i
