"""Text-analysis pipelines for training-data curation (task brief:
language-ID, quality scoring, token counting, fingerprinting).

All per-doc transforms are stateless ``map_batches`` over Arrow
batches; the only shuffles are the final small aggregations.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.text import batch_token_counts, flat_tokens, tokenize
from ..functions.rounding import round6

__all__ = [
    "lang_dist",
    "token_totals_by_lang",
    "quality_scores",
    "lang_id",
    "doc_fingerprint",
    "repetition_scores",
    "bigram_pmi",
    "corpus_filter",
]

STOPWORDS = ("the", "a")  # fixed, shared with the SQL oracle

# tiny per-language marker profiles for the heuristic classifier
# (deterministic; a real system would load fasttext — stubbed per brief)
_LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "fr": ("le", "la", "et"),
    "de": ("der", "die", "und"),
    "zh": ("de", "le", "shi"),
}


def _documents(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def lang_dist(sf_dir: str):
    """(lang, n_docs) — groupby-count with in-batch pre-aggregation."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        langs, counts = np.unique(np.asarray(batch["lang"].to_pylist(), dtype=object), return_counts=True)
        return pa.table(
            {"lang": pa.array(langs.tolist()), "partial": pa.array(counts, type=pa.int64())}
        )

    return (
        _documents(sf_dir, ["lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("partial", alias_name="n_docs"))
    )


def token_totals_by_lang(sf_dir: str):
    """(lang, total_tokens) — the partial-aggregate + tiny-shuffle
    pattern (SURVEY.md §2.7 'count/mean' row)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        langs = np.asarray(batch["lang"].to_pylist(), dtype=object)
        dls = batch_token_counts(batch["text"])[3]  # doclens, Arrow kernels
        u, inv = np.unique(langs, return_inverse=True)
        sums = np.zeros(len(u), dtype=np.int64)
        np.add.at(sums, inv, dls)
        return pa.table({"lang": pa.array(u.tolist()), "partial": pa.array(sums, type=pa.int64())})

    return (
        _documents(sf_dir, ["lang", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("partial", alias_name="total_tokens"))
    )


def quality_scores(sf_dir: str):
    """Per-doc quality features: (doc_id, n_chars, n_tokens,
    uniq_ratio, stop_ratio) — ratios rounded to 6dp, 0.0 for empty."""

    def score(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nrows = batch.num_rows
        doc_idx, terms, tfs, doclens = batch_token_counts(batch["text"])
        n_chars = pc.utf8_length(batch["text"].combine_chunks()).to_numpy().astype(np.int64)
        uniq = np.bincount(doc_idx, minlength=nrows).astype(np.int64)  # one row per (doc, term)
        stop_mask = np.isin(terms, np.asarray(STOPWORDS, dtype=object))
        stops = np.zeros(nrows, dtype=np.int64)
        np.add.at(stops, doc_idx[stop_mask], tfs[stop_mask])
        safe = np.maximum(doclens, 1).astype(np.float64)  # empty docs → 0.0 ratios
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": pa.array(n_chars, type=pa.int64()),
                "n_tokens": pa.array(doclens, type=pa.int64()),
                "uniq_ratio": pa.array(round6(uniq / safe), type=pa.float64()),
                "stop_ratio": pa.array(round6(stops / safe), type=pa.float64()),
            }
        )

    return _documents(sf_dir, ["doc_id", "text"]).map_batches(score, batch_format="pyarrow")


def lang_id(sf_dir: str):
    """Heuristic language ID: marker-word voting with deterministic
    'en' fallback. (Model-based ID is stubbed per the brief — the
    plumbing, not the classifier, is the deliverable.) Returns
    (doc_id, pred_lang)."""

    def classify(batch: pa.Table) -> pa.Table:
        nrows = batch.num_rows
        doc_idx, terms, _, _ = batch_token_counts(batch["text"])
        # per-(doc,term) rows are unique, so marker membership per doc
        # is a bincount of matching rows; langs vote in sorted order
        # with strict > and an 'en' zero-evidence fallback — same tie
        # rule as the scalar loop this replaces
        best = np.full(nrows, "en", dtype=object)
        best_score = np.zeros(nrows, dtype=np.int64)
        for lang in sorted(_LANG_MARKERS):
            mask = np.isin(terms, np.asarray(_LANG_MARKERS[lang], dtype=object))
            score = np.bincount(doc_idx[mask], minlength=nrows).astype(np.int64)
            win = score > best_score
            best[win] = lang
            best_score[win] = score[win]
        return pa.table({"doc_id": batch["doc_id"], "pred_lang": pa.array(best.tolist())})

    return _documents(sf_dir, ["doc_id", "text"]).map_batches(classify, batch_format="pyarrow")


def doc_fingerprint(sf_dir: str, window: int = 4):
    """Winnowing document fingerprint (sliding min over hashed token
    4-grams, XOR of the distinct window minima): (doc_id,
    fingerprint). Deterministic across runs and partitionings.

    Round-4: the per-doc Python loop (string-joined grams +
    ``stable_u64`` each) became :func:`fingerprint_batch` — the LAST
    per-row-Python full-corpus stage; grams now ride the SAME
    vectorized token-hash + FNV-window-fold kernels the dedup
    signature stages use (functions/hashing.py), so fingerprint
    VALUES changed with the gram hash family (rows-only entry; the
    scalar twin ``fingerprint_scalar`` is the bit-identity contract).
    """
    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: fingerprint_batch(b, window), batch_format="pyarrow"
    )


def fingerprint_batch(batch: pa.Table, window: int = 4) -> pa.Table:
    """Vectorized winnowing fingerprints for a batch — no per-doc
    Python: one flat token-hash pass, boundary-masked FNV gram folds,
    a shifted-minimum sliding window, and per-doc XOR of distinct
    minima via sort + ``bitwise_xor.reduceat``. Bit-identical to
    :func:`fingerprint_scalar` per doc (pytest-pinned)."""
    from ..functions.hashing import _FNV_OFFSET, _FNV_PRIME, _fold_windows, _mix64, hash_tokens_u64

    nrows = batch.num_rows
    _, doc_of, toks = flat_tokens(batch["text"])
    th = hash_tokens_u64(toks)
    total = len(th)
    dls = np.bincount(doc_of, minlength=nrows).astype(np.int64)
    gram_vals_l, gram_doc_l = [], []
    if total >= window:
        g = _fold_windows(th, window)
        valid = doc_of[: total - window + 1] == doc_of[window - 1 :]
        gram_vals_l.append(g[valid])
        gram_doc_l.append(doc_of[: total - window + 1][valid])
    # short docs (0 < dl < window): one whole-sequence gram each
    starts = np.cumsum(dls) - dls
    for length in range(1, window):
        dsel = np.flatnonzero(dls == length)
        if not len(dsel):
            continue
        st = starts[dsel]
        g = np.full(len(dsel), _FNV_OFFSET, dtype=np.uint64)
        for k in range(length):
            g = (g * _FNV_PRIME) ^ th[st + k]
        gram_vals_l.append(_mix64(g))
        gram_doc_l.append(dsel.astype(np.int64))
    out = np.zeros(nrows, dtype=np.uint64)
    if gram_vals_l:
        gv = np.concatenate(gram_vals_l)
        gd = np.concatenate(gram_doc_l)
        o = np.argsort(gd, kind="stable")  # doc-major, positional within doc
        gv, gd = gv[o], gd[o]
        gcnt = np.bincount(gd, minlength=nrows)
        m = len(gv)
        mins_l, mdoc_l = [], []
        if m >= window:
            span = m - window + 1
            mn = gv[:span].copy()
            for k in range(1, window):
                np.minimum(mn, gv[k : k + span], out=mn)
            validm = gd[:span] == gd[window - 1 :]
            mins_l.append(mn[validm])
            mdoc_l.append(gd[:span][validm])
        short = np.flatnonzero((gcnt > 0) & (gcnt < window))
        if len(short):
            sel = np.isin(gd, short)  # all grams of short-gram docs
            mins_l.append(gv[sel])
            mdoc_l.append(gd[sel])
        if mins_l:
            mv = np.concatenate(mins_l)
            md = np.concatenate(mdoc_l)
            o = np.lexsort((mv, md))
            mv, md = mv[o], md[o]
            keep = np.r_[True, (md[1:] != md[:-1]) | (mv[1:] != mv[:-1])]
            mv, md = mv[keep], md[keep]
            bounds = np.flatnonzero(np.r_[True, md[1:] != md[:-1]])
            out[md[bounds]] = np.bitwise_xor.reduceat(mv, bounds)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(out.view(np.int64), type=pa.int64()),
        }
    )


def fingerprint_scalar(text: str, window: int = 4) -> int:
    """Scalar twin of :func:`fingerprint_batch` (one doc)."""
    from ..functions.hashing import _fold_windows, hash_tokens_u64

    toks = tokenize(text)
    if not toks:
        return 0
    th = hash_tokens_u64(toks)
    grams = _fold_windows(th, window if len(th) >= window else len(th))
    if len(grams) >= window:
        mins = np.array(
            [grams[i : i + window].min() for i in range(len(grams) - window + 1)],
            dtype=np.uint64,
        )
    else:
        mins = grams
    acc = np.uint64(0)
    for v in np.unique(mins):
        acc ^= v
    return int(acc.astype(np.int64))


def repetition_scores(sf_dir: str):
    """Gopher-style repetition quality rules, per document: (doc_id,
    n_bigrams, dup_bigram_ratio, top_bigram_ratio).

    ``dup_bigram_ratio`` = fraction of bigram instances whose bigram
    occurs more than once in the doc (the "duplicate n-gram fraction"
    family of Rae et al. 2021's Gopher rules, token-bigram variant);
    ``top_bigram_ratio`` = occurrences of the most frequent bigram /
    total bigrams ("top n-gram fraction"). Ratios are 0.0 for docs
    with no bigrams; rounded to 6dp (functions/rounding.round6, the
    shared half-away-from-zero contract).

    Fully vectorized: one ``flat_tokens`` pass (Arrow kernels), then
    adjacent-pair grouping via a single lexsort over (doc, code_a,
    code_b) — no per-doc Python, the stateless-map shape that streams
    at 100 TB (nothing shuffles; output is one row per input doc).
    """
    return _documents(sf_dir, ["doc_id", "text"]).map_batches(
        repetition_batch, batch_format="pyarrow"
    )


def repetition_batch(batch: pa.Table) -> pa.Table:
    """The :func:`repetition_scores` batch kernel (module-level so the
    scalar-twin test exercises it directly)."""
    nrows = batch.num_rows
    _, doc_of, toks = flat_tokens(batch["text"])
    enc = toks.dictionary_encode()
    codes = enc.indices.to_numpy().astype(np.int64)
    nb = np.zeros(nrows, dtype=np.int64)
    dup = np.zeros(nrows, dtype=np.int64)
    mx = np.zeros(nrows, dtype=np.int64)
    if len(codes) >= 2:
        same = doc_of[1:] == doc_of[:-1]
        d = doc_of[:-1][same]
        a = codes[:-1][same]
        b = codes[1:][same]
        nb = np.bincount(d, minlength=nrows).astype(np.int64)
        order = np.lexsort((b, a, d))
        ds, as_, bs = d[order], a[order], b[order]
        bounds = np.flatnonzero(
            np.r_[
                True,
                (ds[1:] != ds[:-1]) | (as_[1:] != as_[:-1]) | (bs[1:] != bs[:-1]),
                True,
            ]
        )
        cnt = np.diff(bounds)
        gdoc = ds[bounds[:-1]]
        hot = cnt > 1
        np.add.at(dup, gdoc[hot], cnt[hot])
        np.maximum.at(mx, gdoc, cnt)
    safe = np.maximum(nb, 1).astype(np.float64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_bigrams": pa.array(nb, type=pa.int64()),
            "dup_bigram_ratio": pa.array(round6(dup / safe), type=pa.float64()),
            "top_bigram_ratio": pa.array(round6(mx / safe), type=pa.float64()),
        }
    )


def bigram_pmi(sf_dir: str, min_count: int = 5, top_n: int = 20):
    """Corpus-level collocation extraction: the ``top_n`` token
    bigrams by pointwise mutual information among bigrams with
    ``c_xy ≥ min_count``. Returns (rank, bigram, c_xy, pmi) as a
    pandas DataFrame (the final table is tiny by construction).

    pmi = ln(((c_xy·NU)·NU) / ((NB·c_x)·c_y)) with NU = total corpus
    tokens, NB = total corpus bigrams — the multiplication association
    is FIXED and mirrored in the SQL oracle so both sides evaluate the
    identical float64 expression; 6dp rounding on output only.

    Distributed shape (100 TB): unigram and bigram counts pre-aggregate
    in-batch (``np.unique`` over dictionary codes) so the two groupbys
    shuffle one row per distinct key per block — vocabulary-, not
    corpus-, sized. The ranking itself is DISTRIBUTED (round 5): the
    min_count filter runs in the bigram table's own blocks, unigram
    counts attach via two co-partitioned union joins (hash(x) then
    hash(y) — the dedup verify-join shape; the unigram table is never
    broadcast and never collected), PMI evaluates vectorized inside
    each partition, and each partition emits only its LOCAL top_n by
    the final (−pmi, bigram) key — so the driver receives ≤
    ``grouped_parts()·top_n`` rows, never the candidate vocabulary.
    The global top_n is contained in the union of per-partition
    top_ns because every partition cuts on the same total order.
    """
    import pandas as pd
    import polars as pl
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..config import grouped_parts

    P = grouped_parts()

    def _str_part(col) -> np.ndarray:
        """Deterministic hash partition of a string column (polars
        xxhash kernel — same function on both join sides)."""
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        h = pl.from_arrow(arr).hash(seed=0x51A3D7)
        return (h.to_numpy() % np.uint64(P)).astype(np.int64)

    def uni_partial(batch: pa.Table) -> pa.Table:
        _, _, toks = flat_tokens(batch["text"])
        enc = toks.dictionary_encode()
        c = np.bincount(
            enc.indices.to_numpy(), minlength=len(enc.dictionary)
        ).astype(np.int64)
        return pa.table({"term": enc.dictionary, "partial": pa.array(c, type=pa.int64())})

    def bg_partial(batch: pa.Table) -> pa.Table:
        _, doc_of, toks = flat_tokens(batch["text"])
        enc = toks.dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        if len(codes) < 2:
            return pa.table(
                {
                    "x": pa.array([], type=pa.string()),
                    "y": pa.array([], type=pa.string()),
                    "partial": pa.array([], type=pa.int64()),
                }
            )
        same = doc_of[1:] == doc_of[:-1]
        a = codes[:-1][same]
        b = codes[1:][same]
        nvocab = len(enc.dictionary)
        pair, cnt = np.unique(a * nvocab + b, return_counts=True)
        return pa.table(
            {
                "x": enc.dictionary.take(pa.array(pair // nvocab, type=pa.int64())),
                "y": enc.dictionary.take(pa.array(pair % nvocab, type=pa.int64())),
                "partial": pa.array(cnt, type=pa.int64()),
            }
        )

    docs = _documents(sf_dir, ["text"])
    # the aggregated count tables are vocab-/vocab²-bounded (never
    # corpus-sized); materialize them so the two consumers below (a
    # scalar total + a distributed filter) share one shuffle each
    uni = (
        docs.map_batches(uni_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("partial", alias_name="c"))
        .materialize()
    )
    bg = (
        docs.map_batches(bg_partial, batch_format="pyarrow")
        .groupby(["x", "y"])
        .aggregate(Sum("partial", alias_name="c_xy"))
        .materialize()
    )
    # corpus totals: tiny scalar aggregates
    nu = float(uni.sum("c"))
    nb = float(bg.sum("c_xy"))
    _STR = pa.string()
    _I64 = pa.int64()
    _I8 = pa.int8()

    def cand_side(t: pa.Table) -> pa.Table:
        """min_count filter in the bigram table's own blocks, tagged
        for the first join (partition on hash(x))."""
        t = t.filter(pc.greater_equal(t["c_xy"], min_count))
        n = t.num_rows
        return pa.table(
            {
                "part": pa.array(_str_part(t["x"]), type=_I64),
                "side": pa.array(np.zeros(n, dtype=np.int8), type=_I8),
                "x": t["x"],
                "y": t["y"],
                "c_xy": t["c_xy"].cast(_I64),
                "c_x": pa.nulls(n, type=_I64),
                "term": pa.nulls(n, type=_STR),
                "c": pa.nulls(n, type=_I64),
            }
        )

    def uni_side(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "part": pa.array(_str_part(t["term"]), type=_I64),
                "side": pa.array(np.ones(n, dtype=np.int8), type=_I8),
                "x": pa.nulls(n, type=_STR),
                "y": pa.nulls(n, type=_STR),
                "c_xy": pa.nulls(n, type=_I64),
                "c_x": pa.nulls(n, type=_I64),
                "term": t["term"],
                "c": t["c"].cast(_I64),
            }
        )

    def _lookup(terms: np.ndarray, counts: np.ndarray, keys: np.ndarray) -> np.ndarray:
        """counts of each key among (sorted-by-us) terms; raises on a
        miss — every bigram term IS a unigram by construction, so a
        miss means a broken co-partition, never a soft fallback."""
        o = np.argsort(terms)
        ts, cs = terms[o], counts[o]
        pos = np.searchsorted(ts, keys)
        ok = (pos < len(ts)) & (ts[np.minimum(pos, len(ts) - 1)] == keys)
        if not bool(ok.all()):
            raise RuntimeError("bigram_pmi: candidate term missing from unigram partition")
        return cs[pos]

    def attach_x(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy()
        is_u = side == 1
        terms = np.asarray(group["term"].to_pylist(), dtype=object)[is_u]
        ucnt = group["c"].to_numpy(zero_copy_only=False)[is_u].astype(np.int64)
        gc = group.filter(pa.array(~is_u))
        gu = group.filter(pa.array(is_u))
        n = gc.num_rows
        if n:
            xs = np.asarray(gc["x"].to_pylist(), dtype=object)
            c_x = _lookup(terms, ucnt, xs)
            cand_out = pa.table(
                {
                    "part": pa.array(_str_part(gc["y"]), type=_I64),
                    "side": gc["side"],
                    "x": gc["x"],
                    "y": gc["y"],
                    "c_xy": gc["c_xy"],
                    "c_x": pa.array(c_x, type=_I64),
                    "term": gc["term"],
                    "c": gc["c"],
                }
            )
        else:
            cand_out = None
        # unigram rows forward unchanged: their second-join partition
        # is hash(term) — identical to their current part value
        uni_out = gu
        tbls = [t for t in (cand_out, uni_out) if t is not None and t.num_rows]
        if not tbls:
            return cand_side(pa.table({"x": pa.array([], _STR), "y": pa.array([], _STR),
                                       "c_xy": pa.array([], _I64)}))
        return pa.concat_tables(tbls, promote_options="default")

    def finalize(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy()
        is_u = side == 1
        terms = np.asarray(group["term"].to_pylist(), dtype=object)[is_u]
        ucnt = group["c"].to_numpy(zero_copy_only=False)[is_u].astype(np.int64)
        gc = group.filter(pa.array(~is_u))
        empty = pa.table(
            {"bigram": pa.array([], _STR), "c_xy": pa.array([], _I64),
             "pmi": pa.array([], pa.float64())}
        )
        if not gc.num_rows:
            return empty
        ys = np.asarray(gc["y"].to_pylist(), dtype=object)
        c_y = _lookup(terms, ucnt, ys).astype(np.float64)
        c_x = gc["c_x"].to_numpy(zero_copy_only=False).astype(np.float64)
        c_xy = gc["c_xy"].to_numpy(zero_copy_only=False).astype(np.float64)
        xs = np.asarray(gc["x"].to_pylist(), dtype=object)
        pmi = round6(np.log(((c_xy * nu) * nu) / ((float(nb) * c_x) * c_y)))
        big = np.array([f"{x} {y}" for x, y in zip(xs, ys)], dtype=object)
        # LOCAL top_n on the exact global key: (−pmi asc ≡ pmi desc,
        # bigram asc) — one vectorized lexsort, no per-row Python
        order = np.lexsort((big.astype(str), -pmi))[:top_n]
        return pa.table(
            {
                "bigram": pa.array(big[order].tolist(), type=_STR),
                "c_xy": pa.array(c_xy[order].astype(np.int64), type=_I64),
                "pmi": pa.array(pmi[order], type=pa.float64()),
            }
        )

    ranked = (
        bg.map_batches(cand_side, batch_format="pyarrow")
        .union(uni.map_batches(uni_side, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(attach_x, batch_format="pyarrow")
        .groupby("part")
        .map_groups(finalize, batch_format="pyarrow")
    )
    # ≤ P·top_n rows reach the driver; merge = one more cut on the
    # same key
    out = ranked.to_pandas()
    if not len(out):
        return pd.DataFrame(
            {"rank": pd.Series([], dtype="int64"), "bigram": pd.Series([], dtype=object),
             "c_xy": pd.Series([], dtype="int64"), "pmi": pd.Series([], dtype="float64")}
        )
    out = out.sort_values(["pmi", "bigram"], ascending=[False, True], kind="stable")
    out = out.head(top_n).reset_index(drop=True)
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return out


# corpus_filter rule thresholds (shared verbatim with the SQL oracle):
# rules apply IN ORDER; reject_reason = first failing rule, '' = keep
FILTER_MIN_TOKENS = 20
FILTER_MAX_TOKENS = 1200
FILTER_MIN_STOP_RATIO = 0.01
FILTER_MAX_TOP_BIGRAM_RATIO = 0.12


def corpus_filter(sf_dir: str):
    """Composed C4/Gopher-style cleaning pipeline: every doc gets a
    verdict — (doc_id, keep, reject_reason) with reason = the FIRST
    failing rule of [min_tokens, max_tokens, stop_ratio,
    top_bigram_ratio] (thresholds above, shared with the oracle).

    One fused ``map_batches`` computes all features per block
    (token counts + stop ratio via ``batch_token_counts``, bigram
    repetition via the :func:`repetition_batch` grouping) — the
    single-pass multi-rule filter shape a 100 TB cleaning run wants
    (nothing shuffles; verdicts stream out one row per doc).
    """

    def verdict(batch: pa.Table) -> pa.Table:
        nrows = batch.num_rows
        doc_idx, terms, tfs, doclens = batch_token_counts(batch["text"])
        stop_mask = np.isin(terms, np.asarray(STOPWORDS, dtype=object))
        stops = np.zeros(nrows, dtype=np.int64)
        np.add.at(stops, doc_idx[stop_mask], tfs[stop_mask])
        safe = np.maximum(doclens, 1).astype(np.float64)
        stop_ratio = round6(stops / safe)
        rep = repetition_batch(batch)
        top_bigram = rep["top_bigram_ratio"].to_numpy()
        reason = np.full(nrows, "", dtype=object)
        # apply rules in REVERSE so earlier rules overwrite later ones
        reason[top_bigram > FILTER_MAX_TOP_BIGRAM_RATIO] = "top_bigram_ratio"
        reason[stop_ratio < FILTER_MIN_STOP_RATIO] = "stop_ratio"
        reason[doclens > FILTER_MAX_TOKENS] = "max_tokens"
        reason[doclens < FILTER_MIN_TOKENS] = "min_tokens"
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "keep": pa.array(reason == "", type=pa.bool_()),
                "reject_reason": pa.array(reason.tolist(), type=pa.string()),
            }
        )

    return _documents(sf_dir, ["doc_id", "text"]).map_batches(verdict, batch_format="pyarrow")
