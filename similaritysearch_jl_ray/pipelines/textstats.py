"""Text-analysis pipelines for training-data curation (task brief:
language-ID, quality scoring, token counting, fingerprinting).

All per-doc transforms are stateless ``map_batches`` over Arrow
batches; the only shuffles are the final small aggregations.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import stable_u64
from ..functions.text import batch_token_counts, tokenize
from ..functions.rounding import round6

__all__ = ["lang_dist", "token_totals_by_lang", "quality_scores", "lang_id", "doc_fingerprint"]

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
    """Winnowing document fingerprint (rolling min-hash over token
    4-gram hashes): (doc_id, fingerprint). Deterministic across runs
    and partitionings (hashing.stable_u64)."""

    def fp(batch: pa.Table) -> pa.Table:
        vals = []
        for text in batch["text"].to_pylist():
            toks = tokenize(text)
            if not toks:
                vals.append(0)
                continue
            grams = [" ".join(toks[i : i + window]) for i in range(max(1, len(toks) - window + 1))]
            hs = np.fromiter((stable_u64(g) for g in grams), dtype=np.uint64, count=len(grams))
            # winnow: min per sliding window of `window` hashes, xor-combined
            if len(hs) >= window:
                mins = np.array(
                    [hs[i : i + window].min() for i in range(len(hs) - window + 1)], dtype=np.uint64
                )
            else:
                mins = hs
            acc = np.uint64(0)
            for m in np.unique(mins):
                acc ^= m
            vals.append(int(acc.astype(np.int64)))
        return pa.table({"doc_id": batch["doc_id"], "fingerprint": pa.array(vals, type=pa.int64())})

    return _documents(sf_dir, ["doc_id", "text"]).map_batches(fp, batch_format="pyarrow")
