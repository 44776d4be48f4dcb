"""Query serving: exhaustive-posting and block-max pruned BM25 top-k.

The flagship path (SURVEY.md §3.1): a ``Bm25Scorer`` callable class in
``queries.map_batches(..., concurrency=N)`` — the Ray analog of the
reference's ``searchbatch!`` thread loop
(``/root/reference/src/SimilaritySearch.jl:163-190``), with

* the actor holding the pinned index (the reference's shared
  read-only index across threads),
* a per-query reusable :class:`TopK` queue with ``KnnResult``
  semantics (``src/pqueue/knnheap.jl``),
* ``theta()`` (= ``covradius``, ``src/pqueue/pqueue.jl:35``) driving
  block-max pruning exactly as ``covradius`` drives beam pruning in
  ``src/searchgraph/beamsearch.jl:52``.

Two modes, proven rank-identical by tests:

* ``exhaustive`` — decode every posting of every query term, vectorized
  accumulate, closed-form top-k (the ``ExhaustiveSearch`` analog,
  ``src/sequential-exhaustive.jl:57-69``).
* ``wand`` — impact-ordered pruning (the Anh–Moffat impact-ordered /
  MaxScore family, published top-k early-termination): each term's
  partial scores ("impacts") are kept sorted descending; candidates
  are the union of every term's top-P impact prefix, exact-rescored
  against the doc-ordered arrays. θ (= ``covradius``/``theta`` of the
  k-th candidate) is compared to U = Σ_t (first unscanned impact of
  t): any doc outside every prefix scores ≤ U, so ``θ > U`` (strict —
  a tie could still lose on doc_id the other way) proves the top-k is
  final. P doubles until that holds; a work budget falls back to the
  exhaustive path on dense corpora where pruning cannot win, bounding
  the overhead.

Cost counters mirror the reference (``costdist``/``costblk``,
``src/pqueue/knnsorted.jl:10-13``): ``postings_scored`` and
``blocks_decoded`` columns are emitted per query.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_BM25, Bm25Params
from ..functions.arrays import in_sorted
from ..functions.bm25 import tf_norm
from ..functions.text import tokenize
from ..functions.topk import TopK, topk_indices
from ..state.reader import IndexReader

__all__ = ["Bm25Scorer", "search", "brute_force_topk"]

RESULT_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("rank", pa.int32()),
        ("doc_id", pa.int64()),
        ("score", pa.float64()),
        ("postings_scored", pa.int64()),
        ("blocks_decoded", pa.int64()),
        ("latency_us", pa.int64()),
        ("actor_seq", pa.int64()),  # per-actor query ordinal (warm-up id)
    ]
)


# polars hash-membership beats numpy's per-element binary search once
# both sides are large enough to amortize the hash-table build (the
# compiled merge crosses over around a few tens of thousands of rows;
# measured 10.1 → 6.8 ms at 300k×300k on the dense phrase fixture,
# BASELINE §F.3). Below the gate the searchsorted chain is cheaper.
_MEMBER_HASH_MIN = 1 << 16


def _member_mask(keys_sorted: np.ndarray, probe: np.ndarray) -> np.ndarray:
    """Boolean mask: which ``probe`` values occur in sorted unique
    ``keys_sorted``. Exact set membership, order-preserving — the
    polars path is an elementwise hash probe, so it is equivalent to
    the searchsorted chain by construction."""
    if len(probe) >= _MEMBER_HASH_MIN and len(keys_sorted) >= _MEMBER_HASH_MIN:
        try:
            import polars as pl

            return (
                pl.Series(probe)
                .is_in(pl.Series(keys_sorted).implode())
                .to_numpy()
            )
        except Exception:
            pass  # polars missing/unexpected dtype → numpy fallback
    lo = np.searchsorted(keys_sorted, probe)
    loc = np.minimum(lo, len(keys_sorted) - 1)
    return (lo < len(keys_sorted)) & (keys_sorted[loc] == probe)


def _accumulate(ids_list, partial_list):
    """Sum per-doc partials; deterministic order (term-major input).

    Dense doc-id spaces take the O(n) bincount path; both paths add a
    doc's partials in array order (term-major), so the resulting floats
    are bit-identical — rank-identity is preserved across paths.
    """
    ids = np.concatenate(ids_list)
    partials = np.concatenate(partial_list)
    if len(ids) == 0:
        return ids, partials
    lo = ids.min()
    span = int(ids.max() - lo) + 1
    if span <= 4 * len(ids):
        acc = np.bincount(ids - lo, weights=partials, minlength=span)
        nz = np.flatnonzero(acc)
        return nz + lo, acc[nz]
    uniq, inv = np.unique(ids, return_inverse=True)
    scores = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(scores, inv, partials)
    return uniq, scores


def _deleted_sig(arr) -> tuple | None:
    """Compact content signature of a tombstone set (None = no
    tombstones) — lets a scorer recognize that a pack's arrays were
    masked against exactly its own visibility set."""
    if arr is None or len(arr) == 0:
        return None
    import zlib as _zlib

    return (int(len(arr)), int(_zlib.crc32(np.ascontiguousarray(arr).tobytes())))


def build_serving_pack(
    index_dir: str,
    params: Bm25Params | None = None,
    parts: list[int] | None = None,
    doc_range: tuple[int, int] | None = None,
    apply_tombstones: bool = True,
) -> dict:
    """Pre-decode the index into flat numpy arrays for broadcast.

    ``{"stats": ..., "terms": {term: (doc_ids, partial_scores)},
    "blocks": {term: (block_first, block_last, idf·block_max)}}``.

    Broadcast once via ``ray.put``: every scorer actor on a node then
    maps the arrays zero-copy out of the shared object store instead of
    decoding its own copy — actor-pool warm-up cost stops scaling with
    pool size. ``parts`` / ``doc_range`` build a *pinned* pack holding
    only that slice of the index (the per-part pack a task builds for
    the actors serving that part at 100 TB); arrays of boundary runs
    may spill past ``doc_range`` — the scorer slices at query time.
    """
    rdr = IndexReader(index_dir, parts=parts, doc_range=doc_range)
    st = rdr.stats
    p = params or Bm25Params(k1=st["k1"], b=st["b"])
    # tombstone-aware pack: apply the visibility mask ONCE at pack
    # build (df/idf stay global — partials are computed first, Lucene
    # live-docs semantics), so pack-served actors keep the imp/dense
    # fast paths on deleted-heavy indexes instead of re-deriving
    # per-term masked arrays per actor. The pack records the masked
    # set's signature; a scorer whose own tombstone snapshot matches
    # skips its per-term re-filtering entirely.
    deleted = None
    if apply_tombstones:
        from .lifecycle import deleted_ids

        deleted = deleted_ids(index_dir, doc_range)
    terms, blocks, imp, dense = {}, {}, {}, {}
    span = int(st["max_doc"]) + 1 if doc_range is None else int(doc_range[1] - doc_range[0])
    base = 0 if doc_range is None else int(doc_range[0])
    for term in rdr.terms:
        ids, tfs, dls = rdr.postings(term)
        partial = rdr.idf(term) * tf_norm(tfs, dls, rdr.avgdl, p)
        if deleted is not None and len(ids):
            _, drop = in_sorted(deleted, ids)
            if drop.any():
                ids, partial = ids[~drop], partial[~drop]
        terms[term] = (ids, partial)
        # head terms only ship the derived sections: the impact-ordered
        # copy (impact desc, doc_id asc) and the dense rescore array.
        # Tail terms derive impact order in-actor on first touch
        # (Bm25Scorer._impact_cache — short lists, trivial lexsort), so
        # the pack stops carrying 2-3 copies of every tail posting list
        if span > 0 and len(ids) >= max(64, span // 20) and doc_range is None:
            o = np.lexsort((ids, -partial))
            imp[term] = (ids[o], partial[o])
            # f32 on purpose: halves the rescore's gather traffic (the
            # measured bound of multi-M-doc serving) and the pack's
            # dense footprint; exactness is restored by the margin +
            # f64 refine in Bm25Scorer._refine, so served scores stay
            # bit-identical to the f64 exhaustive path
            arr = np.zeros(span, dtype=np.float32)
            arr[ids - base] = partial
            dense[term] = (arr, float(partial.max()) if len(partial) else 0.0)
        w = rdr.idf(term)
        runs = rdr.runs(term)
        blocks[term] = (
            np.concatenate([r.block_first for r in runs]),
            np.concatenate([r.block_last for r in runs]),
            np.concatenate(
                [w * tf_norm(r.block_max_tf, r.block_min_dl, rdr.avgdl, p) for r in runs]
            ),
        )
    return {
        "stats": st,
        "terms": terms,
        "blocks": blocks,
        "imp": imp,
        "dense": dense,
        "deleted_sig": _deleted_sig(deleted),
    }


def _stratify_gram_csr(offsets, terms_u, lens):
    """Reorder each gram's posting slice by (term length, term idx) and
    return ``(terms_u, post_lens)`` — the length stratification that
    lets the fuzzy candidate scan cut every slice to the
    ``|len − len(tok)| ≤ e`` band with two searchsorteds BEFORE the
    scatter (ROADMAP round-4: the scatter was count-bound on terms the
    final length prune discarded anyway)."""
    if not len(terms_u):
        return terms_u, np.empty(0, np.int64)
    counts = np.diff(offsets)
    gid = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    pl = lens[terms_u]
    order = np.lexsort((terms_u, pl, gid))
    return terms_u[order], pl[order]


def build_gram_csr(d: np.ndarray, lens: np.ndarray):
    """Character-trigram → dictionary-index postings as ONE sorted CSR
    structure ``(kind, gram_keys, offsets, term_idx, post_lens)`` over
    the sorted dictionary ``d`` — the sublinear fuzzy-candidate
    generator (a term within ``e`` edits of a token shares ≥
    ``|G(tok)| − 3e`` of its distinct trigrams). Each gram's slice is
    LENGTH-STRATIFIED: ordered by (term length, term idx) with the
    parallel ``post_lens`` array, so consumers band-cut slices to
    ``|len − len(tok)| ≤ e`` before touching them. ASCII vocabularies
    build fully vectorized (all windows of the flat byte array pack
    into u32 keys; (gram, term) pairs dedupe via one ``np.unique``);
    non-ASCII keeps a Python build behind the same CSR interface
    (object keys)."""
    from ..state.segment import _ranges

    n = len(d)
    try:
        flat = np.frombuffer(
            "".join(map(str, d)).encode("ascii"), dtype=np.uint8
        ).astype(np.uint32)
        nwin = np.maximum(lens - 2, 0)
        tot = int(nwin.sum())
        if tot == 0:
            return ("ascii", np.empty(0, np.uint32), np.zeros(1, np.int64),
                    np.empty(0, np.int64), np.empty(0, np.int64))
        offs = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=offs[1:])
        w0 = np.repeat(offs, nwin) + _ranges(nwin)
        keys = (flat[w0] << np.uint32(16)) | (flat[w0 + 1] << np.uint32(8)) | flat[w0 + 2]
        term_of = np.repeat(np.arange(n, dtype=np.uint64), nwin)
        if n < (1 << 32) and int(lens.max(initial=0)) < (1 << 8):
            # fused stratification: 24-bit gram | 8-bit len | 32-bit idx
            # — ONE np.unique yields deduped pairs already in
            # (gram, len, idx) order; no second sort
            len_of = np.repeat(lens.astype(np.uint64), nwin)
            pairs = np.unique(
                (keys.astype(np.uint64) << np.uint64(40))
                | (len_of << np.uint64(32))
                | term_of
            )
            gk = (pairs >> np.uint64(40)).astype(np.uint32)
            terms_u = (pairs & np.uint64(0xFFFFFFFF)).astype(np.int64)
            pl = ((pairs >> np.uint64(32)) & np.uint64(0xFF)).astype(np.int64)
            b = np.flatnonzero(np.r_[True, gk[1:] != gk[:-1], True])
            return ("ascii", gk[b[:-1]], b, terms_u, pl)
        pairs = np.unique((keys.astype(np.uint64) << np.uint64(32)) | term_of)
        gk = (pairs >> np.uint64(32)).astype(np.uint32)
        terms_u = (pairs & np.uint64(0xFFFFFFFF)).astype(np.int64)
        b = np.flatnonzero(np.r_[True, gk[1:] != gk[:-1], True])
        terms_u, pl = _stratify_gram_csr(b, terms_u, lens)
        return ("ascii", gk[b[:-1]], b, terms_u, pl)
    except UnicodeEncodeError:
        grams: dict[str, list[int]] = {}
        for i, t in enumerate(d):
            t = str(t)
            for g in {t[j : j + 3] for j in range(len(t) - 2)}:
                grams.setdefault(g, []).append(i)
        gk = np.sort(np.asarray(list(grams), dtype=object))
        offsets = np.zeros(len(gk) + 1, dtype=np.int64)
        parts = []
        for j, g in enumerate(gk):
            parts.append(np.asarray(grams[str(g)], dtype=np.int64))
            offsets[j + 1] = offsets[j] + len(parts[-1])
        terms_u = np.concatenate(parts) if parts else np.empty(0, np.int64)
        terms_u, pl = _stratify_gram_csr(offsets, terms_u, lens)
        return ("obj", gk, offsets, terms_u, pl)


def build_dict_bytes(d: np.ndarray, lens: np.ndarray):
    """Flat ASCII byte cache ``(flat, offs)`` of the sorted dictionary
    (None for non-ASCII) — lets the fuzzy verify gather candidate byte
    rows by dictionary index instead of joining strings per query."""
    try:
        flat = np.frombuffer("".join(map(str, d)).encode("ascii"), dtype=np.uint8)
    except UnicodeEncodeError:
        return None
    offs = np.zeros(len(d), dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    return (flat, offs)


def build_expand_pack(terms) -> dict:
    """The broadcastable expansion side-pack: sorted-dictionary lens +
    gram CSR + flat byte cache, derived ONLY from the term set — built
    once per index state in a Ray task (see ``_pack_ref``) so a wide
    actor pool maps these arrays zero-copy out of the object store
    instead of each actor spending the O(vocab) build (~2.7 s at 1M
    terms) during warm-up. Valid for any scorer whose dictionary is
    exactly this term set (checked by length in ``_expand_pack``)."""
    d = np.sort(np.asarray(list(terms), dtype=object))
    lens = np.fromiter((len(t) for t in d), dtype=np.int64, count=len(d))
    return {
        "n_terms": len(d),
        # endpoint terms let consumers reject a same-length but
        # different-content dictionary (ADVICE r4: length alone would
        # silently serve a misaligned gram index)
        "first_term": str(d[0]) if len(d) else "",
        "last_term": str(d[-1]) if len(d) else "",
        "lens": lens,
        "gram": build_gram_csr(d, lens),
        "dict_bytes": build_dict_bytes(d, lens),
    }


_PACK_CACHE: dict[tuple, object] = {}


def _index_fingerprint(index_dir: str) -> tuple:
    """Content fingerprint of an on-disk index: stats.json identity plus
    the delta-segment listing. rebuild() rewrites stats.json and
    append_pages() adds a delta dir, so either changes the fingerprint
    and invalidates any cached serving pack for the old state."""
    import os

    st = os.stat(os.path.join(index_dir, "stats.json"))
    deltas = tuple(sorted(n for n in os.listdir(index_dir) if n.startswith("delta=")))
    # tombstones participate: packs are masked against them, so
    # delete_docs/purge must invalidate any cached pack
    tomb_dir = os.path.join(index_dir, "tombstones")
    tombs: tuple = ()
    if os.path.isdir(tomb_dir):
        tombs = tuple(
            sorted(
                (n, os.stat(os.path.join(tomb_dir, n)).st_mtime_ns)
                for n in os.listdir(tomb_dir)
                if n.endswith(".parquet")
            )
        )
    return (int(st.st_mtime_ns), int(st.st_size), deltas, tombs)


def _pack_ref(index_dir: str):
    """Parallel per-part serving packs, broadcast once per driver
    process per index *state* (cache keyed by content fingerprint).

    One Ray TASK per term-hash part builds that part's pack — a term
    lives in exactly one part, so part-local df IS global df, and
    stats.json supplies the global N/avgdl; the driver never decodes
    a posting. The broadcast object is a tiny dict of per-part
    ObjectRefs; actors ray.get them zero-copy and merge the term
    dicts (the per-part pack build the 100 TB layout wants — at
    cluster scale each pack task runs next to its part's files)."""
    import json as _json
    import os as _os

    import ray

    key = (index_dir, _index_fingerprint(index_dir))
    ref = _PACK_CACHE.get(key)
    if ref is None:
        # drop refs for stale states of this index_dir so the object
        # store can reclaim the old pack
        for k in [k for k in _PACK_CACHE if k[0] == index_dir]:
            del _PACK_CACHE[k]
        with open(_os.path.join(index_dir, "stats.json")) as f:
            num_parts = _json.load(f)["num_parts"]

        @ray.remote
        def _part_pack(d: str, p: int) -> dict:
            return build_serving_pack(d, parts=[p])

        @ray.remote
        def _expand_task(refs: list) -> dict:
            # one task derives the expansion side-pack (gram CSR + byte
            # cache) for the whole pool; part packs are read zero-copy
            parts = ray.get(refs)
            return build_expand_pack(
                [t for p in parts for t in p["terms"].keys()]
            )

        part_refs = [_part_pack.remote(index_dir, p) for p in range(num_parts)]
        ref = _PACK_CACHE[key] = ray.put(
            {"part_refs": part_refs, "expand_ref": _expand_task.remote(part_refs)}
        )
    return ref


def _resolve_pack(pack_ref) -> dict:
    """Actor-side pack fetch: merge per-part packs (zero-copy arrays)
    or accept a plain single pack (tests / custom callers)."""
    import ray

    outer = ray.get(pack_ref)
    if "part_refs" not in outer:
        return outer
    parts = ray.get(outer["part_refs"])
    merged = {
        "stats": parts[0]["stats"],
        "terms": {},
        "blocks": {},
        "imp": {},
        "dense": {},
        # every part pack is masked against the same index-wide
        # tombstone snapshot (deleted_ids(index_dir)), so any part's
        # signature speaks for the merged pack
        "deleted_sig": parts[0].get("deleted_sig"),
    }
    for p in parts:
        for section in ("terms", "blocks", "imp", "dense"):
            merged[section].update(p.get(section, {}))
    # keep the expansion side-pack as a REF: fetched lazily on the
    # first expansion query (pure-BM25 pools never block on its task)
    merged["expand_ref"] = outer.get("expand_ref")
    return merged


class _LRU:
    """Minimal insertion-order LRU (dicts preserve order) for the
    per-actor caches keyed by USER INPUT (expansion patterns, fuzzy
    tokens) or by decoded heavy state (position runs, occurrence
    keys): real traffic has unbounded key diversity, so every such
    cache needs an eviction bound (the reader's max_cached_terms
    pattern applied actor-side)."""

    __slots__ = ("cap", "_d")

    def __init__(self, cap: int):
        self.cap = cap
        self._d: dict = {}

    def __len__(self) -> int:
        return len(self._d)

    def get(self, key):
        d = self._d
        hit = d.get(key)
        if hit is not None:
            del d[key]
            d[key] = hit  # bump to most-recent
        return hit

    def put(self, key, value) -> None:
        d = self._d
        if key in d:
            del d[key]
        elif len(d) >= self.cap:
            d.pop(next(iter(d)))
        d[key] = value

    def pop(self, key, default=None):
        return self._d.pop(key, default)


# eviction bounds: expansion caches hold small term lists (count cap
# generous); positional caches hold ~8 B/occurrence arrays (cap keeps
# the worst case around a few hundred MB on web-scale terms)
_EXPANSION_CACHE_CAP = 4096
_POSITIONAL_CACHE_CAP = 512


def _regex_literal_prefix(pat: str) -> str:
    """Mandatory literal prefix of a regex — characters every match
    MUST start with, used to narrow the dictionary scan to a binary-
    search range. Walks until the first metacharacter; when the stop
    is a quantifier that makes its target optional/repeatable
    (``*``/``?``/``{``), the last accumulated char is dropped (``ab*``
    only guarantees ``a``); ``+`` keeps it (``ab+`` guarantees
    ``ab``). Conservative: any doubt → shorter prefix."""
    out: list[str] = []
    for i, c in enumerate(pat):
        if c in ".[]{}()|^$\\*+?":
            if c in "*?{" and out:
                out.pop()
            break
        nxt = pat[i + 1] if i + 1 < len(pat) else ""
        if nxt and nxt in "*?{":
            break  # this char is quantified-optional; stop before it
        out.append(c)
    return "".join(out)


class Bm25Scorer:
    """Stateful map_batches scorer. State loads once per actor — from a
    broadcast pack (zero-copy plasma arrays) when ``pack_ref`` is given,
    else decoded locally from ``index_dir``."""

    def __init__(
        self,
        index_dir: str | None = None,
        k: int = 10,
        mode: str = "wand",
        params: Bm25Params | None = None,
        prefix0: int = 1024,
        pack_ref=None,
        parts: list[int] | None = None,
        doc_range: tuple[int, int] | None = None,
        lang: str | None = None,
        cache_size: int = 0,
        msm: int = 2,
    ):
        # opt-in per-actor results LRU (text → result). Real query
        # traffic is heavily repeated; OFF by default so benchmarks
        # measure scoring, not caching.
        self._result_cache: dict[str, tuple] | None = (
            {} if cache_size > 0 else None
        )
        self._result_cache_size = cache_size
        self.index_dir = index_dir
        self.doc_range = doc_range
        # field filter: restrict scoring to docs whose docmap lang
        # matches — the allowed-id set comes from a PUSHDOWN read of
        # the index's docmap (only doc_id of matching rows is read)
        self._allowed = None
        if lang is not None:
            import os as _os

            import pyarrow.dataset as pads

            t = pads.dataset(
                _os.path.join(index_dir, "docmap"), format="parquet"
            ).to_table(columns=["doc_id"], filter=pads.field("lang") == lang)
            self._allowed = np.sort(t["doc_id"].to_numpy().astype(np.int64))
        # tombstone visibility mask (lifecycle.delete_docs): deleted
        # docs never surface; build-time df/idf/avgdl are kept until a
        # purge — Lucene live-docs semantics. Pushdown read: a
        # doc-range-pinned actor loads only its range's tombstones.
        self._deleted = None
        if index_dir is not None:
            from .lifecycle import deleted_ids

            self._deleted = deleted_ids(index_dir, doc_range)
        if pack_ref is not None:
            self.pack = _resolve_pack(pack_ref)
            st = self.pack["stats"]
            self.reader = None
            # pack arrays already masked against exactly this actor's
            # tombstone snapshot → drop the per-term re-filter and keep
            # the imp/dense fast paths (positional modes raise on the
            # pack path, so no reader-side decode can bypass the mask)
            if self._deleted is not None and self.pack.get("deleted_sig") == _deleted_sig(
                self._deleted
            ):
                self._deleted = None
        else:
            # pinned construction: the actor loads ONLY its parts /
            # doc-range-overlapping runs (reader pushes the range
            # filter into the parquet scan) — no whole-index state
            # anywhere on this path
            self.reader = IndexReader(index_dir, parts=parts, doc_range=doc_range)
            st = self.reader.stats
            self.pack = None
        self.stats = st
        self.k = k
        self.mode = mode
        self.msm = msm  # minimum-should-match threshold (mode="msm")
        self.params = params or Bm25Params(k1=st["k1"], b=st["b"])
        self.prefix0 = prefix0  # initial impact-prefix depth (see _score_wand)
        self.heap = TopK(k)  # reused across queries (reference `reuse!`)
        self._scores_cache: dict[str, tuple] = {}
        self._impact_cache: dict[str, tuple] = {}
        self._dense_cache: dict[str, object] = {}
        self._pos_cache = _LRU(_POSITIONAL_CACHE_CAP)
        # occurrence-key cache for the positional fast path: per term
        # (doc_ids, occ_offsets, sorted uint64 keys doc<<32|pos) — see
        # _term_occ (LRU: heavy arrays, unbounded vocab)
        self._occ_cache = _LRU(_POSITIONAL_CACHE_CAP)
        # doc-id span this scorer serves (bounds dense rescore arrays;
        # in sharded mode the shard width bounds it, the 100 TB story)
        self._span = doc_range if doc_range is not None else (0, st["max_doc"] + 1)
        # actor-resident accumulator scratch: the exhaustive path adds
        # each term's partials in place and resets only touched slots —
        # NO multi-MB allocation per query. (Measured on this class of
        # host: a fresh ≥6 MB numpy allocation can stall 300-800 ms on
        # first-touch page faults under memory pressure; per-query
        # transient buffers turned the first fallback query of every
        # actor into a ~1-3 s outlier.)
        self._acc: np.ndarray | None = None
        # more actor-resident scratch (same allocation-stall rationale):
        # _mark dedupes candidate unions without a sort, _buf (f32)
        # receives per-term dense gathers in _rescore_approx
        self._mark: np.ndarray | None = None
        self._buf: np.ndarray | None = None
        # _and_docs counting scratch (u8 counts + bool eq buffer over
        # the doc span) — round-5: the chained searchsorted AND was the
        # dominant dense-phrase cost (16 of 30 ms at the bench config).
        # _and_eq_for = the exact result array the eq buffer currently
        # describes (identity-checked in _occ_keys_for)
        self._and_scratch: np.ndarray | None = None
        self._and_eq: np.ndarray | None = None
        self._and_eq_for: np.ndarray | None = None
        # reusable u64 doc-half scratch for _occ_keys_for's key-level
        # mask (sized to the largest occurrence array served so far)
        self._keybuf: np.ndarray | None = None
        self._pmax_cache: dict[str, float] = {}
        self._n_served = 0

    def _has_term(self, term: str) -> bool:
        if self.pack is not None:
            return term in self.pack["terms"]
        return term in self.reader

    # -- one query ----------------------------------------------------------
    def _query_terms(self, text: str) -> list[str]:
        return sorted({t for t in tokenize(text) if self._has_term(t)})

    def score_query(self, text: str) -> tuple[list[tuple[int, float]], int, int]:
        """Returns (result, postings_scored, blocks_decoded)."""
        cache = self._result_cache
        if cache is not None:
            hit = cache.get(text)
            if hit is not None:
                # LRU bump: dicts preserve insertion order
                del cache[text]
                cache[text] = hit
                return hit
        out = self._score_query_uncached(text)
        if cache is not None:
            if len(cache) >= self._result_cache_size:
                cache.pop(next(iter(cache)))
            cache[text] = out
        return out

    # -- multi-term expansion (prefix / fuzzy — Lucene MultiTermQuery) ------
    def _dictionary(self) -> np.ndarray:
        """Sorted term dictionary of this actor's slice (cached) — the
        expansion universe for prefix/fuzzy rewrite. Pack path: sorted
        key array built once per actor; reader path: union of the
        per-(segment, part) sorted df projections (no posting decode)."""
        d = getattr(self, "_dict_cache", None)
        if d is None:
            if self.pack is not None:
                d = np.sort(np.asarray(list(self.pack["terms"].keys()), dtype=object))
            else:
                parts = [uniq for uniq, _ in self.reader._dfs]
                d = (
                    np.unique(np.concatenate(parts))
                    if parts
                    else np.empty(0, dtype=object)
                )
            self._dict_cache = d
        return d

    def _expand_prefix(self, stem: str) -> list[str]:
        """Dictionary terms starting with ``stem`` — binary search on
        the sorted dictionary (the classic term-dictionary range scan;
        no vocabulary iteration)."""
        d = self._dictionary()
        lo = np.searchsorted(d, stem, side="left")
        hi = np.searchsorted(d, stem + "￿", side="left")
        return [str(t) for t in d[lo:hi]]

    def _expand_pack(self) -> dict | None:
        """The broadcast expansion side-pack (``build_expand_pack``)
        when this actor serves from a pack whose term set matches its
        dictionary — fetched lazily (first expansion query) and mapped
        zero-copy from the object store; None on reader-pinned paths
        (those derive locally as before). The pack dictionary IS
        ``sorted(pack['terms'])`` by construction, so a length match
        proves the arrays align with :meth:`_dictionary`."""
        d = self._dictionary()
        cached = getattr(self, "_expand_pack_cache", None)
        if cached is not None and cached[0] is d:
            return cached[1]
        hit = None
        pack = getattr(self, "pack", None)
        ref = pack.get("expand_ref") if pack is not None else None
        if ref is not None:
            import ray

            exp = ray.get(ref)
            # valid only while the actor's dictionary is the pack's
            # term set (tests swap _dict_cache to synthetic vocabs).
            # Length + endpoint terms: a same-length dictionary swap
            # must not silently serve a misaligned gram index, so the
            # first/last sorted terms are compared too (cheap, and a
            # different term set of the same size almost always moves
            # an endpoint of the sorted dictionary).
            if (
                exp["n_terms"] == len(d)
                and len(d) == len(pack["terms"])
                and (
                    len(d) == 0
                    or (
                        str(d[0]) == exp.get("first_term", str(d[0]))
                        and str(d[-1]) == exp.get("last_term", str(d[-1]))
                    )
                )
            ):
                hit = exp
        self._expand_pack_cache = (d, hit)
        return hit

    def _dict_lens(self) -> np.ndarray:
        lens = getattr(self, "_dict_lens_cache", None)
        if lens is None:
            exp = self._expand_pack()
            if exp is not None:
                lens = exp["lens"]
            else:
                d = self._dictionary()
                lens = np.fromiter((len(t) for t in d), dtype=np.int64, count=len(d))
            self._dict_lens_cache = lens
        return lens

    def _gram_index(self):
        """The fuzzy-candidate gram CSR (:func:`build_gram_csr`) —
        mapped zero-copy from the broadcast expansion side-pack when
        one matches this actor's dictionary (one build per index state
        instead of per actor), else derived locally (reader-pinned
        paths, synthetic-vocab tests)."""
        idx = getattr(self, "_gram_index_cache", None)
        if idx is None:
            exp = self._expand_pack()
            if exp is not None:
                idx = exp["gram"]
            else:
                idx = build_gram_csr(self._dictionary(), self._dict_lens())
            self._gram_index_cache = idx
        return idx

    def _fuzzy_candidate_idx(self, tok: str, max_edits: int) -> np.ndarray:
        """Dictionary indices that can possibly be within ``max_edits``
        of ``tok`` — trigram count-filter + length prune, a provable
        SUPERSET of the true matches (the caller verifies exactly, so
        results are identical to the full scan). Falls back to the
        length-pruned full range when the trigram bound degenerates
        (short tokens: |G(tok)| ≤ 3·e). Counting is a scatter-add into
        an actor-resident per-vocab scratch (reset only touched slots)
        — no per-query sort of the gram-posting union."""
        lens = self._dict_lens()
        tok_grams = {tok[j : j + 3] for j in range(len(tok) - 2)}
        thresh = len(tok_grams) - 3 * max_edits
        if thresh >= 1:
            kind, gk, offsets, terms_u, plens = self._gram_index()
            lo_len, hi_len = len(tok) - max_edits, len(tok) + max_edits
            posts = []
            for g in tok_grams:
                if kind == "ascii":
                    try:
                        b3 = g.encode("ascii")
                    except UnicodeEncodeError:
                        continue  # can't occur in an all-ASCII vocabulary
                    key = (b3[0] << 16) | (b3[1] << 8) | b3[2]
                else:
                    key = g
                j = int(np.searchsorted(gk, key))
                if j < len(gk) and gk[j] == key:
                    # stratified slice: cut to the |len−len(tok)| ≤ e
                    # band BEFORE the scatter — banding can only drop
                    # terms the final length prune discarded, so the
                    # candidate set is unchanged (pytest-pinned)
                    s, e = int(offsets[j]), int(offsets[j + 1])
                    s2 = s + int(np.searchsorted(plens[s:e], lo_len, side="left"))
                    e2 = s + int(np.searchsorted(plens[s:e], hi_len, side="right"))
                    posts.append((terms_u[s2:e2], plens[s2:e2]))
                else:
                    # absent gram still counts toward g
                    posts.append((terms_u[:0], plens[:0]))
            if not posts:
                return np.empty(0, np.int64)
            # CPMerge split (Okazaki & Tsujii): any term with ≥ thresh
            # shared grams must appear in at least one of the
            # (g − thresh + 1) SMALLEST lists (the thresh−1 largest
            # alone can't reach thresh) — so only the small lists are
            # merged; the stopword-sized gram lists are probed by
            # binary search over the merged candidates instead of
            # being scanned.
            posts.sort(key=lambda p: len(p[0]))
            m = len(posts) - thresh + 1
            if m <= 0:
                # more than 3e+1 grams unrepresentable in an ASCII
                # vocabulary ⟹ > e non-ASCII chars ⟹ no ASCII term
                # can be within e edits
                return np.empty(0, np.int64)
            small = [p for p, _ in posts[:m] if len(p)]
            if not small:
                return np.empty(0, np.int64)
            # merge the small lists by scatter-count into an
            # actor-resident per-vocab scratch (reset only touched
            # slots) — no sort of the union
            cnt = getattr(self, "_gram_cnt_scratch", None)
            if cnt is None or len(cnt) < len(lens):
                cnt = self._gram_cnt_scratch = np.zeros(len(lens), dtype=np.int16)
            for p in small:
                cnt[p] += np.int16(1)  # per-gram postings are unique
            cand = np.flatnonzero(cnt[: len(lens)])
            counts = cnt[cand].astype(np.int64)
            for p in small:
                cnt[p] = 0
            for big, bl in posts[m:]:
                if not len(big):
                    continue
                # a banded slice is (length, idx)-ordered: probe each
                # exact-length run separately (each run IS idx-sorted)
                for L in range(lo_len, hi_len + 1):
                    a = int(np.searchsorted(bl, L, side="left"))
                    b = int(np.searchsorted(bl, L, side="right"))
                    if b > a:
                        counts += in_sorted(big[a:b], cand)[1]
            # the band cut already applied the length prune
            return cand[counts >= thresh]
        return np.flatnonzero(np.abs(lens - len(tok)) <= max_edits)

    def _expand_fuzzy(self, tok: str, max_edits: int) -> list[str]:
        """Dictionary terms within plain Levenshtein ``max_edits`` of
        ``tok`` (exact included). Sublinear in vocabulary: trigram-
        prefiltered candidates (:meth:`_fuzzy_candidate_idx`) verified
        with the exact Levenshtein kernel; cached per (token, e) per
        actor."""
        cache = getattr(self, "_fuzzy_cache", None)
        if cache is None:
            cache = self._fuzzy_cache = _LRU(_EXPANSION_CACHE_CAP)
        hit = cache.get((tok, max_edits))
        if hit is None:
            d = self._dictionary()
            cidx = self._fuzzy_candidate_idx(tok, max_edits)
            mask = self._verify_fuzzy_idx(tok, cidx, max_edits)
            hit = [str(t) for t in d[cidx[mask]]]
            cache.put((tok, max_edits), hit)
        return hit

    def _dict_bytes(self):
        """Flat ASCII byte cache of the dictionary ``(flat, offs)`` —
        built once per actor; None for non-ASCII vocabularies. Lets
        the fuzzy verify gather candidate byte rows by dictionary
        INDEX instead of joining candidate strings per query."""
        d = self._dictionary()
        cached = getattr(self, "_dict_bytes_cache", None)
        if cached is not None and cached[0] is d:
            return cached[1]
        exp = self._expand_pack()
        if exp is not None:
            hit = exp["dict_bytes"]
        else:
            hit = build_dict_bytes(d, self._dict_lens())
        # keyed by dictionary object identity — tests (and any future
        # dictionary swap) invalidate derived caches by replacing
        # _dict_cache; this one follows automatically
        self._dict_bytes_cache = (d, hit)
        return hit

    def _verify_fuzzy_idx(self, tok: str, cand_idx: np.ndarray, max_edits: int) -> np.ndarray:
        """Exact Levenshtein ≤ max_edits over dictionary indices —
        vectorized against the flat byte cache (one gather builds the
        candidate byte matrix; per-query string joins were the verify
        bound at web vocab). Falls back to the string kernels when the
        vocabulary (or token) is non-ASCII."""
        from ..functions.distances import (
            lev_dists_padded,
            lev_within1_padded,
            levenshtein_mask,
        )

        if len(cand_idx) == 0:
            return np.zeros(0, dtype=bool)
        db = self._dict_bytes()
        try:
            q = np.frombuffer(tok.encode("ascii"), dtype=np.uint8)
        except UnicodeEncodeError:
            db = None
        if db is None:
            return levenshtein_mask(tok, self._dictionary()[cand_idx], max_edits)
        flat, offs = db
        lens_c = self._dict_lens()[cand_idx]
        nmax = int(lens_c.max())
        pos = offs[cand_idx, None] + np.arange(nmax)[None, :]
        valid = np.arange(nmax) < lens_c[:, None]
        pad = np.where(valid, flat[np.minimum(pos, len(flat) - 1)], 0)
        if max_edits == 1:
            return lev_within1_padded(q, pad, lens_c)
        return lev_dists_padded(q, pad, lens_c) <= max_edits

    def _expand_wildcard(self, pat: str) -> list[str]:
        """Dictionary terms fullmatching a ``*``/``?`` pattern (Lucene
        WildcardQuery). A literal prefix before the first wildcard
        narrows the scan to its binary-search range (the term-dict
        range walk); the remainder matches via one compiled regex over
        the candidate slice. Cached per (pattern) per actor."""
        import re

        cache = getattr(self, "_wild_cache", None)
        if cache is None:
            cache = self._wild_cache = _LRU(_EXPANSION_CACHE_CAP)
        hit = cache.get(pat)
        if hit is None:
            stem = re.split(r"[*?]", pat, maxsplit=1)[0]
            cand = (
                np.asarray(self._expand_prefix(stem), dtype=object)
                if stem
                else self._dictionary()
            )
            rx = re.compile(
                "".join(
                    ".*" if c == "*" else "." if c == "?" else re.escape(c)
                    for c in pat
                )
            )
            hit = [str(t) for t in cand if rx.fullmatch(str(t))]
            cache.put(pat, hit)
        return hit

    def _expand_regexp(self, pat: str) -> list[str]:
        """Dictionary terms fullmatching ``pat`` (Lucene RegexpQuery).

        Linear-time RE2 (pyarrow.compute.match_substring_regex) over
        the candidate slice — a user-supplied pattern can't
        catastrophically backtrack an actor the way Python ``re``
        could (ReDoS), and it matches the DuckDB oracle's
        ``regexp_full_match`` engine (also RE2). A mandatory literal
        prefix narrows the scan to its binary-search dictionary range
        first (the term-dict range walk), so anchored patterns are
        sublinear in vocabulary instead of a full scan. Cached per
        pattern per actor."""
        import pyarrow.compute as pc

        cache = getattr(self, "_regexp_cache", None)
        if cache is None:
            cache = self._regexp_cache = _LRU(_EXPANSION_CACHE_CAP)
        hit = cache.get(pat)
        if hit is None:
            if len(pat) > 1000:
                raise ValueError("regexp pattern too long (max 1000 chars)")
            stem = _regex_literal_prefix(pat)
            cand = (
                np.asarray(self._expand_prefix(stem), dtype=object)
                if stem
                else self._dictionary()
            )
            if len(cand):
                arr = pa.array([str(t) for t in cand], type=pa.string())
                m = pc.match_substring_regex(arr, f"^(?:{pat})$")
                keep = m.to_numpy(zero_copy_only=False).astype(bool)
                hit = [str(t) for t in cand[keep]]
            else:
                hit = []
            cache.put(pat, hit)
        return hit

    def _expanded_terms(self, text: str) -> list[str]:
        from .queryset import (
            FUZZY_MAX_EDITS,
            parse_prefix_query,
            parse_wildcard_query,
        )

        if self.mode == "prefix":
            lits, prefs = parse_prefix_query(text)
            out = {t for t in lits if self._has_term(t)}
            for p in prefs:
                out.update(self._expand_prefix(p))
        elif self.mode == "wildcard":
            lits, pats = parse_wildcard_query(text)
            out = {t for t in lits if self._has_term(t)}
            for p in pats:
                out.update(self._expand_wildcard(p))
        elif self.mode == "regexp":
            # the whole query text is ONE regex (Lucene RegexpQuery);
            # dictionary terms that fullmatch it form the expansion
            out = set(self._expand_regexp(text))
        else:  # fuzzy
            out = set()
            for tok in set(tokenize(text)):
                out.update(self._expand_fuzzy(tok, FUZZY_MAX_EDITS))
        return sorted(out)

    def _score_query_uncached(self, text: str):
        if self.mode in ("prefix", "fuzzy", "wildcard", "regexp"):
            terms = self._expanded_terms(text)
            if not terms:
                return [], 0, 0
            return self._score_wand(terms)
        if self.mode == "phrase":
            toks = tokenize(text)
            if not toks or any(not self._has_term(t) for t in toks):
                return [], 0, 0  # a phrase with an unindexed term matches nothing
            return self._score_phrase(toks)
        if self.mode == "near":
            from .queryset import parse_near_query

            terms, w = parse_near_query(text)
            if not terms or any(not self._has_term(t) for t in terms):
                return [], 0, 0  # conjunctive: an unindexed term matches nothing
            return self._score_near(terms, w)
        if self.mode == "spannear":
            from .queryset import parse_ordered_near_query

            toks, w = parse_ordered_near_query(text)
            if not toks or any(not self._has_term(t) for t in toks):
                return [], 0, 0  # conjunctive: an unindexed term matches nothing
            return self._score_spannear(toks, w)
        if self.mode == "dismax":
            terms = self._query_terms(text)
            if not terms:
                return [], 0, 0
            return self._score_dismax(terms)
        if self.mode == "boost":
            from .queryset import parse_boost_query

            pairs = [
                (t, b) for t, b in parse_boost_query(text) if self._has_term(t)
            ]
            if not pairs:
                return [], 0, 0
            return self._score_boost(pairs)
        if self.mode == "and":
            all_terms = sorted(set(tokenize(text)))
            terms = [t for t in all_terms if self._has_term(t)]
            if not all_terms or len(terms) < len(all_terms):
                return [], 0, 0  # conjunctive: an unknown term matches nothing
            return self._score_and(terms)
        if self.mode == "msm":
            terms = self._query_terms(text)
            if not terms:
                return [], 0, 0
            return self._score_msm(terms, self.msm)
        if self.mode == "synonym":
            return self._score_synonym(text)
        if self.mode == "collapse":
            return self._score_collapse(text)
        if self.mode == "funcscore":
            return self._score_funcscore(text)
        terms = self._query_terms(text)
        if not terms:
            return [], 0, 0
        if self.mode == "exhaustive":
            return self._score_exhaustive(terms)
        return self._score_wand(terms)

    def _term_arrays(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """Actor-cached (doc_ids, idf·tf_norm partial scores) per term —
        the pinned "impact" arrays; decoded + scored once per actor
        (the reference's context-cache pattern, context.jl:41-53).
        With ``doc_range`` set, boundary runs are sliced to the range
        here (idf/df stay global — reader contract), so a doc-sharded
        scorer's values are bit-identical to the same docs' values in
        unsharded scoring."""
        hit = self._scores_cache.get(term)
        if hit is not None:
            return hit
        if self.pack is not None:
            ids, partial = self.pack["terms"][term]
        else:
            ids, tfs, dls = self.reader.postings_cached(term)
            partial = self.reader.idf(term) * tf_norm(tfs, dls, self.reader.avgdl, self.params)
        if self.doc_range is not None:
            lo, hi = self.doc_range
            a = np.searchsorted(ids, lo, side="left")
            b = np.searchsorted(ids, hi, side="left")
            ids, partial = ids[a:b], partial[a:b]
        if self._allowed is not None and len(ids):
            _, keep = in_sorted(self._allowed, ids)
            ids, partial = ids[keep], partial[keep]
        if self._deleted is not None and len(ids):
            _, drop = in_sorted(self._deleted, ids)
            if drop.any():
                ids, partial = ids[~drop], partial[~drop]
        self._scores_cache[term] = (ids, partial)
        return ids, partial

    def _term_blocks(self, term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(block_first, block_last, idf·block_max) across runs."""
        if self.pack is not None:
            return self.pack["blocks"][term]
        rdr = self.reader
        w = rdr.idf(term)
        runs = [r for r in rdr.runs(term) if r.df > 0]
        return (
            np.concatenate([r.block_first for r in runs]),
            np.concatenate([r.block_last for r in runs]),
            np.concatenate(
                [w * tf_norm(r.block_max_tf, r.block_min_dl, rdr.avgdl, self.params) for r in runs]
            ),
        )

    # spans beyond this fall back to the allocating _accumulate path
    # (sparse/offset id spaces, e.g. delta appends far above base)
    _MAX_SCRATCH_SPAN = 1 << 26

    def _accumulate_query(self, terms):
        """Exhaustive (uniq_doc_ids, scores, npost, nblocks) for a term
        disjunction — shared by exhaustive top-k and search_after."""
        base, hi = self._span
        span = hi - base
        npost = 0
        nblocks = 0
        total = sum(len(self._term_arrays(t)[0]) for t in terms)
        # dense-enough spans use the scratch (flatnonzero scans the
        # span once per query — only worth it when postings fill it)
        if 0 < span <= min(self._MAX_SCRATCH_SPAN, max(4 * total, 1)):
            # allocation-free accumulate: per-term in-place adds into
            # the reused scratch. Within a term ids are unique, so the
            # fancy-index += is exact; per-doc adds happen in term-major
            # order — bit-identical to the bincount path (_accumulate).
            if self._acc is None or len(self._acc) < span:
                self._acc = np.zeros(span, dtype=np.float64)
            acc = self._acc
            for t in terms:
                ids, partial = self._term_arrays(t)
                nblocks += len(self._term_blocks(t)[0])
                acc[ids if base == 0 else ids - base] += partial
                npost += len(ids)
            nz = np.flatnonzero(acc[:span])
            scores = acc[nz]  # copy before reset
            acc[nz] = 0.0     # reset only touched slots
            uniq = nz + base if base else nz
        else:
            ids_l, part_l = [], []
            for t in terms:
                ids, partial = self._term_arrays(t)
                nblocks += len(self._term_blocks(t)[0])
                ids_l.append(ids)
                part_l.append(partial)
            uniq, scores = _accumulate(ids_l, part_l)
            npost = int(sum(len(i) for i in ids_l))
        return uniq, scores, npost, nblocks

    def _full_hits(self, text: str):
        """COMPLETE (doc_ids, scores, npost, nblocks) match set for the
        actor's mode — no top-k cut. The cursor path of search_after
        filters this set, so page 2+ ranks exactly the docs/scores that
        page 1 of the SAME mode ranked (wand is bit-identical to
        exhaustive by contract, so both share the accumulate kernel).
        Positional modes exact-rescore the full candidate set
        (:meth:`_rescore_exact`, never the top-k-sufficient refine —
        the cursor needs exact scores below the cut too)."""
        mode = self.mode
        if mode in ("prefix", "fuzzy", "wildcard", "regexp"):
            terms = self._expanded_terms(text)
            if not terms:
                return None
            return self._accumulate_query(terms)
        if mode == "phrase":
            toks = tokenize(text)
            if not toks or any(not self._has_term(t) for t in toks):
                return None
            cand, npost = self._phrase_candidates(toks)
            if not len(cand):
                return None
            return cand, self._rescore_exact(sorted(set(toks)), cand), int(npost), 1
        if mode == "near":
            from .queryset import parse_near_query

            terms, w = parse_near_query(text)
            if not terms or any(not self._has_term(t) for t in terms):
                return None
            cand, npost = self._near_candidates(terms, w)
            if not len(cand):
                return None
            return cand, self._rescore_exact(terms, cand), int(npost), 1
        if mode == "spannear":
            from .queryset import parse_ordered_near_query

            toks, w = parse_ordered_near_query(text)
            if not toks or any(not self._has_term(t) for t in toks):
                return None
            cand, npost = self._ordered_near_candidates(toks, w)
            if not len(cand):
                return None
            terms = sorted(set(toks))
            return cand, self._rescore_exact(terms, cand), int(npost), 1
        if mode == "dismax":
            terms = self._query_terms(text)
            if not terms:
                return None
            ids_l, part_l, npost = [], [], 0
            for t in terms:
                ids, partial = self._term_arrays(t)
                ids_l.append(ids)
                part_l.append(partial)
                npost += len(ids)
            ids = np.concatenate(ids_l)
            parts = np.concatenate(part_l)
            if not len(ids):
                return None
            order = np.argsort(ids, kind="stable")
            sid, sp = ids[order], parts[order]
            uniq, starts = np.unique(sid, return_index=True)
            return uniq, np.maximum.reduceat(sp, starts), npost, len(terms)
        if mode == "boost":
            from .queryset import parse_boost_query

            pairs = [
                (t, b) for t, b in parse_boost_query(text) if self._has_term(t)
            ]
            if not pairs:
                return None
            ids_l, part_l, npost = [], [], 0
            for t, b in pairs:
                ids, partial = self._term_arrays(t)
                ids_l.append(ids)
                part_l.append(partial * b if b != 1.0 else partial)
                npost += len(ids)
            uniq, scores = _accumulate(ids_l, part_l)
            return uniq, scores, npost, len(pairs)
        if mode == "and":
            all_terms = sorted(set(tokenize(text)))
            terms = [t for t in all_terms if self._has_term(t)]
            if not all_terms or len(terms) < len(all_terms):
                return None
            ids_l, part_l = [], []
            for t in terms:
                ids, partial = self._term_arrays(t)
                ids_l.append(ids)
                part_l.append(partial)
            uniq, scores = _accumulate(ids_l, part_l)
            _, counts = _accumulate(ids_l, [np.ones(len(i)) for i in ids_l])
            mask = counts == float(len(terms))
            return (
                uniq[mask],
                scores[mask],
                int(sum(len(i) for i in ids_l)),
                len(terms),
            )
        if mode == "msm":
            terms = self._query_terms(text)
            if not terms:
                return None
            ids_l, part_l = [], []
            for t in terms:
                ids, partial = self._term_arrays(t)
                ids_l.append(ids)
                part_l.append(partial)
            uniq, scores = _accumulate(ids_l, part_l)
            _, counts = _accumulate(ids_l, [np.ones(len(i)) for i in ids_l])
            mask = counts >= float(self.msm)
            return (
                uniq[mask],
                scores[mask],
                int(sum(len(i) for i in ids_l)),
                len(terms),
            )
        if mode == "synonym":
            return self._synonym_accumulate(text)
        if mode == "collapse":
            return self._collapse_accumulate(text)
        if mode == "funcscore":
            return self._funcscore_accumulate(text)
        # exhaustive / wand (bit-identical contract)
        terms = self._query_terms(text)
        if not terms:
            return None
        return self._accumulate_query(terms)

    def score_query_after(self, text: str, after: tuple[float, int]):
        """Top-k STRICTLY after the ``(score, doc_id)`` cursor in the
        (score desc, doc_id asc) total order — Lucene
        ``IndexSearcher.searchAfter`` (deep pagination without offset
        accumulation). Mode-aware: the full match set comes from
        :meth:`_full_hits` (same kernels page 1 used), then a
        vectorized cursor mask + the standard tie-ruled top-k; scores
        stay bit-identical to page-1 scoring of the same docs."""
        full = self._full_hits(text)
        if full is None:
            return [], 0, 0
        uniq, scores, npost, nblocks = full
        s0, d0 = float(after[0]), int(after[1])
        keep = (scores < s0) | ((scores == s0) & (uniq > d0))
        uniq, scores = uniq[keep], scores[keep]
        idx = topk_indices(scores, uniq, self.k)
        return (
            [(int(uniq[j]), float(scores[j])) for j in idx],
            int(npost),
            int(nblocks),
        )

    def _score_exhaustive(self, terms):
        uniq, scores, npost, nblocks = self._accumulate_query(terms)
        idx = topk_indices(scores, uniq, self.k)
        return (
            [(int(uniq[j]), float(scores[j])) for j in idx],
            int(npost),
            int(nblocks),
        )

    def _term_impacts(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """Impact-ordered view of a term's postings: (doc_ids, partial
        scores) sorted by (impact desc, doc_id asc). Cached per actor;
        served zero-copy from the broadcast pack when available (the
        impact-sorted index the pruned mode walks — Anh & Moffat's
        impact ordering, here derived at serve time rather than being
        the storage order so the doc-ordered layout keeps serving the
        exhaustive/sharded paths)."""
        hit = self._impact_cache.get(term)
        if hit is None:
            if (
                self.pack is not None
                and self.doc_range is None
                and self._allowed is None
                and self._deleted is None
                and term in self.pack.get("imp", {})
            ):
                hit = self.pack["imp"][term]
            else:
                ids, partial = self._term_arrays(term)
                o = np.lexsort((ids, -partial))
                hit = (ids[o], partial[o])
            self._impact_cache[term] = hit
        return hit

    def _score_dismax(self, terms):
        """Disjunction-max (Lucene DisjunctionMaxQuery, tie_breaker=0):
        a doc scores the MAX of its matching terms' BM25 contributions
        instead of the sum. Sort-by-id + reduceat-max — max selects one
        exact input value, so engine and SQL agree bit-for-bit."""
        ids_l, part_l = [], []
        npost = 0
        for t in terms:
            ids, partial = self._term_arrays(t)
            ids_l.append(ids)
            part_l.append(partial)
            npost += len(ids)
        ids = np.concatenate(ids_l)
        parts = np.concatenate(part_l)
        if not len(ids):
            return [], 0, 0
        order = np.argsort(ids, kind="stable")
        sid, sp = ids[order], parts[order]
        uniq, starts = np.unique(sid, return_index=True)
        mx = np.maximum.reduceat(sp, starts)
        idx = topk_indices(mx, uniq, self.k)
        return (
            [(int(uniq[j]), float(mx[j])) for j in idx],
            int(npost),
            int(len(terms)),
        )

    def _score_boost(self, pairs: list[tuple[str, float]]):
        """Boosted disjunction: each term's partials scale by its boost
        before the standard term-major sum — Lucene per-term boosts."""
        ids_l, part_l = [], []
        npost = 0
        for t, b in pairs:
            ids, partial = self._term_arrays(t)
            ids_l.append(ids)
            part_l.append(partial * b if b != 1.0 else partial)
            npost += len(ids)
        uniq, scores = _accumulate(ids_l, part_l)
        idx = topk_indices(scores, uniq, self.k)
        return (
            [(int(uniq[j]), float(scores[j])) for j in idx],
            int(npost),
            int(len(pairs)),
        )

    def _doc_langs(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(sorted doc_ids, lang_code_of_doc, sorted unique langs) from
        the index docmap — the doc-values column for field collapse.
        Pushdown read (doc_id + lang only); doc-range-pinned actors
        would read just their range, but collapse raises under
        sharding (cross-shard groups need a lang-aware merge)."""
        hit = getattr(self, "_doc_langs_cache", None)
        if hit is None:
            import os as _os

            import pyarrow.dataset as pads

            if self.index_dir is None:
                raise ValueError("collapse mode needs index_dir")
            t = pads.dataset(
                _os.path.join(self.index_dir, "docmap"), format="parquet"
            ).to_table(columns=["doc_id", "lang"])
            ids = t["doc_id"].to_numpy().astype(np.int64)
            enc = t["lang"].combine_chunks().dictionary_encode()
            codes = enc.indices.to_numpy().astype(np.int64)
            # re-map codes through the sorted vocabulary so ties and
            # group identities are dictionary-order stable
            vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
            order_v = np.argsort(vocab)
            remap = np.empty(len(vocab), dtype=np.int64)
            remap[order_v] = np.arange(len(vocab))
            o = np.argsort(ids, kind="stable")
            hit = (ids[o], remap[codes][o], vocab[order_v])
            self._doc_langs_cache = hit
        return hit

    def _funcscore_accumulate(self, text: str):
        """(doc_ids, scores, npost, nblocks) for mode="funcscore":
        BM25 disjunction × a doc-values weight — Elasticsearch
        function_score / field_value_factor, here weight(lang) from
        ``queryset.FUNC_LANG_BOOST`` (1.0 default). The weight
        multiplies AFTER accumulation (one gather per match set), so
        cost over plain scoring is one lang lookup per candidate.
        Composes with doc sharding (a doc's lang and score both live
        in its shard; df stays global)."""
        from .queryset import FUNC_LANG_BOOST

        terms = self._query_terms(text)
        if not terms:
            return None
        uniq, scores, npost, nblk = self._accumulate_query(terms)
        if not len(uniq):
            return None
        dm_ids, dm_code, vocab = self._doc_langs()
        weights = np.ones(len(vocab) + 1, dtype=np.float64)
        for i, lang in enumerate(vocab):
            weights[i] = FUNC_LANG_BOOST.get(str(lang), 1.0)
        pos, valid = in_sorted(dm_ids, uniq)
        code = np.where(valid, dm_code[np.minimum(pos, len(dm_ids) - 1)], len(vocab))
        return uniq, scores * weights[code], npost, nblk

    def _score_funcscore(self, text: str):
        acc = self._funcscore_accumulate(text)
        if acc is None:
            return [], 0, 0
        uniq, scores, npost, nblk = acc
        idx = topk_indices(scores, uniq, self.k)
        return (
            [(int(uniq[j]), float(scores[j])) for j in idx],
            int(npost),
            int(nblk),
        )

    def _collapse_accumulate(self, text: str):
        """(kept_doc_ids, scores, npost, nblocks) for mode="collapse":
        the disjunction match set COLLAPSED to the best-scoring doc
        per docmap-lang group ((score desc, doc_id asc) within the
        group — Lucene/Elasticsearch field collapse on a doc-values
        field), or None when nothing matches."""
        if self.doc_range is not None:
            raise ValueError(
                "collapse mode does not compose with doc sharding (a lang "
                "group spans shards; the merge would need lang-aware keys)"
            )
        terms = self._query_terms(text)
        if not terms:
            return None
        uniq, scores, npost, nblk = self._accumulate_query(terms)
        if not len(uniq):
            return None
        dm_ids, dm_code, _ = self._doc_langs()
        pos, valid = in_sorted(dm_ids, uniq)
        if not valid.all():
            # A matched doc absent from the docmap means the serving
            # state is inconsistent (stale pack / fingerprint miss —
            # every live doc has a docmap row by construction). Raise
            # loudly instead of collapsing all unknown-lang docs under
            # one sentinel group (ADVICE r4).
            missing = uniq[~valid][:5].tolist()
            raise RuntimeError(
                f"collapse: {int((~valid).sum())} matched doc(s) missing "
                f"from the docmap (e.g. {missing}) — stale serving pack "
                "or index fingerprint mismatch"
            )
        lang_of = dm_code[pos]
        order = np.lexsort((uniq, -scores))  # score desc, doc asc
        first = np.zeros(len(order), dtype=bool)
        _, fidx = np.unique(lang_of[order], return_index=True)
        first[fidx] = True
        keep = order[first]  # best row per lang group, in rank order
        keep.sort()  # back to doc-ascending like the other kernels
        return uniq[keep], scores[keep], npost, nblk

    def _score_collapse(self, text: str):
        acc = self._collapse_accumulate(text)
        if acc is None:
            return [], 0, 0
        uniq, scores, npost, nblk = acc
        idx = topk_indices(scores, uniq, self.k)
        return (
            [(int(uniq[j]), float(scores[j])) for j in idx],
            int(npost),
            int(nblk),
        )

    def _synonym_accumulate(self, text: str):
        """(uniq_doc_ids, scores, npost, ngroups) for a query under
        SynonymQuery index-merged semantics, or None for an empty
        match set: each synonym GROUP behaves as one pseudo-term —
        member postings merge by doc (tf sums; a doc's dl is the same
        across members), df = |union of member docs| (what an
        index-time merge of the terms would have produced), idf from
        that df. Non-synonym terms score unchanged, and a query term
        expands to its whole group (querying 'slow' scores 'fast'
        docs too — Lucene SynonymQuery).

        Reader path only: packs ship idf·tf_norm PARTIALS, which
        cannot be un-saturated into the merged tf; ``search(mode=
        "synonym")`` routes broadcast=False exactly like the
        positional modes. df must be global, so doc-sharded actors
        (doc_range) raise rather than derive a shard-local df."""
        from .queryset import SYNONYM_CANON, SYNONYM_MEMBERS

        if self.reader is None:
            raise ValueError("synonym mode needs broadcast=False (reader-backed actors)")
        if self.doc_range is not None:
            raise ValueError(
                "synonym mode does not compose with doc sharding (the merged "
                "pseudo-term's df must be global)"
            )
        canons = sorted(
            {SYNONYM_CANON.get(t, t) for t in tokenize(text)}
        )
        ids_l, part_l = [], []
        npost = 0
        for canon in canons:
            members = SYNONYM_MEMBERS.get(canon, (canon,))
            parts = [
                self.reader.postings_cached(m) for m in members if m in self.reader
            ]
            if not parts:
                continue
            if len(parts) == 1:
                ids, tfs, dls = parts[0]
            else:
                ids = np.concatenate([p[0] for p in parts])
                tfs = np.concatenate([p[1] for p in parts])
                dls = np.concatenate([p[2] for p in parts])
                o = np.argsort(ids, kind="stable")
                ids, tfs, dls = ids[o], tfs[o], dls[o]
                b = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1], True])
                ids = ids[b[:-1]]
                tfs = np.add.reduceat(tfs, b[:-1])
                dls = dls[b[:-1]]
            from ..functions.bm25 import idf as _idf

            partial = float(_idf(len(ids), self.reader.n_docs)) * tf_norm(
                tfs, dls, self.reader.avgdl, self.params
            )
            # visibility masks AFTER df/idf (Lucene live-docs: stats
            # stay global until purge — same order as _term_arrays)
            if self._allowed is not None and len(ids):
                _, keep = in_sorted(self._allowed, ids)
                ids, partial = ids[keep], partial[keep]
            if self._deleted is not None and len(ids):
                _, drop = in_sorted(self._deleted, ids)
                if drop.any():
                    ids, partial = ids[~drop], partial[~drop]
            ids_l.append(ids)
            part_l.append(partial)
            npost += len(ids)
        if not ids_l:
            return None
        uniq, scores = _accumulate(ids_l, part_l)
        return uniq, scores, npost, len(ids_l)

    def _score_synonym(self, text: str):
        acc = self._synonym_accumulate(text)
        if acc is None:
            return [], 0, 0
        uniq, scores, npost, ngroups = acc
        idx = topk_indices(scores, uniq, self.k)
        return (
            [(int(uniq[j]), float(scores[j])) for j in idx],
            int(npost),
            int(ngroups),
        )

    def _score_msm(self, terms, m: int):
        """Minimum-should-match (Lucene ``minimumShouldMatch``): only
        docs containing at least ``m`` DISTINCT query terms score;
        ranking is the standard BM25 disjunction over the matched
        terms. Unknown terms simply cannot match (they lower a doc's
        achievable count, never the threshold) — exactly Lucene's
        SHOULD-clause counting. Same presence-count kernel as
        :meth:`_score_and` (the m == len(terms) special case)."""
        ids_l, part_l = [], []
        for t in terms:
            ids, partial = self._term_arrays(t)
            ids_l.append(ids)
            part_l.append(partial)
        uniq, scores = _accumulate(ids_l, part_l)
        _, counts = _accumulate(ids_l, [np.ones(len(i)) for i in ids_l])
        mask = counts >= float(m)
        uniq, scores = uniq[mask], scores[mask]
        idx = topk_indices(scores, uniq, self.k)
        return (
            [(int(uniq[j]), float(scores[j])) for j in idx],
            int(sum(len(i) for i in ids_l)),
            int(len(terms)),
        )

    def _score_and(self, terms):
        """Conjunctive (AND) BM25: only docs containing EVERY query
        term score; same formula, same tie rule. Presence is counted
        with a parallel unit-weight accumulate over the same id arrays
        (same uniq vector), so the mask aligns exactly."""
        ids_l, part_l = [], []
        for t in terms:
            ids, partial = self._term_arrays(t)
            ids_l.append(ids)
            part_l.append(partial)
        uniq, scores = _accumulate(ids_l, part_l)
        _, counts = _accumulate(ids_l, [np.ones(len(i)) for i in ids_l])
        mask = counts == float(len(terms))
        uniq, scores = uniq[mask], scores[mask]
        idx = topk_indices(scores, uniq, self.k)
        return (
            [(int(uniq[j]), float(scores[j])) for j in idx],
            int(sum(len(i) for i in ids_l)),
            int(len(terms)),
        )

    def _term_positions(self, term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(doc_ids, tfs, flat_positions) for a term from the v4
        positions sidecar — reader path only (the broadcast pack ships
        no positions: phrase serving pins the index per actor). With
        ``doc_range`` the posting slice carries its position segments
        along (offsets from cumsum(tf))."""
        hit = self._pos_cache.get(term)
        if hit is not None:
            return hit
        if self.reader is None:
            raise ValueError("phrase mode needs broadcast=False (reader-backed actors)")
        if self._allowed is not None:
            raise ValueError("phrase mode does not compose with a lang filter")
        if not self.stats.get("with_positions", True):
            raise ValueError(
                "index has no positions sidecar (built with "
                "with_positions=False, or positions were lost merging mixed "
                "segments) — use phrase_search_scan for positional queries "
                "on this index"
            )
        ids, tfs, _, pos = self.reader.postings_with_positions(term)
        if self.doc_range is not None:
            lo, hi = self.doc_range
            a = np.searchsorted(ids, lo, side="left")
            b = np.searchsorted(ids, hi, side="left")
            offs = np.zeros(len(tfs) + 1, dtype=np.int64)
            np.cumsum(tfs, out=offs[1:])
            ids, tfs, pos = ids[a:b], tfs[a:b], pos[offs[a] : offs[b]]
        if self._deleted is not None and len(ids):
            _, drop = in_sorted(self._deleted, ids)
            if drop.any():
                keep = ~drop
                pos = pos[np.repeat(keep, tfs)]
                ids, tfs = ids[keep], tfs[keep]
        hit = (ids, tfs, pos)
        self._pos_cache.put(term, hit)
        return hit

    # _and_docs counting-scratch span cap: bytes == doc span, allocated
    # ONCE per actor (hot-path no-fresh-multi-MB-alloc rule, §C.4).
    # Above the cap — or when the smallest posting list is tiny enough
    # that df_min·log probing beats a span scan — the searchsorted
    # chain serves instead. 8M docs/actor is far above the doc-sharded
    # serving envelope; an unsharded >8M-doc actor falls back cleanly.
    _AND_SCRATCH_SPAN_CAP = 8 << 20
    # min smallest-list length for the span scan to beat probing
    # (class attrs so tests can force either path on tiny fixtures)
    _AND_SCRATCH_DF_MIN = 2048

    def _and_docs(self, terms: list[str]) -> np.ndarray:
        """Sorted doc_ids containing EVERY term — the cheap doc-level
        pre-intersection both positional modes run before touching any
        position bytes (the scoring arrays are decoded/cached anyway).
        Inherits doc_range slicing + visibility masks from
        :meth:`_term_arrays`.

        Dense case (round 5): k sorted posting lists intersect via ONE
        counting pass over an actor-resident u8 span scratch
        (``scratch[ids-lo] += 1`` per term — ids are unique per term —
        then one vectorized ``== k`` scan; touched slots re-scatter to
        zero, never a span memset). Sequential scatters into an
        L2-resident span replace df_min·(k−1) random binary-search
        probes — measured 16 → ~2 ms on the bench dense fixture.
        Identical output to the chain by construction (exact
        intersection, ascending ids)."""
        arrs = []
        for t in terms:
            ids = self._term_arrays(t)[0]
            if not len(ids):
                return np.empty(0, np.int64)
            arrs.append(ids)
        arrs.sort(key=len)
        lo, hi = self._span
        span = int(hi - lo)
        if (
            1 < len(arrs) < 255
            and span <= self._AND_SCRATCH_SPAN_CAP
            and len(arrs[0]) >= self._AND_SCRATCH_DF_MIN
        ):
            scratch = self._and_scratch
            if scratch is None or len(scratch) < span:
                scratch = self._and_scratch = np.zeros(span, dtype=np.uint8)
                self._and_eq = np.zeros(span, dtype=bool)
            sv = scratch[:span]
            off = np.int64(lo)
            for a in arrs:
                sv[a - off] += 1
            eq = self._and_eq[:span]
            np.equal(sv, np.uint8(len(arrs)), out=eq)
            hits = np.flatnonzero(eq)
            for a in arrs:
                sv[a - off] = 0
            res = hits.astype(np.int64) + off if lo else hits.astype(np.int64)
            # eq still encodes membership of exactly `res` (np.equal
            # rewrites the whole span each call) — let _occ_keys_for
            # test membership with one O(|ids|) gather instead of a
            # searchsorted when it receives THIS array back (identity
            # check, so a caller-mutated or different doc set never
            # hits the shortcut)
            self._and_eq_for = res
            return res
        out = arrs[0]
        for a in arrs[1:]:
            out = out[in_sorted(a, out)[1]]
            if not len(out):
                break
        self._and_eq_for = None
        return out

    def _term_positions_for(
        self, term: str, docs: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(doc_ids, tfs, flat_positions) RESTRICTED to the sorted
        candidate ``docs`` — decodes only runs whose doc span contains
        a candidate (per-run cache). Salted head terms have doc-range-
        bounded runs, so a small candidate set skips most position
        bytes of exactly the terms where that matters; at 100 TB this
        is what keeps phrase cost ∝ match set, not collection
        frequency."""
        if self.reader is None:
            raise ValueError("positional modes need broadcast=False (reader-backed actors)")
        if self._allowed is not None:
            raise ValueError("positional modes do not compose with a lang filter")
        if not self.stats.get("with_positions", True):
            raise ValueError(
                "index has no positions sidecar (built with "
                "with_positions=False, or positions were lost merging mixed "
                "segments) — use phrase_search_scan for positional queries "
                "on this index"
            )
        if not len(docs):
            e = np.empty(0, np.int64)
            return e, e, e.copy()
        from ..state.segment import (
            decode_all,
            decode_blocks,
            decode_positions,
            decode_positions_blocks,
        )

        cache = getattr(self, "_pos_run_cache", None)
        if cache is None:
            cache = self._pos_run_cache = _LRU(_POSITIONAL_CACHE_CAP)
        pi, pt, pp = [], [], []
        for ri, r in enumerate(self.reader.runs(term)):
            nblk = len(r.block_first)
            if not nblk:
                continue
            j = np.searchsorted(docs, int(r.block_first[0]))
            if j >= len(docs) or docs[j] > int(r.block_last[-1]):
                continue  # no candidate inside this run's span
            hit = cache.get((term, ri))
            if hit is None and r.has_pos_blocks:
                # layout-v5 cold path: decode ONLY blocks whose doc
                # span contains a candidate (uncached — the whole-run
                # occurrence caches own the warm path). Cost ∝
                # candidate block coverage, never run mass.
                j1 = np.searchsorted(docs, r.block_first, side="left")
                jc = np.minimum(j1, len(docs) - 1)
                bsel = np.flatnonzero((j1 < len(docs)) & (docs[jc] <= r.block_last))
                if len(bsel) < nblk // 4:
                    if not len(bsel):
                        continue
                    ids_b, tfs_b, _ = decode_blocks(r, bsel)
                    pos_b = decode_positions_blocks(r, bsel, tfs_b)
                    _, keep = in_sorted(docs, ids_b)
                    if keep.all():
                        pi.append(ids_b)
                        pt.append(tfs_b)
                        pp.append(pos_b)
                    elif keep.any():
                        pi.append(ids_b[keep])
                        pt.append(tfs_b[keep])
                        pp.append(pos_b[np.repeat(keep, tfs_b)])
                    continue
            if hit is None:
                ids_r, tfs_r, _ = decode_all(r)
                pos_r = decode_positions(r, tfs_r)
                hit = (ids_r, tfs_r, pos_r)
                cache.put((term, ri), hit)
            ids_r, tfs_r, pos_r = hit
            _, keep = in_sorted(docs, ids_r)
            if keep.all():
                pi.append(ids_r)
                pt.append(tfs_r)
                pp.append(pos_r)
            elif keep.any():
                pi.append(ids_r[keep])
                pt.append(tfs_r[keep])
                pp.append(pos_r[np.repeat(keep, tfs_r)])
        if not pi:
            e = np.empty(0, np.int64)
            return e, e, e.copy()
        return np.concatenate(pi), np.concatenate(pt), np.concatenate(pp)

    # fixed occurrence-key shift: key = doc_id << 32 | pos. Valid while
    # max_doc < 2^32 and every position < 2^32 − 256 (the phrase/near
    # probes add at most the query length / window to a key); outside
    # that envelope the dynamic-M fallback path runs instead.
    _OCC_SHIFT = np.uint64(32)
    _OCC_POS_MASK = np.uint64(0xFFFFFFFF)

    def _occ_eligible(self) -> bool:
        base, hi = self._span
        return base >= 0 and hi < (1 << 32)

    def _term_occ(self, term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(doc_ids, occ_offsets, keys): the term's occurrences as ONE
        sorted uint64 key array ``doc_id << 32 | pos`` with per-doc
        segment offsets — cached per actor. Positional serving probes
        these arrays directly with ``searchsorted`` (no per-query key
        building, no per-query position gathers — at bench scale those
        two were ~60%% of warm dense-phrase latency). Memory matches
        the decoded-positions cache it replaces (8 B/occurrence);
        ``_pos_cache`` is dropped for the term to avoid double
        retention (positions recover as ``keys & 0xFFFFFFFF``)."""
        hit = self._occ_cache.get(term)
        if hit is None:
            ids, tfs, pos = self._term_positions(term)
            if len(pos) and int(pos.max()) >= (1 << 32) - 256:
                raise ValueError("position exceeds the occurrence-key envelope")
            off = np.zeros(len(ids) + 1, dtype=np.int64)
            np.cumsum(tfs, out=off[1:])
            keys = (
                np.repeat(ids, tfs).astype(np.uint64) << self._OCC_SHIFT
            ) | pos.astype(np.uint64)
            hit = (ids, off, keys)
            self._occ_cache.put(term, hit)
            self._pos_cache.pop(term, None)
        return hit

    def _occ_keys_for(self, term: str, docs: np.ndarray) -> np.ndarray:
        """The term's occurrence keys RESTRICTED to the sorted
        candidate ``docs`` — one vectorized segment gather from the
        cached key array."""
        ids, off, keys = self._term_occ(term)
        if not len(docs) or not len(ids):
            return keys[:0]
        if docs is self._and_eq_for and self._and_eq is not None:
            # key-level mask: each key's doc id lives in its high bits,
            # so membership is ONE sequential gather off the AND eq
            # buffer over the full key array + a boolean compress — no
            # per-doc segment expansion (repeat/arange/cumsum) at all.
            # The doc-half scratch is actor-resident (hot-path
            # no-fresh-multi-MB-alloc rule, §C.4).
            n = len(keys)
            buf = self._keybuf
            if buf is None or len(buf) < n:
                buf = self._keybuf = np.empty(n, dtype=np.uint64)
            d = buf[:n]
            np.right_shift(keys, self._OCC_SHIFT, out=d)
            lo = self._span[0]
            if lo:
                d -= np.uint64(lo)
            return keys[self._and_eq[d]]
        pos_c, valid = in_sorted(ids, docs)
        pos_c = pos_c[valid]
        starts = off[pos_c]
        lens = off[pos_c + 1] - starts
        tot = int(lens.sum())
        if tot == 0:
            return keys[:0]
        seg = np.cumsum(lens) - lens
        idx = np.repeat(starts, lens) + (
            np.arange(tot, dtype=np.int64) - np.repeat(seg, lens)
        )
        return keys[idx]

    def _score_phrase(self, toks: list[str]) -> tuple[list[tuple[int, float]], int, int]:
        """Positional phrase match + BM25 ranking, index-only.

        A doc matches when the token sequence appears contiguously:
        occurrence keys ``doc·M + (pos − i)`` (term i's occurrences
        shifted back to the phrase start) intersect across all phrase
        slots — the classic positional-postings phrase AND, vectorized
        as chained ``np.intersect1d`` over uint64 keys. Matching docs
        are exact-rescored over the phrase's distinct terms with the
        shared approx-then-refine path (term-major adds → bit-identical to the
        other serving modes and the DuckDB oracle)."""
        terms = sorted(set(toks))
        cand, npost = self._phrase_candidates(toks)
        if len(cand) == 0:
            return [], int(npost), 1
        approx, err = self._rescore_approx(terms, cand)
        cand, exact = self._refine(terms, cand, approx, err)
        idx = topk_indices(exact, cand, self.k)
        return (
            [(int(cand[j]), float(exact[j])) for j in idx],
            int(npost),
            1,
        )

    def _phrase_candidates(self, toks: list[str]) -> tuple[np.ndarray, int]:
        """Sorted doc_ids containing the contiguous phrase (+ postings
        touched) — the candidate half of :meth:`_score_phrase`, shared
        with phrase leaves of boolean trees.

        Fast path (fixed-shift occurrence keys, :meth:`_term_occ`):
        anchors = the RAREST slot's occurrences restricted to the
        doc-level AND set, shifted to phrase starts; every other slot
        is then one ``searchsorted`` membership probe of ``anchor + i``
        against its cached full key array — no per-query key building,
        no per-slot position gathers. Survivors' doc halves are the
        candidates. Falls back to the dynamic-M merge outside the
        32-bit key envelope."""
        if any(not self._has_term(t) for t in toks):
            return np.empty(0, np.int64), 0
        and_docs = self._and_docs(sorted(set(toks)))
        if len(toks) == 1 or not len(and_docs):
            return and_docs, int(len(and_docs))
        if self._occ_eligible():
            try:
                return self._phrase_candidates_fast(toks, and_docs)
            except ValueError:
                pass  # position envelope exceeded → dynamic fallback
        return self._phrase_candidates_dynamic(toks, and_docs)

    def _phrase_candidates_fast(
        self, toks: list[str], and_docs: np.ndarray
    ) -> tuple[np.ndarray, int]:
        # rarest slot by posting count (cheap proxy for occurrence mass)
        dfs = [len(self._term_arrays(t)[0]) for t in toks]
        r = int(np.argmin(dfs))
        anchors = self._occ_keys_for(toks[r], and_docs)
        npost = len(anchors)
        # per-query restricted-keys memo: repeated tokens (and the
        # anchor term itself) gather their AND-restricted keys once
        restricted: dict[str, np.ndarray] = {toks[r]: anchors}
        if r > 0 and len(anchors):
            # phrase start P = pos_r − r must be ≥ 0
            anchors = anchors[(anchors & self._OCC_POS_MASK) >= np.uint64(r)]
            anchors = anchors - np.uint64(r)
        # probe remaining slots, smallest occurrence array first
        others = sorted(
            (i for i in range(len(toks)) if i != r),
            key=lambda i: dfs[i],
        )
        for i in others:
            if not len(anchors):
                break
            keys_i = self._term_occ(toks[i])[2]
            npost += len(and_docs)  # probe bookkeeping (cost counter)
            if not len(keys_i):
                anchors = anchors[:0]
                break
            if len(anchors) * 4 >= len(keys_i):
                # dense probe: restrict the slot's keys to the AND set
                # first (one cheap eq-buffer gather — anchor docs are
                # always a subset of and_docs, so membership in the
                # restricted array equals membership in the full one);
                # the probe target then fits higher in the cache
                kr = restricted.get(toks[i])
                if kr is None:
                    kr = restricted[toks[i]] = self._occ_keys_for(toks[i], and_docs)
                keys_i = kr
                if not len(keys_i):
                    anchors = anchors[:0]
                    break
            probe = anchors + np.uint64(i)
            anchors = anchors[_member_mask(keys_i, probe)]
        cand = (
            np.unique((anchors >> self._OCC_SHIFT)).astype(np.int64)
            if len(anchors)
            else np.empty(0, np.int64)
        )
        return cand, int(npost)

    def _phrase_candidates_dynamic(
        self, toks: list[str], and_docs: np.ndarray
    ) -> tuple[np.ndarray, int]:
        npost = 0
        if True:  # (kept at old indentation — the fallback body is unchanged)
            # key base: big enough that pos never collides across docs
            maxpos = 0
            streams = []
            for i, t in enumerate(toks):
                ids, tfs, pos = self._term_positions_for(t, and_docs)
                npost += len(ids)
                streams.append((ids, tfs, pos, i))
                if len(pos):
                    maxpos = max(maxpos, int(pos.max()))
            shift = max(1, int(maxpos + len(toks) + 1).bit_length())
            M = np.uint64(1) << np.uint64(shift)
            # occurrence keys per slot are ALREADY SORTED (doc asc,
            # pos asc within doc; the −i shift preserves order), so the
            # slot AND is a sorted-merge membership probe, not
            # intersect1d's concatenate-and-resort. Rarest slot first
            # shrinks the working set fastest.
            slot_keys = []
            for ids, tfs, pos, i in streams:
                p = pos - i
                ok = p >= 0
                doc_rep = np.repeat(ids, tfs)[ok]
                slot_keys.append(
                    doc_rep.astype(np.uint64) * M + p[ok].astype(np.uint64)
                )
            slot_keys.sort(key=len)
            keys = slot_keys[0]
            for k_i in slot_keys[1:]:
                if len(keys) == 0:
                    break
                keys = keys[in_sorted(k_i, keys)[1]]
            cand = (
                np.unique((keys // M).astype(np.int64))
                if keys is not None and len(keys)
                else np.empty(0, np.int64)
            )
        return cand, int(npost)

    def _near_candidates(self, terms: list[str], w: int) -> tuple[np.ndarray, int]:
        """Sorted doc_ids where one position per term fits a ``w``-wide
        window (``max−min ≤ w``), + postings touched.

        Fully vectorized anchor sweep: a minimal valid window starts at
        an occurrence of SOME term, so a doc matches iff ∃ occurrence
        key ``κ = doc·M + pos`` (any term) with, for every term t, an
        occurrence of t in ``[κ, κ+w]``. With ``M > maxpos + w + 1``
        the probe can't cross a doc boundary, so each per-term check is
        one ``searchsorted`` over that term's sorted occurrence keys —
        no per-doc Python, cost O(total_occurrences · T · log).

        Fast path mirrors :meth:`_phrase_candidates_fast`: anchors
        gather once per term from the cached occurrence-key arrays
        (restricted to the AND set); the window probes run against the
        FULL cached arrays — the fixed 32-bit shift guarantees
        ``anchor + w`` cannot cross a doc boundary."""
        and_docs = self._and_docs(terms)
        if not len(and_docs):
            return np.empty(0, np.int64), 0
        if len(terms) == 1:
            return and_docs, int(len(and_docs))
        if self._occ_eligible() and w < (1 << 31):
            try:
                return self._near_candidates_fast(terms, w, and_docs)
            except ValueError:
                pass  # position envelope exceeded → dynamic fallback
        streams = []
        npost = 0
        maxpos = 0
        for t in terms:
            ids, tfs, pos = self._term_positions_for(t, and_docs)
            if len(ids) == 0:
                return np.empty(0, np.int64), npost
            npost += len(ids)
            streams.append((ids, tfs, pos))
            maxpos = max(maxpos, int(pos.max()) if len(pos) else 0)
        shift = int(maxpos + w + 2).bit_length()
        M = np.uint64(1) << np.uint64(shift)
        keys = [
            np.repeat(ids, tfs).astype(np.uint64) * M + pos.astype(np.uint64)
            for ids, tfs, pos in streams
        ]
        anchors = np.concatenate(keys)
        ok = np.ones(len(anchors), dtype=bool)
        W = np.uint64(w)
        for kt in keys:
            lo = np.searchsorted(kt, anchors)
            lo_c = np.minimum(lo, len(kt) - 1)
            ok &= (lo < len(kt)) & (kt[lo_c] <= anchors + W)
            if not ok.any():
                return np.empty(0, np.int64), npost
        return (
            np.unique((anchors[ok] // M).astype(np.int64)),
            npost,
        )

    def _near_candidates_fast(
        self, terms: list[str], w: int, and_docs: np.ndarray
    ) -> tuple[np.ndarray, int]:
        anchors_l = []
        npost = 0
        for t in terms:
            a = self._occ_keys_for(t, and_docs)
            if not len(a):
                return np.empty(0, np.int64), npost
            anchors_l.append(a)
            npost += len(a)
        anchors = np.concatenate(anchors_l)
        ok = np.ones(len(anchors), dtype=bool)
        W = np.uint64(w)
        for t in terms:
            kt = self._term_occ(t)[2]
            lo = np.searchsorted(kt, anchors)
            lo_c = np.minimum(lo, len(kt) - 1)
            ok &= (lo < len(kt)) & (kt[lo_c] <= anchors + W)
            if not ok.any():
                return np.empty(0, np.int64), npost
        return (
            np.unique((anchors[ok] >> self._OCC_SHIFT)).astype(np.int64),
            npost,
        )

    def _ordered_near_candidates(
        self, toks: list[str], w: int
    ) -> tuple[np.ndarray, int]:
        """Sorted doc_ids containing the token SEQUENCE at strictly
        increasing positions with ``last − first ≤ w`` — Lucene
        SpanNearQuery ``in_order=true`` (the unordered window is
        :meth:`_near_candidates`).

        Greedy leftmost chain, fully vectorized: from every occurrence
        key of the FIRST token, chase each next token's smallest
        strictly-greater occurrence key (one ``searchsorted
        side="right"`` per step). Minimizing every step minimizes the
        chain's end for that anchor (exchange argument), so an anchor
        matches iff its greedy chain lands within ``anchor + w`` — and
        the per-doc key envelope (doc·M + pos with M past maxpos + w)
        makes the window check also the same-doc check. Cost
        O(occurrences · T · log), no per-doc Python."""
        and_docs = self._and_docs(sorted(set(toks)))
        if not len(and_docs):
            return np.empty(0, np.int64), 0
        if len(toks) == 1:
            return and_docs, int(len(and_docs))

        def chain(anchors, streams, W):
            cur = anchors
            ok = np.ones(len(anchors), dtype=bool)
            for kt in streams:
                j = np.searchsorted(kt, cur, side="right")
                ok &= j < len(kt)
                if not ok.any():
                    return None
                cur = kt[np.minimum(j, len(kt) - 1)]
            ok &= cur <= anchors + W
            return anchors[ok]

        if self._occ_eligible() and w < (1 << 31):
            try:
                anchors = self._occ_keys_for(toks[0], and_docs)
                npost = len(anchors)
                streams = []
                for t in toks[1:]:
                    kt = self._term_occ(t)[2]
                    npost += len(kt)
                    streams.append(kt)
                hit = chain(anchors, streams, np.uint64(w))
                if hit is None:
                    return np.empty(0, np.int64), npost
                return (
                    np.unique(hit >> self._OCC_SHIFT).astype(np.int64),
                    npost,
                )
            except ValueError:
                pass  # position envelope exceeded → dynamic fallback
        keys = {}
        npost = 0
        maxpos = 0
        for t in sorted(set(toks)):
            ids, tfs, pos = self._term_positions_for(t, and_docs)
            if len(ids) == 0:
                return np.empty(0, np.int64), npost
            npost += len(ids)
            keys[t] = (ids, tfs, pos)
            maxpos = max(maxpos, int(pos.max()) if len(pos) else 0)
        shift = int(maxpos + w + 2).bit_length()
        M = np.uint64(1) << np.uint64(shift)
        occ = {
            t: np.repeat(ids, tfs).astype(np.uint64) * M + pos.astype(np.uint64)
            for t, (ids, tfs, pos) in keys.items()
        }
        hit = chain(occ[toks[0]], [occ[t] for t in toks[1:]], np.uint64(w))
        if hit is None:
            return np.empty(0, np.int64), npost
        return np.unique((hit // M).astype(np.int64)), npost

    def _score_spannear(self, toks: list[str], w: int):
        """Ordered proximity match + BM25 ranking over the distinct
        terms — same rescore contract as :meth:`_score_near`."""
        cand, npost = self._ordered_near_candidates(toks, w)
        if len(cand) == 0:
            return [], int(npost), 1
        terms = sorted(set(toks))
        approx, err = self._rescore_approx(terms, cand)
        cand, exact = self._refine(terms, cand, approx, err)
        idx = topk_indices(exact, cand, self.k)
        return (
            [(int(cand[j]), float(exact[j])) for j in idx],
            int(npost),
            1,
        )

    def _score_near(self, terms: list[str], w: int):
        """Proximity match + BM25 ranking, index-only — the unordered
        SpanNear analog of :meth:`_score_phrase`; same approx-then-
        refine rescore keeps scores bit-identical to the other modes."""
        cand, npost = self._near_candidates(terms, w)
        if len(cand) == 0:
            return [], int(npost), 1
        approx, err = self._rescore_approx(terms, cand)
        cand, exact = self._refine(terms, cand, approx, err)
        idx = topk_indices(exact, cand, self.k)
        return (
            [(int(cand[j]), float(exact[j])) for j in idx],
            int(npost),
            1,
        )

    def _eval_tree(self, node: dict) -> np.ndarray:
        """Sorted doc_ids matching a nested boolean tree (queryset.py
        ``TREE_QUERIES`` grammar): and=intersect (not-children subtract,
        Lucene MUST_NOT), or=union, leaves are term posting-id arrays or
        positional phrase candidates. Unknown terms match nothing."""
        if "term" in node:
            t = node["term"]
            return self._term_arrays(t)[0] if self._has_term(t) else np.empty(0, np.int64)
        if "phrase" in node:
            toks = tokenize(node["phrase"])
            if not toks:
                return np.empty(0, np.int64)
            return self._phrase_candidates(toks)[0]
        if "or" in node:
            if any("not" in c for c in node["or"]):
                raise ValueError("'not' directly under 'or' has no bounded universe")
            out = np.empty(0, np.int64)
            for c in node["or"]:
                out = np.union1d(out, self._eval_tree(c))
            return out
        if "and" in node:
            pos = [c for c in node["and"] if "not" not in c]
            neg = [c["not"] for c in node["and"] if "not" in c]
            if not pos:
                raise ValueError("'and' needs at least one positive child")
            out = self._eval_tree(pos[0])
            for c in pos[1:]:
                if len(out) == 0:
                    return out
                out = np.intersect1d(out, self._eval_tree(c), assume_unique=True)
            for c in neg:
                if len(out) == 0:
                    return out
                out = np.setdiff1d(out, self._eval_tree(c), assume_unique=True)
            return out
        raise ValueError(f"unknown tree node: {node!r}")

    def score_tree(self, tree: dict) -> tuple[list[tuple[int, float]], int, int]:
        """Nested boolean tree filter + BM25 ranking over the tree's
        positive leaf terms — the beyond-DNF Lucene BooleanQuery shape
        (``score_bool`` covers the flat OR-of-ANDs special case)."""
        from .queryset import tree_positive_terms

        cand = self._eval_tree(tree)
        terms = sorted(t for t in tree_positive_terms(tree) if self._has_term(t))
        if len(cand) == 0 or not terms:
            return [], 0, 0
        approx, err = self._rescore_approx(terms, cand)
        cand, exact = self._refine(terms, cand, approx, err)
        idx = topk_indices(exact, cand, self.k)
        return (
            [(int(cand[j]), float(exact[j])) for j in idx],
            int(len(cand) * len(terms)),
            1,
        )

    def score_bool(self, groups: list[list[str]]) -> tuple[list[tuple[int, float]], int, int]:
        """Boolean (DNF) query: a doc matches when ANY group's terms
        are ALL present; matching docs rank by standard BM25 over the
        query's distinct (known) terms — boolean clause filtering +
        relevance ranking, the Lucene pattern. A group containing an
        unknown term can never match (conjunctive within the group)."""
        all_terms = sorted({t for g in groups for t in g})
        live = [t for t in all_terms if self._has_term(t)]
        if not live:
            return [], 0, 0
        ids_l, part_l = [], []
        for t in live:
            ids, partial = self._term_arrays(t)
            ids_l.append(ids)
            part_l.append(partial)
        uniq, scores = _accumulate(ids_l, part_l)
        if len(uniq) == 0:
            return [], 0, 0
        keep = np.zeros(len(uniq), dtype=bool)
        for g in groups:
            if any(not self._has_term(t) for t in g):
                continue  # dead group: an unknown term matches nothing
            m = np.ones(len(uniq), dtype=bool)
            for t in g:
                ids_t, _ = self._term_arrays(t)
                if len(ids_t) == 0:
                    m[:] = False
                    break
                pos = np.searchsorted(ids_t, uniq)
                pos_c = np.minimum(pos, len(ids_t) - 1)
                m &= ids_t[pos_c] == uniq
            keep |= m
            if keep.all():
                break
        uniq, scores = uniq[keep], scores[keep]
        idx = topk_indices(scores, uniq, self.k)
        return (
            [(int(uniq[j]), float(scores[j])) for j in idx],
            int(sum(len(i) for i in ids_l)),
            int(len(groups)),
        )

    def _term_dense(self, term: str):
        """``(f32 dense partial-score array over the actor's doc-id
        span, max_partial)`` — ``dense[doc - base] = impact``, 0.0
        where absent — turns the candidate rescore into a pure gather.
        Built only for terms dense enough to amortize the span (head
        terms; rare terms stay on the binary-search path — their lists
        are short anyway). Served zero-copy from the broadcast pack
        when available. f32 halves gather traffic (the 2M-doc serving
        bound); ``max_partial`` feeds the rounding-error bound that
        lets :meth:`_refine` restore exact f64 scores."""
        if term in self._dense_cache:
            return self._dense_cache[term]
        if (
            self.pack is not None
            and self.doc_range is None
            and self._allowed is None
            and self._deleted is None
        ):
            hit = self.pack.get("dense", {}).get(term)
            if hit is not None:
                self._dense_cache[term] = hit
                return hit
        ids, partial = self._term_arrays(term)
        base, hi = self._span
        span = hi - base
        hit = None
        if span > 0 and len(ids) >= max(64, span // 20):
            arr = np.zeros(span, dtype=np.float32)
            arr[ids - base] = partial
            hit = (arr, float(partial.max()) if len(partial) else 0.0)
        self._dense_cache[term] = hit
        return hit

    def _pmax(self, term: str) -> float:
        """Max partial score of a term (cached) — feeds the f64
        accumulation-order slack in the approx-rescore error bound."""
        hit = self._pmax_cache.get(term)
        if hit is None:
            _, partial = self._term_arrays(term)
            hit = self._pmax_cache[term] = float(partial.max()) if len(partial) else 0.0
        return hit

    def _rescore_exact(self, terms, cand: np.ndarray) -> np.ndarray:
        """EXACT f64 scores of sorted candidate doc_ids: term-major
        adds with 0.0 for absent terms — bit-identical to
        ``_accumulate`` (x + 0.0 == x for the positive partials
        involved; same summation order). Binary-search only — never
        touches the f32 dense arrays."""
        exact = np.zeros(len(cand))
        for t in terms:
            ids_d, part_d = self._term_arrays(t)
            if len(ids_d) == 0:
                continue
            pos_c, valid = in_sorted(ids_d, cand)
            exact += np.where(valid, part_d[pos_c], 0.0)
        return exact

    def _rescore_approx(self, terms, cand: np.ndarray) -> tuple[np.ndarray, float]:
        """Scores of sorted candidate doc_ids via f32 dense gathers
        (head terms) + exact f64 binary-search adds (tail terms),
        with a GUARANTEED error bound.

        Returns ``(approx, err)`` with ``|approx[d] − exact[d]| ≤ err``
        for every candidate: each f32-rounded partial is off by at most
        ``max_t·2⁻²⁴`` (half-ulp, values well inside normal range), and
        the two f64 term-major accumulations (of slightly different
        sequences) differ by at most ``T·2⁻⁵²·Σ max_t``. ``err == 0.0``
        iff no dense term contributed — then the add sequence is
        IDENTICAL to :meth:`_rescore_exact` and approx IS exact."""
        base, _ = self._span
        n = len(cand)
        approx = np.zeros(n)
        idx = cand - base if base else cand
        if self._buf is None or len(self._buf) < n:
            self._buf = np.empty(max(n, 4096), dtype=np.float32)
        buf = self._buf[:n]
        mx_dense = 0.0
        mx_all = 0.0
        for t in terms:
            dense = self._term_dense(t)
            if dense is not None:
                arr, mx = dense
                np.take(arr, idx, out=buf)
                approx += buf
                mx_dense += mx
                mx_all += mx
                continue
            ids_d, part_d = self._term_arrays(t)
            if len(ids_d) == 0:
                continue
            pos_c, valid = in_sorted(ids_d, cand)
            approx += np.where(valid, part_d[pos_c], 0.0)
            mx_all += self._pmax(t)
        if mx_dense == 0.0:
            return approx, 0.0
        err = mx_dense * 2.0**-24 + mx_all * len(terms) * 2.0**-52
        return approx, err

    def _refine(self, terms, cand: np.ndarray, approx: np.ndarray, err: float):
        """Collapse an approx-rescored candidate set to the provably
        sufficient subset and its EXACT f64 scores.

        Any true top-k member d satisfies ``approx[d] ≥ approx_kth −
        2·err`` (both sides off by ≤ err), so the kept subset contains
        every possible top-k member, ties included; the kept docs are
        then exact-rescored with :meth:`_rescore_exact` — final ids
        AND scores stay bit-identical to the all-f64 path."""
        if err == 0.0:
            return cand, approx
        if len(cand) > self.k:
            kth = float(np.partition(approx, -self.k)[-self.k])
            keep = approx >= kth - 2.0 * err
            cand = cand[keep]
        return cand, self._rescore_exact(terms, cand)

    def _union_sorted(self, arrays: list[np.ndarray]) -> np.ndarray:
        """Sorted-unique union of id arrays — identical to
        ``np.unique(concatenate(...))``. Large unions over a bounded
        span dedupe through the reused mark scratch (one linear scan,
        no O(P log P) sort — the candidate-union sort was a top-3 cost
        of 2M-doc wand serving)."""
        arrays = [a for a in arrays if len(a)]
        if not arrays:
            return np.empty(0, np.int64)
        base, hi = self._span
        span = hi - base
        tot = sum(map(len, arrays))
        if 0 < span <= self._MAX_SCRATCH_SPAN and tot >= span // 64:
            if self._mark is None or len(self._mark) < span:
                self._mark = np.zeros(span, dtype=bool)
            m = self._mark
            for a in arrays:
                m[a - base if base else a] = True
            nz = np.flatnonzero(m[:span])
            m[nz] = False  # reset only touched slots
            return nz + base if base else nz
        return np.unique(np.concatenate(arrays))

    def _score_wand(self, terms):
        """Impact-ordered MaxScore pruning; rank-identical to exhaustive.

        Two phases, no iteration:

        1. *Seed θ̂*: exact-rescore the union of each term's top-m
           impacts; θ̂ = k-th best — a LOWER bound on the final k-th
           score (k-th best of a subset).
        2. *Admissible cutoffs with an essential-list split*: terms
           whose ascending-max prefix sums below θ̂ cannot alone reach
           it and generate no candidates; every other (essential) term
           e contributes its impacts-≥-cutoff prefix with ``c_e =
           max(θ̂ − Σ_{s≠e} max_s, (θ̂ − NE)/E)`` (see ``cutoffs``), so
           the union contains every possible top-k member, ties
           included. One exact rescore of that union + ``topk_indices``
           finalizes.

        θ̂ plays precisely the ``covradius``/θ role of the reference's
        beam pruning (``/root/reference/src/searchgraph/beamsearch.jl:30-97``);
        exactness of the rescore keeps ids AND scores bit-identical to
        the exhaustive path. Dense corpora where the cutoffs cannot
        prune hit the work budget and fall back to one exhaustive pass
        (overhead bounded by the tiny seed phase).
        """
        k = self.k
        heap = self.heap
        heap.reuse(k)
        if len(terms) == 1:
            # single term: exact scores ARE the impacts; the top-k is
            # the first k of the impact order (impact desc, doc asc)
            ids_i, imp_i = self._term_impacts(terms[0])
            n = min(k, len(ids_i))
            heap.costdist += n
            heap.costblk += 1
            return [(int(ids_i[j]), float(imp_i[j])) for j in range(n)], n, 1
        impacts = [self._term_impacts(t) for t in terms]
        # ascending zero-copy views for the cutoff binary search —
        # neither a negated copy per call (12 MB/term at 2M docs) nor
        # a pinned per-term cache (31 fresh multi-MB first-touch
        # stalls per actor on this host, BASELINE.md §C.4): a reversed
        # view allocates nothing at all
        revs = [imp[::-1] for _, imp in impacts]
        total = sum(len(i[0]) for i in impacts)
        T = len(terms)
        maxes = [float(imp[0]) if len(imp) else 0.0 for _, imp in impacts]
        summax = sum(maxes)

        by_max = sorted(range(T), key=lambda i: maxes[i])  # ascending max impact

        def cutoffs(theta: float) -> list[int]:
            """MaxScore essential-list split + per-essential cutoffs.

            Terms whose ascending-max prefix sums strictly below θ̂ are
            *non-essential*: a doc containing only those cannot reach
            θ̂, so their lists generate NO candidates (they still score
            in the rescore). Each essential term e keeps the classic
            bound θ̂ − Σ_{s≠e} max_s plus the averaged bound
            (θ̂ − NE)/E — for a top-k doc d whose highest-impact
            ESSENTIAL term is e*, exact(d) ≤ E·imp_{e*}(d) + NE. (The
            θ̂/T pigeonhole is only valid for d's GLOBAL argmax term,
            which may be non-essential, so it does not apply here.)
            """
            def prefix(i: int, c_t: float) -> int:
                # summation-rounding slack: exact(d) and the cutoff are
                # float sums evaluated in different orders, so a doc
                # whose true score ties the frontier can land a few ulps
                # under the real-arithmetic cutoff. Relax by ~1e-12
                # relative (≫ any n-term f64 summation error here, ≪ any
                # score gap that matters) — admissibility stays robust,
                # the prefix grows by at most a handful of ties.
                c_t -= abs(c_t) * 1e-12
                # count of impacts ≥ c_t in the descending array, ties
                # included — equals the old searchsorted(-imp, -c, right)
                return len(revs[i]) - int(np.searchsorted(revs[i], c_t, side="left"))

            # scheme A — every list generates; d is covered by its
            # GLOBAL argmax term, so the θ̂/T pigeonhole applies. Short
            # prefixes on dense flat-impact corpora (θ̂/T dominates).
            ps_a = [
                prefix(i, max(theta - (summax - maxes[i]), theta / T)) for i in range(T)
            ]
            # scheme B — essential split; weak lists generate nothing,
            # but essentials only get the averaged (θ̂−NE)/E floor
            # (d's global argmax may be non-essential, so θ̂/T is NOT
            # admissible here). Wins on skewed rare+stopword queries.
            ps_b = [0] * T
            ne_sum = 0.0
            split = 0
            # strict-< with relative slack: exact(d) is a float sum, so
            # a doc that ties θ̂ in real arithmetic must not be dropped
            for j, i in enumerate(by_max[: T - 1]):  # ≥1 essential always
                if ne_sum + maxes[i] < theta * (1.0 - 1e-12):
                    ne_sum += maxes[i]
                    split = j + 1
                else:
                    break
            n_ess = T - split
            for i in by_max[split:]:
                ps_b[i] = prefix(
                    i, max(theta - (summax - maxes[i]), (theta - ne_sum) / n_ess)
                )
            # both unions are admissible — take the cheaper one
            return ps_a if sum(ps_a) <= sum(ps_b) else ps_b

        # phase 0: seed θ̂ from the tiny top-m union. Phases rescore
        # APPROX (f32 dense gathers, error bound err) — θ̂ keeps its
        # lower-bound role by subtracting err; only the final _refine
        # pays for exact f64 scores, on the provably sufficient subset
        m0 = max(2 * k, self.prefix0 // 16)
        cur_prefix = [min(m0, len(i[0])) for i in impacts]
        cand = self._union_sorted([ids_i[:p] for (ids_i, _), p in zip(impacts, cur_prefix)])
        approx, err = self._rescore_approx(terms, cand)
        scanned = len(cand) * T
        phases = 1
        if len(cand) >= k:
            theta = float(np.partition(approx, -k)[-k]) - err
            # progressive tightening: θ̂ only grows as the rescored
            # subset grows, so each round's cutoffs shrink toward the
            # true-θ prefixes (measured 3-6× smaller than the seed-θ̂
            # ones on the bench corpus). Caps bound the middle round;
            # the loop finalizes as soon as the current candidate set
            # already covers the admissible cutoffs.
            for cap in (8 * self.prefix0, None):
                ps = cutoffs(theta)
                if all(p <= cp for p, cp in zip(ps, cur_prefix)):
                    break  # cand ⊇ every possible top-k member — done
                # cost model: the final rescore touches len(union)×T
                # cells (dense gathers) vs one exhaustive pass touching
                # `total` postings at a comparable per-element cost;
                # sum(ps) upper-bounds the union
                if cap is not None and sum(ps) * T <= total // 6:
                    continue  # already cheap: go straight to the final gather
                if cap is None and sum(ps) * T > int(total * 0.9):
                    hits, npost, _ = self._score_exhaustive(terms)
                    heap.costdist += scanned + npost
                    heap.costblk += phases
                    return hits, scanned + npost, phases
                nxt = [
                    min(max(p, cp), cap if cap is not None else len(i[0]))
                    for p, cp, i in zip(ps, cur_prefix, impacts)
                ]
                cand = self._union_sorted(
                    [ids_i[:p] for (ids_i, _), p in zip(impacts, nxt)]
                )
                approx, err = self._rescore_approx(terms, cand)
                scanned += len(cand) * T
                phases += 1
                cur_prefix = nxt
                theta = max(theta, float(np.partition(approx, -k)[-k]) - err)
            heap.costdist += scanned
            heap.costblk += phases
            cand, exact = self._refine(terms, cand, approx, err)
            idx = topk_indices(exact, cand, k)
            return [(int(cand[j]), float(exact[j])) for j in idx], scanned, phases
        # fewer than k docs seen and nothing to tighten against —
        # finish exhaustive (tiny corpora / heavy filters)
        hits, npost, _ = self._score_exhaustive(terms)
        heap.costdist += scanned + npost
        heap.costblk += phases
        return hits, scanned + npost, phases

    # -- batch entry --------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        import time

        qids = batch["query_id"].to_pylist()
        texts = batch["text"].to_pylist()
        # optional search_after cursor columns: (after_score, after_doc)
        # restrict each query to hits STRICTLY after that (score desc,
        # doc_id asc) position — Lucene IndexSearcher.searchAfter
        afters = (
            list(
                zip(
                    batch["after_score"].to_pylist(),
                    batch["after_doc"].to_pylist(),
                )
            )
            if "after_score" in batch.column_names
            else [None] * len(qids)
        )
        # per-QUERY metadata rows, broadcast to per-hit columns at the
        # end with one repeat per column — no per-hit Python appends
        hits_per_q: list[list[tuple[int, float]]] = []
        meta = {k: [] for k in ("query_id", "postings_scored", "blocks_decoded", "latency_us", "actor_seq")}
        for qid, text, after in zip(qids, texts, afters):
            t0 = time.perf_counter()
            hits, npost, nblk = (
                self.score_query(text)
                if after is None
                else self.score_query_after(text, after)
            )
            lat_us = int((time.perf_counter() - t0) * 1e6)
            hits_per_q.append(hits)
            meta["query_id"].append(qid)
            meta["postings_scored"].append(npost)
            meta["blocks_decoded"].append(nblk)
            meta["latency_us"].append(lat_us)
            meta["actor_seq"].append(self._n_served)
            self._n_served += 1
        counts = np.fromiter(map(len, hits_per_q), np.int64, len(hits_per_q))
        total = int(counts.sum())
        doc_ids = np.fromiter(
            (d for hits in hits_per_q for d, _ in hits), np.int64, total
        )
        scores = np.fromiter(
            (s for hits in hits_per_q for _, s in hits), np.float64, total
        )
        # per-query 1..n rank sequences without a Python loop
        starts = np.cumsum(counts) - counts
        ranks = (
            np.arange(total, dtype=np.int32)
            - np.repeat(starts, counts).astype(np.int32)
            + 1
        )
        cols = {"rank": ranks, "doc_id": doc_ids, "score": scores}
        arrays = []
        for name in RESULT_SCHEMA.names:
            if name in cols:
                arrays.append(pa.array(cols[name], type=RESULT_SCHEMA.field(name).type))
            else:
                arrays.append(
                    pa.array(
                        np.repeat(np.asarray(meta[name], dtype=np.int64), counts),
                        type=RESULT_SCHEMA.field(name).type,
                    )
                )
        return pa.Table.from_arrays(arrays, schema=RESULT_SCHEMA)


def estimated_pack_bytes(index_dir: str) -> int:
    """Decoded-pack size estimate from part metas alone (no index I/O
    beyond the tiny json files): ids+partials are 16 B/posting; head
    terms add an impact-ordered copy (16 B) and an f32 dense span
    array (4 B/slot amortized) — ~36 B per posting covers the lot on
    Zipf-shaped corpora (kept at 40 for headroom)."""
    import json as _json
    import os as _os

    total = 0
    seg_dirs = [index_dir] + [
        _os.path.join(index_dir, n)
        for n in sorted(_os.listdir(index_dir))
        if n.startswith("delta=")
    ]
    for seg in seg_dirs:
        meta_dir = _os.path.join(seg, "meta")
        for name in _os.listdir(meta_dir):
            with open(_os.path.join(meta_dir, name)) as f:
                total += int(_json.load(f).get("postings", 0))
    return total * 40


def search(
    queries_ds,
    index_dir: str,
    *,
    k: int = 10,
    mode: str = "wand",
    concurrency: int | tuple = 4,
    batch_size: int = 256,
    broadcast: bool | None = None,
    lang: str | None = None,
    cache_size: int = 0,
    msm: int | None = None,
):
    """queries (query_id, text) → results Dataset (long format).

    ``broadcast=None`` (default) AUTO-ROUTES on index size: while the
    estimated decoded pack fits ``config.BROADCAST_PACK_BUDGET_BYTES``
    per node it broadcasts (pre-decode once, zero-copy per node, actors
    start warm); above the budget it serves DOC-SHARDED instead
    (:func:`sharded_search` with enough shards that each actor pins
    ~one budget's worth) — "every node holds the whole index" is never
    an implicit assumption. ``True``/``False`` force the respective
    path (``False`` = decode-in-actor reader path). ``lang`` restricts
    scoring to docs with that docmap lang (field query).
    ``mode="phrase"`` / ``mode="near"`` (positional modes) always use the
    reader path — the positions sidecar is decoded per actor, never
    broadcast."""
    # collapse never auto-shards (lang groups span shards); the
    # positional + synonym modes never broadcast (reader state)
    if broadcast is None and mode not in ("phrase", "near", "spannear", "synonym", "collapse"):
        from ..config import BROADCAST_PACK_BUDGET_BYTES

        est = estimated_pack_bytes(index_dir)
        if est > BROADCAST_PACK_BUDGET_BYTES:
            n_shards = -(-est // BROADCAST_PACK_BUDGET_BYTES)  # ceil
            return sharded_search(
                queries_ds,
                index_dir,
                k=k,
                n_shards=int(n_shards),
                mode=mode,
                concurrency=concurrency,
                batch_size=batch_size,
                lang=lang,
                cache_size=cache_size,
                msm=msm,
            )
        broadcast = True
    if mode in ("phrase", "near", "spannear", "synonym"):
        # positional modes decode the positions sidecar per actor;
        # synonym merging needs raw tf (packs ship saturated partials)
        # — all four force the reader path
        broadcast = False
    # index_dir always rides along (even with a broadcast pack): the
    # actor reads sidecar state — docmap lang filters, tombstones —
    # straight from the index directory, never through the pack
    kwargs = {"k": k, "mode": mode, "index_dir": index_dir}
    if cache_size:
        kwargs["cache_size"] = cache_size
    if lang is not None:
        kwargs["lang"] = lang
    if msm is not None:
        kwargs["msm"] = msm
    if broadcast:
        kwargs["pack_ref"] = _pack_ref(index_dir)
    return queries_ds.map_batches(
        Bm25Scorer,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def percolate(sf_dir: str):
    """Reverse search (Elasticsearch percolate): stream the CORPUS
    against the broadcast standing-query set and emit (query_id,
    doc_id) for every conjunctive match (all of the query's distinct
    terms present in the doc; a query with unindexable terms matches
    nothing). This is the alerting/routing dataflow inverted from
    ``search``: queries are the tiny broadcast side (they ship inside
    the task closure), documents stream through ``map_batches`` —
    no index, no shuffle, output ∝ matches.
    """
    import ray.data as rd

    from ..functions.text import batch_token_counts
    from .queryset import REFERENCE_QUERIES

    qsets = [
        (qid, sorted(set(tokenize(t)))) for qid, t in REFERENCE_QUERIES
    ]

    def match(batch: pa.Table) -> pa.Table:
        nrows = batch.num_rows
        doc_idx, terms, _, _ = batch_token_counts(batch["text"])
        ids = batch["doc_id"].to_numpy()
        out_q, out_d = [], []
        for qid, qt in qsets:
            if not qt:
                continue
            # (doc, term) rows are unique, so a bincount of matching
            # rows counts DISTINCT matched terms per doc
            mask = np.isin(terms, np.asarray(qt, dtype=object))
            cnt = np.bincount(doc_idx[mask], minlength=nrows)
            hit = cnt == len(qt)
            if hit.any():
                out_d.append(ids[hit])
                out_q.append(np.full(int(hit.sum()), qid, dtype=np.int64))
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "doc_id": pa.array(np.concatenate(out_d), type=pa.int64()),
            }
        )

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(match, batch_format="pyarrow")


class ExplainScorer:
    """Actor: Lucene Explain analog — the top-k hits of each query
    with their per-term score BREAKDOWN (one row per (hit, matched
    term); contribution = idf·tf_norm, the exact partial the ranking
    summed), so ``sum(contribution) == score`` reconstructs every
    ranked score from its parts."""

    def __init__(self, index_dir: str, k: int = 10):
        self.sc = Bm25Scorer(index_dir, k=k, mode="exhaustive")

    def __call__(self, batch: pa.Table) -> pa.Table:
        sc = self.sc
        qids, ranks, docs, terms_o, contribs = [], [], [], [], []
        for qid, text in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            hits = sc.score_query(str(text))[0]
            if not hits:
                continue
            hit_docs = np.asarray([d for d, _ in hits], dtype=np.int64)
            order = np.argsort(hit_docs)
            rank_of = {int(d): r + 1 for r, (d, _) in enumerate(hits)}
            sorted_docs = hit_docs[order]
            for t in sc._query_terms(str(text)):
                ids_t, part_t = sc._term_arrays(t)
                if not len(ids_t):
                    continue
                pos, valid = in_sorted(ids_t, sorted_docs)
                for d, p, ok in zip(sorted_docs, pos, valid):
                    if ok:
                        qids.append(qid)
                        ranks.append(rank_of[int(d)])
                        docs.append(int(d))
                        terms_o.append(t)
                        contribs.append(float(part_t[p]))
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int64()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "term": pa.array(terms_o, type=pa.string()),
                "contribution": pa.array(contribs, type=pa.float64()),
            }
        )


def explain_search(
    queries_ds,
    index_dir: str,
    *,
    k: int = 10,
    concurrency: int | tuple = 2,
    batch_size: int = 256,
):
    """queries → (query_id, rank, doc_id, term, contribution): the
    per-term breakdown of every top-k hit (Lucene IndexSearcher
    .explain), streaming through the same actor-pool shape as
    :func:`search` — the breakdown adds one binary-search gather per
    (query term, hit set), nothing corpus-sized."""
    return queries_ds.map_batches(
        ExplainScorer,
        fn_constructor_kwargs={"index_dir": index_dir, "k": k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class MatchCounter:
    """Actor: per-query match cardinality (Lucene's
    TotalHitCountCollector) — the full disjunction match set's size
    with no top-k cut, counted from the same `_full_hits` kernel the
    cursor path uses (so count and pagination agree by construction)."""

    def __init__(self, index_dir: str, lang: str | None = None):
        kwargs = {"k": 1, "mode": "exhaustive"}
        if lang is not None:
            kwargs["lang"] = lang
        self.sc = Bm25Scorer(index_dir, **kwargs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ns = []
        for t in batch["text"].to_pylist():
            hits = self.sc._full_hits(str(t))
            ns.append(0 if hits is None else int(len(hits[0])))
        return pa.table(
            {
                "query_id": batch["query_id"].cast(pa.int64()),
                "n_matches": pa.array(ns, type=pa.int64()),
            }
        )


class PhraseRescorer:
    """Actor: the Elasticsearch rescore API shape — a cheap base
    ranking (BM25 disjunction, top ``base_n``) followed by an
    expensive second pass over ONLY that window (exact-phrase boost:
    +``boost`` when the query's token sequence appears contiguously,
    from the positional index), re-ranked under the same (score desc,
    doc_id asc) tie rule. The second pass touches ``base_n`` docs per
    query regardless of corpus size — the rescore-window contract."""

    def __init__(self, index_dir: str, base_n: int = 50, boost: float = 2.0, k: int = 10):
        self.sc = Bm25Scorer(index_dir, k=base_n, mode="exhaustive")
        self.base_n = base_n
        self.boost = boost
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        sc = self.sc
        heap = TopK(self.k)
        qids, ranks, docs, scores_o = [], [], [], []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            text = str(text)
            base = sc.score_query(text)[0]
            if not base:
                continue
            toks = tokenize(text)
            cand = (
                sc._phrase_candidates(toks)[0]
                if toks and all(sc._has_term(t) for t in toks)
                else np.empty(0, np.int64)
            )
            heap.reuse(self.k)
            for d, s in base:
                j = int(np.searchsorted(cand, d)) if len(cand) else 0
                in_phrase = j < len(cand) and int(cand[j]) == d
                heap.push_score(s + self.boost if in_phrase else s, d)
            for r, (d, s) in enumerate(heap.result(), start=1):
                qids.append(qid)
                ranks.append(r)
                docs.append(d)
                scores_o.append(s)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int64()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "score": pa.array(scores_o, type=pa.float64()),
            }
        )


def rescore_phrase_search(
    queries_ds,
    index_dir: str,
    *,
    base_n: int = 50,
    boost: float = 2.0,
    k: int = 10,
    concurrency: int | tuple = 2,
    batch_size: int = 256,
):
    """queries → top-k after an exact-phrase rescore of the BM25
    top-``base_n`` window (the ES rescore API; see
    :class:`PhraseRescorer`)."""
    return queries_ds.map_batches(
        PhraseRescorer,
        fn_constructor_kwargs={
            "index_dir": index_dir,
            "base_n": base_n,
            "boost": boost,
            "k": k,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class MatchStats:
    """Actor: ES-style stats aggregation over each query's FULL match
    set — (n_matches, max_score, sum_score) from the exact f64
    accumulate (`_full_hits`); consumers derive mean as sum/n."""

    def __init__(self, index_dir: str):
        self.sc = Bm25Scorer(index_dir, k=1, mode="exhaustive")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ns, mxs, sms = [], [], []
        for t in batch["text"].to_pylist():
            hits = self.sc._full_hits(str(t))
            if hits is None or not len(hits[0]):
                ns.append(0)
                mxs.append(0.0)
                sms.append(0.0)
            else:
                scores = hits[1]
                ns.append(int(len(scores)))
                mxs.append(float(scores.max()))
                sms.append(float(scores.sum()))
        return pa.table(
            {
                "query_id": batch["query_id"].cast(pa.int64()),
                "n_matches": pa.array(ns, type=pa.int64()),
                "max_score": pa.array(mxs, type=pa.float64()),
                "sum_score": pa.array(sms, type=pa.float64()),
            }
        )


def match_stats(
    queries_ds,
    index_dir: str,
    *,
    concurrency: int | tuple = 2,
    batch_size: int = 256,
):
    """queries → (query_id, n_matches, max_score, sum_score): the ES
    stats aggregation over the full match set, streaming through the
    :func:`search` actor-pool shape."""
    return queries_ds.map_batches(
        MatchStats,
        fn_constructor_kwargs={"index_dir": index_dir},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class SignificantTerms:
    """Actor: ES significant_terms aggregation — terms over-represented
    in each query's match set vs the corpus, scored by lift =
    ((a·N)) / ((m·df)) where a = matching docs containing the term,
    m = match-set size, df/N global.

    DOC-MAJOR (round 5): the actor derives a forward CSR
    (doc → distinct term ids) ONCE from its inverted postings — the
    same one-pass cost as a single query under the old vocabulary
    sweep, amortized over every query the actor serves — and each
    query is then a ragged gather of the match set's term-vector rows
    + one bincount: per-query cost ∝ the match set's term MASS, never
    the vocabulary. At 100 TB the CSR is a doc-range-partitioned
    build sidecar instead of a warm-up derivation, and the actor pool
    doc-shards exactly like sharded_search; candidate terms are
    identical either way (a ≥ min_match ≥ 1 implies the term occurs
    in a match doc, so the forward candidate set is a superset)."""

    def __init__(self, index_dir: str, min_match: int = 3, top: int = 5):
        self.sc = Bm25Scorer(index_dir, k=1, mode="exhaustive")
        self.min_match = min_match
        self.top = top
        self._fwd = None

    def _forward_csr(self):
        """(sorted_doc_ids, row_offsets, term_ids, dfs): distinct-term
        forward vectors for every live doc, derived lazily from the
        tombstone-masked postings (so deletes mask here too)."""
        if self._fwd is not None:
            return self._fwd
        sc = self.sc
        d = sc._dictionary()
        dfs = np.zeros(len(d), dtype=np.int64)
        ids_l, tid_l = [], []
        for i, t in enumerate(d):
            ids_t, _ = sc._term_arrays(str(t))
            dfs[i] = len(ids_t)
            if len(ids_t):
                ids_l.append(ids_t)
                tid_l.append(np.full(len(ids_t), i, dtype=np.int64))
        if not ids_l:
            self._fwd = (
                np.empty(0, dtype=np.int64),
                np.zeros(1, dtype=np.int64),
                np.empty(0, dtype=np.int64),
                dfs,
            )
            return self._fwd
        docs = np.concatenate(ids_l)
        tids = np.concatenate(tid_l)
        o = np.argsort(docs, kind="stable")  # stable: term ids ascend per doc
        docs_s, tids_s = docs[o], tids[o]
        udocs, starts = np.unique(docs_s, return_index=True)
        offsets = np.append(starts, len(docs_s)).astype(np.int64)
        self._fwd = (udocs, offsets, tids_s, dfs)
        return self._fwd

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.rounding import round6

        sc = self.sc
        n = float(sc.stats["n_docs"])
        d = sc._dictionary()
        udocs, offsets, tids_s, dfs = self._forward_csr()
        qids, terms_o, n_m, lifts = [], [], [], []
        for qid, text in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist()):
            hits = sc._full_hits(str(text))
            if hits is None or not len(hits[0]):
                continue
            uniq = hits[0]
            m = float(len(uniq))
            pos, valid = in_sorted(udocs, uniq)
            pos = pos[valid]
            starts, ends = offsets[pos], offsets[pos + 1]
            lens = ends - starts
            total = int(lens.sum())
            if not total:
                continue
            # ragged gather of the match set's term-vector rows
            shift = np.repeat(starts - np.concatenate(([0], np.cumsum(lens)[:-1])), lens)
            flat = tids_s[np.arange(total, dtype=np.int64) + shift]
            counts = np.bincount(flat, minlength=len(d))
            cand = np.flatnonzero(counts >= self.min_match)
            if not len(cand):
                continue
            a = counts[cand].astype(np.float64)
            lift_r = round6((a * n) / (m * dfs[cand].astype(np.float64)))
            cand_t = [str(d[j]) for j in cand]
            order = sorted(
                range(len(cand)), key=lambda i: (-lift_r[i], cand_t[i])
            )[: self.top]
            for i in order:
                qids.append(qid)
                terms_o.append(cand_t[i])
                n_m.append(int(a[i]))
                lifts.append(float(lift_r[i]))
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "term": pa.array(terms_o, type=pa.string()),
                "n_match": pa.array(n_m, type=pa.int64()),
                "lift": pa.array(lifts, type=pa.float64()),
            }
        )


def significant_terms(
    queries_ds,
    index_dir: str,
    *,
    min_match: int = 3,
    top: int = 5,
    concurrency: int | tuple = 2,
    batch_size: int = 256,
):
    """queries → (query_id, term, n_match, lift): the ES
    significant_terms aggregation over each query's full match set."""
    return queries_ds.map_batches(
        SignificantTerms,
        fn_constructor_kwargs={
            "index_dir": index_dir,
            "min_match": min_match,
            "top": top,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def match_counts(
    queries_ds,
    index_dir: str,
    *,
    concurrency: int | tuple = 2,
    batch_size: int = 256,
    lang: str | None = None,
):
    """queries (query_id, text) → (query_id, n_matches): how many docs
    match the disjunction at all — the count query every search UI
    issues next to the top-k. Streams exactly like :func:`search`
    (actor pool over query batches; per-query work is the vectorized
    accumulate, counting adds nothing to the shuffle)."""
    kwargs: dict = {"index_dir": index_dir}
    if lang is not None:
        kwargs["lang"] = lang
    return queries_ds.map_batches(
        MatchCounter,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class HybridRrfScorer:
    """Hybrid lexical retrieval: BM25 and TF-cosine rankings fused with
    reciprocal-rank fusion (Cormack et al., SIGIR'09: rrf(d) =
    Σ_r 1/(rrf_k + rank_r(d)) over each ranker's top-``base_n``) — the
    sparse+dense fusion shape every modern retrieval stack serves; the
    reference's analog is the rerank/filter composition over
    ExhaustiveSearch results (src/allknn.jl:48-73 second-pass shape).

    Both rankers serve from the SAME per-term posting gathers: BM25 via
    the shared exhaustive accumulate, cosine as an integer dot of the
    query's (deduped, binary) term vector against raw tfs, normalized
    by sqrt(n_query_terms)·||d||₂. ||d||₂ comes from one lazy pass over
    the actor's posting lists (Σ tf² per doc — the forward-CSR build
    shape of :class:`SignificantTerms`); at 100 TB the norm is a pure
    per-doc reduce over the token table and would fold into the fused
    D1 build pass as a docmap column instead.

    Determinism contract (oracle twin `_hybrid_rrf_sql`): dots and
    Σ tf² are exact int64; each similarity is one multiply + one divide
    of bit-identical f64 inputs; the two RRF contributions are a single
    two-term IEEE add (commutative), ranked at full f64 by
    (score desc, doc_id asc).
    """

    def __init__(
        self,
        index_dir: str,
        k: int = 10,
        base_n: int = 50,
        rrf_k: int = 60,
    ):
        self.sc = Bm25Scorer(index_dir, k=base_n, mode="exhaustive")
        self.k = k
        self.base_n = base_n
        self.rrf_k = float(rrf_k)
        self._norms: np.ndarray | None = None  # ||d||₂ dense over span
        self._dot: np.ndarray | None = None    # per-query int64 scratch

    def _term_raw(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """(doc_ids, raw tfs) under exactly the `_term_arrays` masks
        (doc-range slice, lang allow-list, tombstones) — reader path
        only (the broadcast pack stores BM25 partials, not tfs)."""
        sc = self.sc
        ids, tfs, _ = sc.reader.postings_cached(term)
        if sc.doc_range is not None:
            lo, hi = sc.doc_range
            a = np.searchsorted(ids, lo, side="left")
            b = np.searchsorted(ids, hi, side="left")
            ids, tfs = ids[a:b], tfs[a:b]
        if sc._allowed is not None and len(ids):
            _, keep = in_sorted(sc._allowed, ids)
            ids, tfs = ids[keep], tfs[keep]
        if sc._deleted is not None and len(ids):
            _, drop = in_sorted(sc._deleted, ids)
            if drop.any():
                ids, tfs = ids[~drop], tfs[~drop]
        return ids, tfs

    def _doc_norms(self) -> np.ndarray:
        if self._norms is not None:
            return self._norms
        base, hi = self.sc._span
        acc = np.zeros(hi - base, dtype=np.int64)  # Σ tf² is exact
        for t in self.sc._dictionary():
            ids, tfs = self._term_raw(str(t))
            if len(ids):
                tf64 = tfs.astype(np.int64)
                acc[ids - base if base else ids] += tf64 * tf64
        self._norms = np.sqrt(acc.astype(np.float64))
        return self._norms

    def _rank_window(
        self, docs: np.ndarray, scores: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top-``base_n`` (docs, 1-based ranks) under the §2.4 tie rule."""
        sel = topk_indices(scores, docs, self.base_n)
        return docs[sel], np.arange(1, len(sel) + 1, dtype=np.int64)

    def score_query(self, text: str) -> list[tuple[int, float]]:
        sc = self.sc
        toks = tokenize(text)
        if not toks:
            return []
        qn = float(np.sqrt(float(len(set(toks)))))  # ALL distinct tokens
        terms = sorted({t for t in toks if sc._has_term(t)})
        if not terms:
            return []
        # -- BM25 ranking (shared exhaustive accumulate) ---------------
        uniq, scores, _, _ = sc._accumulate_query(terms)
        if not len(uniq):
            return []
        b_docs, b_ranks = self._rank_window(uniq, scores)
        # -- TF-cosine ranking over the SAME postings ------------------
        base, hi = sc._span
        if self._dot is None or len(self._dot) < hi - base:
            self._dot = np.zeros(hi - base, dtype=np.int64)
        dot = self._dot
        for t in terms:
            ids, tfs = self._term_raw(t)
            dot[ids - base if base else ids] += tfs.astype(np.int64)
        idx = uniq - base if base else uniq  # same support: tf ≥ 1
        norms = self._doc_norms()
        sims = dot[idx].astype(np.float64) / (qn * norms[idx])
        dot[idx] = 0  # reset only touched slots
        c_docs, c_ranks = self._rank_window(uniq, sims)
        # -- RRF fusion (two-term IEEE add; order immaterial) ----------
        all_docs = np.concatenate([b_docs, c_docs])
        contrib = 1.0 / (
            self.rrf_k + np.concatenate([b_ranks, c_ranks]).astype(np.float64)
        )
        fdocs, inv = np.unique(all_docs, return_inverse=True)
        fscores = np.zeros(len(fdocs), dtype=np.float64)
        np.add.at(fscores, inv, contrib)
        sel = topk_indices(fscores, fdocs, self.k)
        return [(int(fdocs[i]), float(fscores[i])) for i in sel]

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_o, ranks_o, docs_o, scores_o = [], [], [], []
        for qid, text in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            hits = self.score_query(str(text))
            for r, (d, s) in enumerate(hits, 1):
                qids_o.append(qid)
                ranks_o.append(r)
                docs_o.append(d)
                scores_o.append(s)
        return pa.table(
            {
                "query_id": pa.array(qids_o, type=pa.int64()),
                "rank": pa.array(ranks_o, type=pa.int64()),
                "doc_id": pa.array(docs_o, type=pa.int64()),
                "score": pa.array(scores_o, type=pa.float64()),
            }
        )


class TopHitsScorer:
    """ES `top_hits` sub-aggregation under a terms bucket: for each
    query, group the FULL match set by the docmap ``lang`` doc-values
    field and emit the top-``per_group`` hits of every group under the
    shared (score desc, doc_id asc) tie rule — collapse's sibling that
    keeps a mini result list per bucket instead of one survivor
    (reference analog: the grouped-best reduction of closestpair,
    src/closestpair.jl:28-44, widened to k per group).

    Per-group ranking is one lexsort over the match set (group code,
    -score, doc_id) + boundary-offset subtraction — no Python per
    group. Never auto-shards (same reason as collapse: cross-shard
    buckets would need a group-aware merge)."""

    def __init__(self, index_dir: str, k: int = 3, per_group: int | None = None):
        self.sc = Bm25Scorer(index_dir, k=k, mode="exhaustive")
        self.per_group = per_group if per_group is not None else k

    def __call__(self, batch: pa.Table) -> pa.Table:
        sc = self.sc
        dm_ids, dm_code, vocab = sc._doc_langs()
        qids_o, langs_o, ranks_o, docs_o, scores_o = [], [], [], [], []
        for qid, text in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            terms = sc._query_terms(str(text))
            if not terms:
                continue
            uniq, scores, _, _ = sc._accumulate_query(terms)
            if not len(uniq):
                continue
            pos, valid = in_sorted(dm_ids, uniq)
            if not valid.all():
                raise RuntimeError(
                    "top_hits: match-set docs missing from the docmap "
                    "(stale pack/fingerprint serving hazard)"
                )
            code = dm_code[pos]
            # per-group argpartition cut instead of a full (group,
            # -score, doc) lexsort of the match set: only ≤ per_group
            # rows per bucket survive, and the bucket vocabulary is
            # tiny/bounded (docmap langs) — O(G·n) masks + O(group)
            # partitions beat the O(n log n)·3-key sort ~4× at 180k
            # match rows (the tie rule is topk_indices', identical to
            # the lexsort order by construction)
            for g in range(len(vocab)):
                sel = np.flatnonzero(code == g)
                if not len(sel):
                    continue
                top = topk_indices(scores[sel], uniq[sel], self.per_group)
                gi = sel[top]
                n = len(gi)
                qids_o.append(np.full(n, qid, dtype=np.int64))
                langs_o.extend([str(vocab[g])] * n)
                ranks_o.append(np.arange(1, n + 1, dtype=np.int64))
                docs_o.append(uniq[gi])
                scores_o.append(scores[gi])
        empty = np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "query_id": pa.array(
                    np.concatenate(qids_o) if qids_o else empty, type=pa.int64()
                ),
                "lang": pa.array(langs_o, type=pa.string()),
                "rank": pa.array(
                    np.concatenate(ranks_o) if ranks_o else empty, type=pa.int64()
                ),
                "doc_id": pa.array(
                    np.concatenate(docs_o) if docs_o else empty, type=pa.int64()
                ),
                "score": pa.array(
                    np.concatenate(scores_o) if scores_o else empty.astype(np.float64),
                    type=pa.float64(),
                ),
            }
        )


class LangCardinality:
    """ES `cardinality` aggregation over a terms bucket: per query,
    the number of DISTINCT docmap ``lang`` values in the FULL match
    set (exact — at web scale the probabilistic HLL variant would
    replace the exact unique; the bucket vocabulary here is bounded so
    exact IS the scale path). Emits a row for EVERY query (0 for
    no-match queries) — the match_counts convention, so the oracle
    derives its query list from query ids."""

    def __init__(self, index_dir: str):
        self.sc = Bm25Scorer(index_dir, k=1, mode="exhaustive")

    def __call__(self, batch: pa.Table) -> pa.Table:
        sc = self.sc
        dm_ids, dm_code, _ = sc._doc_langs()
        qids_o, counts_o = [], []
        for qid, text in zip(
            batch["query_id"].to_pylist(), batch["text"].to_pylist()
        ):
            terms = sc._query_terms(str(text))
            n = 0
            if terms:
                uniq = sc._accumulate_query(terms)[0]
                if len(uniq):
                    pos, valid = in_sorted(dm_ids, uniq)
                    if not valid.all():
                        raise RuntimeError(
                            "cardinality: match-set docs missing from the "
                            "docmap (stale pack/fingerprint serving hazard)"
                        )
                    n = int(len(np.unique(dm_code[pos])))
            qids_o.append(qid)
            counts_o.append(n)
        return pa.table(
            {
                "query_id": pa.array(qids_o, type=pa.int64()),
                "n_langs": pa.array(counts_o, type=pa.int64()),
            }
        )


def lang_cardinality(
    queries_ds,
    index_dir: str,
    *,
    concurrency: int | tuple = 2,
    batch_size: int = 256,
):
    """queries → (query_id, n_langs): exact distinct-bucket count per
    match set, streaming in the :func:`search` actor-pool shape."""
    return queries_ds.map_batches(
        LangCardinality,
        fn_constructor_kwargs={"index_dir": index_dir},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def top_hits_search(
    queries_ds,
    index_dir: str,
    *,
    per_group: int = 3,
    concurrency: int | tuple = 2,
    batch_size: int = 256,
):
    """queries → (query_id, lang, rank, doc_id, score): the ES
    terms-bucket + top_hits composition over each query's full match
    set. Streams in the :func:`search` actor-pool shape."""
    return queries_ds.map_batches(
        TopHitsScorer,
        fn_constructor_kwargs={"index_dir": index_dir, "per_group": per_group},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def hybrid_search(
    queries_ds,
    index_dir: str,
    *,
    k: int = 10,
    base_n: int = 50,
    rrf_k: int = 60,
    concurrency: int | tuple = 2,
    batch_size: int = 256,
):
    """queries → (query_id, rank, doc_id, score): BM25 ∪ TF-cosine
    top-``base_n`` windows fused by reciprocal-rank fusion. Streams in
    the :func:`search` actor-pool shape; per-query cost is two rankings
    over ONE set of posting gathers plus a ≤2·base_n fuse."""
    return queries_ds.map_batches(
        HybridRrfScorer,
        fn_constructor_kwargs={
            "index_dir": index_dir,
            "k": k,
            "base_n": base_n,
            "rrf_k": rrf_k,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def _combined_max_doc(index_dir: str) -> int:
    """max_doc across the base segment and any delta segments — from
    the tiny stats.json files only (no index decode on the driver)."""
    import json as _json
    import os as _os

    with open(_os.path.join(index_dir, "stats.json")) as f:
        m = _json.load(f)["max_doc"]
    for name in sorted(_os.listdir(index_dir)):
        if name.startswith("delta="):
            with open(_os.path.join(index_dir, name, "stats.json")) as f:
                m = max(m, _json.load(f)["max_doc"])
    return int(m)


def sharded_search(
    queries_ds,
    index_dir: str,
    *,
    k: int = 10,
    n_shards: int = 4,
    mode: str = "exhaustive",
    concurrency: int | tuple = 2,
    batch_size: int = 64,
    num_cpus: float | None = None,
    lang: str | None = None,
    cache_size: int = 0,
    msm: int | None = None,
):
    """Doc-sharded serving — the default large-index path (SURVEY.md
    §7): one actor pool per doc-id shard, each actor constructed with
    ``doc_range=(lo, hi)`` so it loads ONLY the runs overlapping its
    shard (parquet range pushdown on run_first/run_last — range-salted
    head terms make most bytes skippable); each shard emits a partial
    top-k and a ``groupby(query_id)`` heap-merge under the same
    (score desc, doc_id asc) tie rule reassembles the global top-k —
    the ``ParallelExhaustiveSearch`` shape
    (``/root/reference/src/parallel-exhaustive.jl:44-62``) with the
    spinlock-guarded shared queue replaced by the union + shuffle merge.

    Nothing whole-index is ever built or broadcast: the driver reads
    only stats.json. Proven rank-identical to the unsharded search in
    tests (df/idf stay global per the reader contract, a doc's partial
    sum happens entirely inside one shard in term-major order, and the
    queue's tie rule is order-independent — functions/topk.py).
    """
    max_doc = _combined_max_doc(index_dir)
    width = max_doc // n_shards + 1
    shards = [(s * width, min((s + 1) * width, max_doc + 1)) for s in range(n_shards)]

    # every shard pool consumes the query set; materialize it once so
    # n_shards branches share blocks instead of re-executing the source
    queries_ds = queries_ds.materialize()
    extra = {"num_cpus": num_cpus} if num_cpus is not None else {}
    branches = []
    for lo, hi in shards:
        branches.append(
            queries_ds.map_batches(
                Bm25Scorer,
                fn_constructor_kwargs={
                    "index_dir": index_dir,
                    "k": k,
                    "mode": mode,
                    "doc_range": (lo, hi),
                    **({"lang": lang} if lang is not None else {}),
                    **({"cache_size": cache_size} if cache_size else {}),
                    # valid under sharding: a doc's postings live
                    # entirely in its shard, so presence counts are
                    # complete per shard
                    **({"msm": msm} if msm is not None else {}),
                },
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=concurrency,
                **extra,
            )
            .select_columns(
                [
                    "query_id",
                    "doc_id",
                    "score",
                    "postings_scored",
                    "blocks_decoded",
                    "latency_us",
                    "actor_seq",
                ]
            )
            .map_batches(
                lambda b, tag=lo: b.append_column(
                    "shard", pa.array(np.full(b.num_rows, tag, dtype=np.int64))
                ),
                batch_format="pyarrow",
            )
        )

    def merge(group: pa.Table) -> pa.Table:
        qid = int(group["query_id"][0].as_py())
        heap = TopK(k)
        for d, s in zip(group["doc_id"].to_numpy(), group["score"].to_numpy()):
            heap.push_score(float(s), int(d))
        rows = heap.result()
        n = len(rows)
        # cost columns aggregate once per shard (every row of a shard
        # repeats that shard's per-query cost): work sums across shards,
        # latency is the slowest shard (they run concurrently)
        sh = group["shard"].to_numpy()
        _, first = np.unique(sh, return_index=True)  # one row per shard, any row order
        npost = int(group["postings_scored"].to_numpy()[first].sum())
        nblk = int(group["blocks_decoded"].to_numpy()[first].sum())
        lat = int(group["latency_us"].to_numpy().max()) if group.num_rows else 0
        seq = int(group["actor_seq"].to_numpy().max()) if group.num_rows else 0
        return pa.table(
            {
                "query_id": pa.array([qid] * n, type=pa.int64()),
                "rank": pa.array(np.arange(1, n + 1, dtype=np.int32), type=pa.int32()),
                "doc_id": pa.array([d for d, _ in rows], type=pa.int64()),
                "score": pa.array([s for _, s in rows], type=pa.float64()),
                "postings_scored": pa.array([npost] * n, type=pa.int64()),
                "blocks_decoded": pa.array([nblk] * n, type=pa.int64()),
                "latency_us": pa.array([lat] * n, type=pa.int64()),
                "actor_seq": pa.array([seq] * n, type=pa.int64()),
            }
        )

    u = branches[0].union(*branches[1:]) if len(branches) > 1 else branches[0]
    return u.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def bool_search(
    index_dir: str,
    bool_queries=None,
    *,
    k: int = 10,
    concurrency: int | tuple = 2,
    broadcast: bool = True,
):
    """DNF boolean queries as a Dataset pipeline: rows carry
    (query_id, groups as JSON); a scorer actor pool filters + ranks
    per :meth:`Bm25Scorer.score_bool`. Same long-format result schema
    (query_id, rank, doc_id, score) as the other serving paths."""
    import json as _json

    import ray.data as rd

    from .queryset import BOOL_QUERIES

    bool_queries = bool_queries if bool_queries is not None else BOOL_QUERIES
    items = [
        {"query_id": qid, "groups": _json.dumps(groups)} for qid, groups in bool_queries
    ]

    class BoolScorer(Bm25Scorer):
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
            for qid, gs in zip(batch["query_id"].to_pylist(), batch["groups"].to_pylist()):
                hits, _, _ = self.score_bool(_json.loads(gs))
                for rank, (doc_id, score) in enumerate(hits, start=1):
                    out["query_id"].append(qid)
                    out["rank"].append(rank)
                    out["doc_id"].append(doc_id)
                    out["score"].append(score)
            return pa.table(
                {
                    "query_id": pa.array(out["query_id"], type=pa.int64()),
                    "rank": pa.array(out["rank"], type=pa.int64()),
                    "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                    "score": pa.array(out["score"], type=pa.float64()),
                }
            )

    kwargs = {"k": k, "index_dir": index_dir}  # sidecar state (tombstones)
    if broadcast:
        kwargs["pack_ref"] = _pack_ref(index_dir)
    return rd.from_items(items).map_batches(
        BoolScorer,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def tree_search(
    index_dir: str,
    tree_queries=None,
    *,
    k: int = 10,
    concurrency: int | tuple = 2,
):
    """Nested boolean tree queries (arbitrary and/or/not nesting,
    phrase leaves) as a Dataset pipeline — the beyond-DNF surface of
    :func:`bool_search`. Trees ride as JSON rows; a reader-backed actor
    pool evaluates :meth:`Bm25Scorer.score_tree` (reader path: phrase
    leaves need the positions sidecar, never broadcast). Long-format
    result schema (query_id, rank, doc_id, score)."""
    import json as _json

    import ray.data as rd

    from .queryset import TREE_QUERIES

    tree_queries = tree_queries if tree_queries is not None else TREE_QUERIES
    items = [{"query_id": qid, "tree": _json.dumps(t)} for qid, t in tree_queries]

    class TreeScorer(Bm25Scorer):
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
            for qid, tr in zip(batch["query_id"].to_pylist(), batch["tree"].to_pylist()):
                hits, _, _ = self.score_tree(_json.loads(tr))
                for rank, (doc_id, score) in enumerate(hits, start=1):
                    out["query_id"].append(qid)
                    out["rank"].append(rank)
                    out["doc_id"].append(doc_id)
                    out["score"].append(score)
            return pa.table(
                {
                    "query_id": pa.array(out["query_id"], type=pa.int64()),
                    "rank": pa.array(out["rank"], type=pa.int64()),
                    "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                    "score": pa.array(out["score"], type=pa.float64()),
                }
            )

    return rd.from_items(items).map_batches(
        TreeScorer,
        fn_constructor_kwargs={"index_dir": index_dir, "k": k},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def phrase_search(
    index_dir: str,
    k: int = 10,
    queries=None,
    *,
    concurrency: int | tuple = 2,
    batch_size: int = 64,
):
    """Phrase top-k BM25 off the POSITIONAL index alone: a doc matches
    when the tokenized phrase appears contiguously in its token stream
    (layout-v4 positions sidecar, :meth:`Bm25Scorer._score_phrase`);
    matching docs score with the standard BM25 sum over the phrase's
    distinct terms — rank- and score-identical to the corpus-scan
    reference (:func:`phrase_search_scan`, kept for v3/position-free
    indexes), proven in tests.

    No corpus access by construction — the signature takes only the
    index. Phrase cost scales with the phrase terms' posting lengths,
    not the corpus byte count (the round-2 verdict's one remaining
    unshippable-at-scale query mode, fixed). The reference's
    contiguous-subsequence machinery is its string-distance family
    (``/root/reference/src/dist/seqs.jl:60-95``); here the contiguity
    test is a positional-postings key intersection instead of a scan.
    """
    import ray.data as rd

    from .queryset import REFERENCE_QUERIES

    queries = queries if queries is not None else REFERENCE_QUERIES
    qds = rd.from_items([{"query_id": qid, "text": t} for qid, t in queries])
    return search(
        qds,
        index_dir,
        k=k,
        mode="phrase",
        concurrency=concurrency,
        batch_size=batch_size,
    ).select_columns(["query_id", "rank", "doc_id", "score"])


def near_search(
    index_dir: str,
    k: int = 10,
    queries=None,
    *,
    concurrency: int | tuple = 2,
    batch_size: int = 64,
):
    """Proximity (unordered slop) top-k BM25 off the positional index:
    ``"t1 t2 ~W"`` matches docs where one position per distinct term
    fits a ``W``-wide window (``max−min ≤ W``, Lucene SpanNearQuery
    unordered); matching docs score with the standard BM25 sum over
    the distinct terms. Index-only like :func:`phrase_search` — the
    corpus is never read; cost scales with the terms' occurrence
    counts, not corpus bytes (``Bm25Scorer._near_candidates``)."""
    import ray.data as rd

    from .queryset import NEAR_QUERIES

    queries = queries if queries is not None else NEAR_QUERIES
    qds = rd.from_items([{"query_id": qid, "text": t} for qid, t in queries])
    return search(
        qds,
        index_dir,
        k=k,
        mode="near",
        concurrency=concurrency,
        batch_size=batch_size,
    ).select_columns(["query_id", "rank", "doc_id", "score"])


def spannear_search(
    index_dir: str,
    k: int = 10,
    queries=None,
    *,
    concurrency: int | tuple = 2,
    batch_size: int = 64,
):
    """ORDERED proximity top-k BM25 (Lucene SpanNearQuery
    ``in_order=true``): ``"t1 t2 ~W"`` matches docs where the token
    sequence appears at strictly increasing positions with
    ``last − first ≤ W``; ranking is the shared BM25 contract over the
    distinct terms. Index-only; cost ∝ occurrence counts
    (``Bm25Scorer._ordered_near_candidates`` greedy chain)."""
    import ray.data as rd

    from .queryset import SPANNEAR_QUERIES

    queries = queries if queries is not None else SPANNEAR_QUERIES
    qds = rd.from_items([{"query_id": qid, "text": t} for qid, t in queries])
    return search(
        qds,
        index_dir,
        k=k,
        mode="spannear",
        concurrency=concurrency,
        batch_size=batch_size,
    ).select_columns(["query_id", "rank", "doc_id", "score"])


class MultiFieldScorer:
    """Weighted multi-field BM25 (Lucene ``MultiFieldQueryParser`` /
    per-field BooleanQuery semantics): each field carries its OWN
    index (own N, avgdl, df), a query scores ``Σ_f w_f · BM25_f(doc)``
    over the union of per-field matches. This is the sum-of-fields
    member of the BM25F family (true BM25F folds weights into tf
    before saturation — Robertson/Zaragoza §BM25F); the sum form is
    what a per-field index substrate expresses exactly and what the
    DuckDB oracle mirrors term for term.

    One actor holds one reader per field — the same pinned-state shape
    as :class:`Bm25Scorer`, doubled."""

    def __init__(
        self,
        field_dirs: dict[str, str],
        weights: dict[str, float],
        k: int = 10,
    ):
        self.k = k
        self.fields = sorted(field_dirs)  # deterministic combine order
        self.weights = {f: float(weights.get(f, 1.0)) for f in self.fields}
        self.scorers = {
            f: Bm25Scorer(field_dirs[f], k=k, mode="exhaustive")
            for f in self.fields
        }

    def score_query(self, text: str):
        per_field: list[tuple[float, np.ndarray, np.ndarray]] = []
        npost = 0
        for f in self.fields:
            sc = self.scorers[f]
            terms = sc._query_terms(text)
            if not terms:
                continue
            uniq, scores, np_f, _ = sc._accumulate_query(terms)
            npost += np_f
            per_field.append((self.weights[f], uniq, scores))
        if not per_field:
            return [], 0, 0
        union = per_field[0][1]
        for _, u, _s in per_field[1:]:
            union = np.union1d(union, u)
        total = np.zeros(len(union), dtype=np.float64)
        # fixed field order; w·s + 0.0 for absent docs — the same
        # multiply/add sequence the oracle's COALESCE sum evaluates
        for w, u, s in per_field:
            pos, valid = in_sorted(u, union)
            total += np.where(valid, w * s[pos], 0.0)
        idx = topk_indices(total, union, self.k)
        return (
            [(int(union[j]), float(total[j])) for j in idx],
            int(npost),
            len(per_field),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["query_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out_q, out_r, out_d, out_s = [], [], [], []
        for qid, text in zip(qids, texts):
            hits, _, _ = self.score_query(text)
            out_q.extend([qid] * len(hits))
            out_r.extend(range(1, len(hits) + 1))
            out_d.extend(d for d, _ in hits)
            out_s.extend(s for _, s in hits)
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "rank": pa.array(out_r, type=pa.int64()),
                "doc_id": pa.array(out_d, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )


def multifield_search(
    field_dirs: dict[str, str],
    weights: dict[str, float],
    k: int = 10,
    queries=None,
    *,
    concurrency: int | tuple = 2,
    batch_size: int = 64,
):
    """Multi-field weighted BM25 top-k over per-field indexes (body +
    title by default in the driver entry). Queries → actor pool of
    :class:`MultiFieldScorer` (each actor pins every field's reader
    once) → long results. At scale the per-field indexes shard
    identically by doc range, so field-sharded serving composes with
    the doc-sharded pool exactly like single-field serving."""
    import ray.data as rd

    from .queryset import REFERENCE_QUERIES

    queries = queries if queries is not None else REFERENCE_QUERIES
    qds = rd.from_items([{"query_id": qid, "text": t} for qid, t in queries])
    if not isinstance(concurrency, tuple):
        qds = qds.repartition(
            concurrency if isinstance(concurrency, int) else 2
        )
    return qds.map_batches(
        MultiFieldScorer,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        fn_constructor_kwargs={
            "field_dirs": field_dirs,
            "weights": weights,
            "k": k,
        },
    )


class Bm25FScorer:
    """TRUE BM25F (Robertson & Zaragoza, "simple BM25F"): field weights
    fold into the term frequency BEFORE saturation —

        tf̃(t,d) = Σ_f  w_f · tf_f(t,d) / B_f(d),
        B_f(d)  = (1 − b) + b · dl_f(d)/avgdl_f,
        score(d) = Σ_t  idf(df_∪(t)) · tf̃·(k1+1) / (tf̃ + k1)

    vs :class:`MultiFieldScorer`'s Σ_f w_f·BM25_f, which saturates each
    field separately. ``df_∪(t)`` is the DOCUMENT frequency over the
    union of fields (a doc counts once if any field contains t) and
    idf/N are shared across fields — the reference formulation's
    "document as one bag with boosted zones". Same per-field index
    substrate as MultiFieldScorer (the reference's per-zone posting
    decomposition); only the combination math differs.
    """

    def __init__(
        self,
        field_dirs: dict[str, str],
        weights: dict[str, float],
        k: int = 10,
        params: Bm25Params | None = None,
        field_b: dict[str, float] | None = None,
    ):
        from ..functions.bm25 import idf as _idf

        self._idf = _idf
        self.k = k
        self.fields = sorted(field_dirs)  # deterministic combine order
        self.weights = {f: float(weights.get(f, 1.0)) for f in self.fields}
        self.readers = {f: IndexReader(field_dirs[f]) for f in self.fields}
        ns = {self.readers[f].n_docs for f in self.fields}
        if len(ns) != 1:
            raise ValueError(f"BM25F fields must index the same corpus (n_docs {ns})")
        self.n_docs = ns.pop()
        st = self.readers[self.fields[0]].stats
        self.params = params or Bm25Params(k1=st["k1"], b=st["b"])
        # per-field length-normalization strength (Robertson/Zaragoza's
        # b_f — short structured fields typically want lower b); absent
        # fields inherit the shared b, which is also what keeps the
        # driver entry oracle-expressible with one CTE shape per field
        self.field_b = {
            f: float((field_b or {}).get(f, self.params.b)) for f in self.fields
        }
        self.heap = TopK(k)

    def score_query(self, text: str):
        p = self.params
        toks = sorted(
            {t for t in tokenize(text) if any(t in self.readers[f] for f in self.fields)}
        )
        if not toks:
            return [], 0, 0
        ids_l, contrib_l = [], []
        npost = 0
        for t in toks:
            per_field = []
            for f in self.fields:
                rdr = self.readers[f]
                ids, tfs, dls = rdr.postings_cached(t)
                if len(ids) == 0:
                    continue
                # w_f · tf / B_f — weight inside the normalized tf
                b_f = self.field_b[f]
                bf = (1.0 - b_f) + b_f * dls.astype(np.float64) / rdr.avgdl
                per_field.append((ids, self.weights[f] * tfs.astype(np.float64) / bf))
                npost += len(ids)
            if len(per_field) == 1:
                union, tfde = per_field[0]
            else:
                union = per_field[0][0]
                for ids, _ in per_field[1:]:
                    union = np.union1d(union, ids)
                tfde = np.zeros(len(union), dtype=np.float64)
                # fixed sorted-field order = the oracle's expression order
                for ids, w_tf in per_field:
                    pos, valid = in_sorted(ids, union)
                    tfde += np.where(valid, w_tf[pos], 0.0)
            w = float(self._idf(len(union), self.n_docs))  # df over the field union
            ids_l.append(union)
            contrib_l.append(w * tfde * (p.k1 + 1.0) / (tfde + p.k1))
        uniq, scores = _accumulate(ids_l, contrib_l)
        idx = topk_indices(scores, uniq, self.k)
        return (
            [(int(uniq[j]), float(scores[j])) for j in idx],
            int(npost),
            len(toks),
        )

    __call__ = MultiFieldScorer.__call__


def bm25f_search(
    field_dirs: dict[str, str],
    weights: dict[str, float],
    k: int = 10,
    queries=None,
    *,
    field_b: dict[str, float] | None = None,
    concurrency: int | tuple = 2,
    batch_size: int = 64,
):
    """True-BM25F top-k over per-field indexes (see :class:`Bm25FScorer`).
    Same actor-pool / sharding shape as :func:`multifield_search`."""
    import ray.data as rd

    from .queryset import REFERENCE_QUERIES

    queries = queries if queries is not None else REFERENCE_QUERIES
    qds = rd.from_items([{"query_id": qid, "text": t} for qid, t in queries])
    if not isinstance(concurrency, tuple):
        qds = qds.repartition(concurrency if isinstance(concurrency, int) else 2)
    return qds.map_batches(
        Bm25FScorer,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        fn_constructor_kwargs={
            "field_dirs": field_dirs,
            "weights": weights,
            "k": k,
            "field_b": field_b,
        },
    )


def paged_search(
    index_dir: str,
    k: int = 10,
    n_pages: int = 2,
    queries=None,
    *,
    mode: str = "exhaustive",
    concurrency: int | tuple = 2,
):
    """Deep pagination via search_after cursors (Lucene
    ``IndexSearcher.searchAfter``): page 1 is the standard top-k; each
    further page re-queries with the previous page's last ``(score,
    doc_id)`` as an exclusive cursor — no offset-sized accumulation
    ever happens, so page N costs the same as page 1 (the
    deep-pagination property). Queries that exhaust their results drop
    out of later pages. Returns all pages concatenated with GLOBAL
    ranks (page·k + local rank)."""
    import pandas as pd
    import ray.data as rd

    from .queryset import REFERENCE_QUERIES

    queries = queries if queries is not None else REFERENCE_QUERIES
    cols = ["query_id", "rank", "doc_id", "score"]
    text_of = dict(queries)
    qds = rd.from_items([{"query_id": q, "text": t} for q, t in queries])
    page = (
        search(qds, index_dir, k=k, mode=mode, concurrency=concurrency)
        .select_columns(cols)
        .to_pandas()
    )
    pages = [page]
    for pno in range(1, n_pages):
        # only FULL previous pages continue; the previous page's last
        # global rank is pno*k (local rank k shifted by its page index)
        full = pages[-1][pages[-1]["rank"] == pno * k]
        if not len(full):
            break
        items = [
            {
                "query_id": int(r.query_id),
                "text": text_of[int(r.query_id)],
                "after_score": float(r.score),
                "after_doc": int(r.doc_id),
            }
            for r in full.itertuples(index=False)
        ]
        nxt = (
            search(
                rd.from_items(items),
                index_dir,
                k=k,
                mode=mode,
                concurrency=concurrency,
            )
            .select_columns(cols)
            .to_pandas()
        )
        nxt["rank"] = nxt["rank"] + pno * k
        pages.append(nxt)
    out = pd.concat(pages, ignore_index=True)
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


MLT_SEEDS: list[tuple[int, int]] = [
    # (query_id, seed doc_id) — fixed, valid at every scale factor
    # (≥500 docs); 10**9 pins the unknown-seed → empty contract
    (0, 0),
    (1, 7),
    (2, 42),
    (3, 123),
    (4, 250),
    (5, 499),
    (6, 10**9),
]


def more_like_this(
    sf_dir: str,
    index_dir: str,
    seeds: list[tuple[int, int]] | None = None,
    *,
    n_terms: int = 10,
    k: int = 10,
    concurrency: int | tuple = 2,
):
    """Lucene-MoreLikeThis: each seed doc's top ``n_terms`` terms by
    tf·idf become a BM25 disjunction; the seed itself is excluded from
    its results. Term selection ranks by ``(round6(tf·idf) desc, term
    asc)`` — rounded on BOTH engine and oracle sides so the hard
    selection threshold can't flip on a last-bit ln() difference.

    Scale shape: the seed docs are a FILTERED PUSHDOWN read (row-group
    pruning on doc_id — O(seeds), never a corpus scan); df/idf come
    from the index's metadata projection (no posting decode); the
    disjunction then serves on the standard pruned path. The k+1 →
    drop-seed → re-rank trim happens on the driver over the top-k
    result set only (queries × (k+1) rows)."""
    import pyarrow.parquet as _pq

    from ..functions.rounding import round6
    from ..functions.text import tokenize as _tok

    seeds = seeds if seeds is not None else MLT_SEEDS
    seed_ids = sorted({d for _, d in seeds})
    tbl = _pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filters=[("doc_id", "in", seed_ids)],
    )
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    # metadata-only reader: df + stats, no posting runs constructed
    rdr = IndexReader(index_dir, doc_range=(0, 0))
    items = []
    seed_of = {}
    for qid, seed in seeds:
        if seed not in texts:
            continue  # unknown seed → no result rows
        from collections import Counter

        tf = Counter(_tok(texts[seed]))
        scored = [
            (-round6(np.float64(c) * rdr.idf(t)), t)
            for t, c in tf.items()
            if rdr.df(t) > 0
        ]
        scored.sort()
        terms = [t for _, t in scored[:n_terms]]
        if not terms:
            continue
        seed_of[qid] = seed
        items.append({"query_id": qid, "text": " ".join(terms)})
    import pandas as pd
    import ray.data as rd

    cols = ["query_id", "rank", "doc_id", "score"]
    if not items:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols}).astype(
            {"score": "float64"}
        )
    res = (
        search(
            rd.from_items(items),
            index_dir,
            k=k + 1,
            mode="wand",
            concurrency=concurrency,
        )
        .select_columns(cols)
        .to_pandas()
    )
    res = res[res["doc_id"] != res["query_id"].map(seed_of)]
    res = res.sort_values(["query_id", "rank"]).reset_index(drop=True)
    res["rank"] = res.groupby("query_id").cumcount() + 1
    return res[res["rank"] <= k].reset_index(drop=True)


def phrase_search_scan(sf_dir: str, index_dir: str, k: int = 10, queries=None):
    """Corpus-scan phrase top-k — the fallback for indexes built with
    ``with_positions=False``: one stream over the documents for ALL
    queries (the phrase list + the phrase terms' idf/avgdl broadcast;
    each batch tokenizes its docs and substring-matches the
    space-joined token string). Kept as the position-free path and as
    the independent implementation the positional path is tested
    against.
    """
    import ray
    import ray.data as rd

    from .queryset import REFERENCE_QUERIES

    queries = queries if queries is not None else REFERENCE_QUERIES
    # metadata-only reader: doc_range (0, 0) loads stats + the (term,
    # df) projection but constructs no posting runs
    rdr = IndexReader(index_dir, doc_range=(0, 0))
    p = Bm25Params(k1=rdr.stats["k1"], b=rdr.stats["b"])
    phrases = []
    idf_map = {}
    for qid, text in queries:
        toks = tokenize(text)
        if not toks:
            continue
        pat = " " + " ".join(toks) + " "
        terms = sorted(set(toks))
        phrases.append((qid, pat, terms))
        for t in terms:
            if t not in idf_map and rdr.df(t) > 0:
                idf_map[t] = rdr.idf(t)
    bref = ray.put((phrases, idf_map, rdr.avgdl, p))

    def match_batch(batch: pa.Table) -> pa.Table:
        from collections import Counter

        phr, idfs, avgdl, params = ray.get(bref)
        out_q, out_d, out_s = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = tokenize(text)
            joined = " " + " ".join(toks) + " "
            c = None
            for qid, pat, terms in phr:
                if pat not in joined:
                    continue
                if c is None:
                    c = Counter(toks)
                score = 0.0  # term-major adds, same order as the oracle sum
                for t in terms:
                    score += idfs[t] * float(
                        tf_norm(np.array([c[t]]), np.array([len(toks)]), avgdl, params)[0]
                    )
                out_q.append(qid)
                out_d.append(doc_id)
                out_s.append(score)
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "doc_id": pa.array(out_d, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        qid = int(group["query_id"][0].as_py())
        heap = TopK(k)
        for d, s in zip(group["doc_id"].to_numpy(), group["score"].to_numpy()):
            heap.push_score(float(s), int(d))
        rows = heap.result()
        return pa.table(
            {
                "query_id": pa.array([qid] * len(rows), type=pa.int64()),
                "rank": pa.array(np.arange(1, len(rows) + 1, dtype=np.int32), type=pa.int32()),
                "doc_id": pa.array([d for d, _ in rows], type=pa.int64()),
                "score": pa.array([s for _, s in rows], type=pa.float64()),
            }
        )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return (
        docs.map_batches(match_batch, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge, batch_format="pyarrow")
    )


def search_to_parquet(
    queries_ds,
    index_dir: str,
    out_dir: str,
    **search_kwargs,
) -> str:
    """Results sink (SURVEY.md §2.1 "results out"): stream search
    results to a partitioned parquet directory — never one giant file,
    never a driver materialization."""
    search(queries_ds, index_dir, **search_kwargs).write_parquet(out_dir, compression="zstd")
    return out_dir


def to_padded(result_rows, k: int):
    """Reshape long-format results into the reference's output shape:
    one row per query with a fixed-size hits list, zero-struct padding
    for queries with fewer than k hits (``zeros(IdDist, k, m)`` with
    id=0 sentinel, ``/root/reference/src/SimilaritySearch.jl:142-147``;
    our sentinel is doc_id=-1 since 0 is a valid doc)."""
    import pandas as pd

    df = result_rows if isinstance(result_rows, pd.DataFrame) else result_rows.to_pandas()
    out = {"query_id": [], "hits": []}
    for qid, g in df.groupby("query_id"):
        g = g.sort_values("rank")
        hits = [
            {"doc_id": int(d), "score": float(s)}
            for d, s in zip(g["doc_id"], g["score"])
        ][:k]
        hits += [{"doc_id": -1, "score": 0.0}] * (k - len(hits))
        out["query_id"].append(int(qid))
        out["hits"].append(hits)
    return pd.DataFrame(out)


def brute_force_topk(
    texts_by_doc: dict[int, str],
    queries: list[tuple[int, str]],
    k: int,
    params: Bm25Params = DEFAULT_BM25,
) -> list[tuple[int, int, int, float]]:
    """Index-free gold oracle (the ``ExhaustiveSearch`` analog): score
    straight from raw texts with the shared kernels + TopK. Test-scale
    only — used to assert rank-identity of both index modes.

    Returns rows (query_id, rank, doc_id, score).
    """
    from collections import Counter

    n_docs = len(texts_by_doc)
    tf: dict[str, dict[int, int]] = {}
    dl: dict[int, int] = {}
    for doc_id, text in texts_by_doc.items():
        toks = tokenize(text)
        dl[doc_id] = len(toks)
        for t, c in Counter(toks).items():
            tf.setdefault(t, {})[doc_id] = c
    avgdl = sum(dl.values()) / max(1, n_docs)
    from ..functions.bm25 import term_scores

    rows = []
    for qid, qtext in queries:
        terms = sorted({t for t in tokenize(qtext) if t in tf})
        heap = TopK(k)
        ids_l, part_l = [], []
        for t in terms:
            posting = tf[t]
            ids = np.fromiter(sorted(posting), dtype=np.int64, count=len(posting))
            tfs = np.fromiter((posting[i] for i in ids), dtype=np.int64, count=len(ids))
            dls = np.fromiter((dl[i] for i in ids), dtype=np.int64, count=len(ids))
            ids_l.append(ids)
            part_l.append(term_scores(tfs, dls, len(posting), n_docs, avgdl, params))
        if ids_l:
            uniq, scores = _accumulate(ids_l, part_l)
            for s, d in zip(scores, uniq):
                heap.push_score(float(s), int(d))
        for rank, (doc_id, score) in enumerate(heap.result(), start=1):
            rows.append((qid, rank, doc_id, score))
    return rows
