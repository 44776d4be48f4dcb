"""Deduplication pipelines (SURVEY.md §2.6 ``neardup`` re-expressed +
the training-data dedup suite the task brief requires).

The reference's ``neardup`` (``/root/reference/src/neardup.jl:40-192``)
is a sequential center-accretion ϵ-dedup whose exact trajectory is
order-dependent; its documented *contract* (docstring
``src/neardup.jl:9-17``) is the cover property — every dropped item
lies within ϵ of a kept item. These pipelines port the contract:

* :func:`exact_dedup` — identical-text groups, keep min doc_id
  (hash-partitioned groupby; deterministic, fully SQL-oracled).
* :func:`ngram_jaccard_pairs` — EXACT all pairs with token-shingle
  Jaccard ≥ τ, via an inverted shingle index (pairs sharing ≥1 shingle
  are a superset of pairs with J > 0, so no candidate is missed).
  Fully SQL-oracled.
* :func:`minhash_lsh_pairs` — MinHash(64)/LSH(8×8 bands) candidates,
  exactly verified; precision 1.0 by construction, recall probabilistic
  (rows-only driver check + recall property test).
* :func:`simhash_pairs` — 64-bit SimHash, hamming ≤ h candidates via
  (h+1)-band pigeonhole banding → EXACT w.r.t. the simhash distance.
* :func:`embedding_neardup_pairs` — exact cosine ≥ τ pairs over the
  embeddings table (broadcast matrix; the brute-force scale baseline).

Scale notes (100 TB): every op here shuffles only (key, doc_id) rows
after in-batch aggregation; frequent-shingle pruning (``max_df``)
bounds the pair blowup of hot shingles the same way head-term salting
bounds posting groups.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.hashing import (
    MINHASH_BANDS,
    MINHASH_PERMS,
    minhash_signature,
    popcount64,
    shingle_hashes,
    simhash64,
)
from ..functions.text import tokenize
from ..functions.rounding import round6

__all__ = [
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "embedding_neardup_pairs",
    "dedup_clusters",
]


def _documents(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


# ---------------------------------------------------------------------------
def exact_dedup(sf_dir: str):
    """(keeper_doc_id, group_size) per distinct text; keeper = min id.

    The shuffle key is a VECTORIZED 128-bit content hash (two
    independently-seeded 64-bit xxhash passes over the text column —
    polars' native kernel, no per-row Python): 16 B/doc moves through
    the groupby instead of the text, and collision probability at 10¹²
    docs is ~10⁻¹⁵. Only (keeper, size) leaves the group, so the hash
    never appears in the result — the DuckDB oracle groups by raw text.
    """

    def key_batch(batch: pa.Table) -> pa.Table:
        import polars as pl

        s = pl.from_arrow(batch["text"].combine_chunks())
        h1 = s.hash(seed=0x9E3779B9).to_numpy().view(np.int64)
        h2 = s.hash(seed=0x85EBCA6B).to_numpy().view(np.int64)
        return pa.table(
            {
                "h1": pa.array(h1, type=pa.int64()),
                "h2": pa.array(h2, type=pa.int64()),
                "doc_id": batch["doc_id"],
            }
        )

    def keep_first(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy()
        return pa.table(
            {
                "keeper_doc_id": pa.array([int(ids.min())], type=pa.int64()),
                "group_size": pa.array([len(ids)], type=pa.int64()),
            }
        )

    return (
        _documents(sf_dir)
        .map_batches(key_batch, batch_format="pyarrow")
        .groupby(["h1", "h2"])
        .map_groups(keep_first, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
def _shingle_rows(batch: pa.Table, n: int) -> pa.Table:
    ids_out, sh_out, size_out = [], [], []
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        sh = shingle_hashes(tokenize(text), n=n)
        ids_out.append(np.full(len(sh), doc_id, dtype=np.int64))
        sh_out.append(sh.astype(np.int64))  # parquet-friendly signed view
        size_out.append(np.full(len(sh), len(sh), dtype=np.int64))
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(ids_out) if ids_out else [], type=pa.int64()),
            "shingle": pa.array(np.concatenate(sh_out) if sh_out else [], type=pa.int64()),
            "set_size": pa.array(np.concatenate(size_out) if size_out else [], type=pa.int64()),
        }
    )


def ngram_jaccard_pairs(sf_dir: str, tau: float = 0.5, n: int = 3, max_df: int | None = 256):
    """Pairs (doc_a < doc_b, jaccard ≥ τ) over token n-gram sets.

    inverted shingle index → per-shingle pair emission → pair-count
    groupby = |A∩B| → J = inter / (|A| + |B| − inter).

    ``max_df`` bounds per-shingle pair emission at O(max_df²) rows —
    without it one hot shingle (boilerplate n-gram shared by df docs)
    emits df² pair rows, quadratic in the corpus at web scale. The
    DEFAULT is therefore bounded; shingles above it are dropped from
    candidate generation (near-dup pairs share many shingles, so a pair
    is only lost if ALL its shared shingles are hot — and its measured
    intersection can undercount, making τ conservative). Pass
    ``max_df=None`` for the EXACT mode — the DuckDB-oracle entry in
    ``__ray_entry__`` pins that, production dedup should not.
    """

    def pairs_of_group(group: pa.Table) -> pa.Table:
        ids = np.sort(group["doc_id"].to_numpy())
        sizes = dict(zip(group["doc_id"].to_numpy().tolist(), group["set_size"].to_numpy().tolist()))
        if max_df is not None and len(ids) > max_df:
            return pa.table(
                {"doc_a": pa.array([], type=pa.int64()), "doc_b": pa.array([], type=pa.int64()),
                 "size_a": pa.array([], type=pa.int64()), "size_b": pa.array([], type=pa.int64())}
            )
        a_idx, b_idx = np.triu_indices(len(ids), k=1)
        return pa.table(
            {
                "doc_a": pa.array(ids[a_idx], type=pa.int64()),
                "doc_b": pa.array(ids[b_idx], type=pa.int64()),
                "size_a": pa.array([sizes[int(i)] for i in ids[a_idx]], type=pa.int64()),
                "size_b": pa.array([sizes[int(i)] for i in ids[b_idx]], type=pa.int64()),
            }
        )

    def preagg_pairs(batch: pa.Table) -> pa.Table:
        """In-batch combiner: collapse per-shingle pair rows into one
        row per pair with a partial intersection count, so the final
        pair shuffle moves one row per (pair, batch) instead of one
        per co-occurring shingle (the pre-aggregate-before-groupby
        rule, SURVEY.md §2.7)."""
        if batch.num_rows == 0:
            return batch.append_column("inter_partial", pa.array([], type=pa.int64()))
        a = batch["doc_a"].to_numpy()
        b = batch["doc_b"].to_numpy()
        order = np.lexsort((b, a))
        a_s, b_s = a[order], b[order]
        bounds = np.flatnonzero(
            np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1]), True]
        )
        firsts = order[bounds[:-1]]
        return pa.table(
            {
                "doc_a": pa.array(a[firsts], type=pa.int64()),
                "doc_b": pa.array(b[firsts], type=pa.int64()),
                "size_a": pa.array(batch["size_a"].to_numpy()[firsts], type=pa.int64()),
                "size_b": pa.array(batch["size_b"].to_numpy()[firsts], type=pa.int64()),
                "inter_partial": pa.array(np.diff(bounds), type=pa.int64()),
            }
        )

    def jaccard_of_group(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        inter = int(pc.sum(group["inter_partial"]).as_py())
        sa = int(group["size_a"][0].as_py())
        sb = int(group["size_b"][0].as_py())
        j = inter / (sa + sb - inter)
        if j < tau:
            return pa.table({"doc_a": pa.array([], type=pa.int64()),
                             "doc_b": pa.array([], type=pa.int64()),
                             "jaccard": pa.array([], type=pa.float64())})
        return pa.table(
            {
                "doc_a": pa.array([int(group["doc_a"][0].as_py())], type=pa.int64()),
                "doc_b": pa.array([int(group["doc_b"][0].as_py())], type=pa.int64()),
                "jaccard": pa.array([round6(j)], type=pa.float64()),
            }
        )

    def add_pair_key(batch: pa.Table) -> pa.Table:
        key = [f"{a}_{b}" for a, b in zip(batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist())]
        return batch.append_column("pair", pa.array(key))

    ds = _documents(sf_dir).map_batches(
        lambda b: _shingle_rows(b, n), batch_format="pyarrow"
    )
    return (
        ds.groupby("shingle")
        .map_groups(pairs_of_group, batch_format="pyarrow")
        .map_batches(preagg_pairs, batch_format="pyarrow")
        .map_batches(add_pair_key, batch_format="pyarrow")
        .groupby("pair")
        .map_groups(jaccard_of_group, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
def minhash_lsh_pairs(sf_dir: str, tau: float = 0.5, n: int = 3, bands: int = MINHASH_BANDS):
    """MinHash/LSH near-dup: banded signature groupby → exact-Jaccard
    verify. Precision 1.0 (every emitted pair is verified); recall is
    the LSH S-curve at (64 perms, ``bands`` bands × 64/bands rows) —
    tunable via tune.tune_minhash (the reference's optimize_index!
    pattern applied to the LSH operating point)."""
    if MINHASH_PERMS % bands:
        raise ValueError(f"bands must divide {MINHASH_PERMS}")
    rows_per_band = MINHASH_PERMS // bands

    def sig_rows(batch: pa.Table) -> pa.Table:
        out = {"band_key": [], "doc_id": []}
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sh = shingle_hashes(tokenize(text), n=n)
            sig = minhash_signature(sh)
            for b in range(bands):
                band = sig[b * rows_per_band : (b + 1) * rows_per_band]
                key = f"{b}:" + hashlib.md5(band.tobytes()).hexdigest()[:16]
                out["band_key"].append(key)
                out["doc_id"].append(doc_id)
        return pa.table(
            {"band_key": pa.array(out["band_key"]), "doc_id": pa.array(out["doc_id"], type=pa.int64())}
        )

    def candidates(group: pa.Table) -> pa.Table:
        ids = np.unique(group["doc_id"].to_numpy())
        a, b = np.triu_indices(len(ids), k=1)
        return pa.table(
            {"doc_a": pa.array(ids[a], type=pa.int64()), "doc_b": pa.array(ids[b], type=pa.int64())}
        )

    cand = (
        _documents(sf_dir)
        .map_batches(sig_rows, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(candidates, batch_format="pyarrow")
    )

    # Exact verify as a CO-PARTITIONED JOIN on doc_id — no whole-corpus
    # broadcast anywhere: (1) distinct candidate pairs fan out to two
    # membership rows each; (2) membership rows union with the long
    # (doc_id, shingle) table and co-group by doc_id, attaching each
    # doc's shingle set to every pair it participates in; (3) a final
    # groupby(pair) holds exactly the two sets it needs and computes
    # the exact Jaccard. Shuffle volume is bounded by the shingle table
    # plus candidate-pair fanout — the 100 TB join shape.
    def dedup_pairs(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    def add_pair_key(batch: pa.Table) -> pa.Table:
        key = [f"{a}_{b}" for a, b in zip(batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist())]
        return batch.append_column("pair", pa.array(key))

    distinct_pairs = (
        cand.map_batches(add_pair_key, batch_format="pyarrow")
        .groupby("pair")
        .map_groups(dedup_pairs, batch_format="pyarrow")
    )

    def memberships(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy()
        b = batch["doc_b"].to_numpy()
        pairs = batch["pair"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "shingle": pa.array([None] * (2 * len(pairs)), type=pa.int64()),
                "pair": pa.array(pairs + pairs),
            }
        )

    def shingle_side(batch: pa.Table) -> pa.Table:
        t = _shingle_rows(batch, n)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "shingle": t["shingle"],
                "pair": pa.array([None] * t.num_rows, type=pa.string()),
            }
        )

    joined = distinct_pairs.map_batches(memberships, batch_format="pyarrow").union(
        _documents(sf_dir).map_batches(shingle_side, batch_format="pyarrow")
    )

    def attach_set(group: pa.Table) -> pa.Table:
        pair_col = group["pair"].to_pylist()
        doc_id = int(group["doc_id"][0].as_py())
        sh = group["shingle"].drop_null().to_numpy(zero_copy_only=False)
        shingles = np.sort(sh.astype(np.int64))
        pairs = [q for q in pair_col if q is not None]
        return pa.table(
            {
                "pair": pa.array(pairs),
                "doc_id": pa.array([doc_id] * len(pairs), type=pa.int64()),
                "shingles": pa.array([shingles.tolist()] * len(pairs), type=pa.list_(pa.int64())),
            }
        )

    def verify_pair(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_a": pa.array([], type=pa.int64()),
             "doc_b": pa.array([], type=pa.int64()),
             "jaccard": pa.array([], type=pa.float64())}
        )
        if group.num_rows != 2:
            return empty  # a candidate doc with no shingles cannot verify
        docs = group["doc_id"].to_numpy()
        order = np.argsort(docs)
        sa = np.asarray(group["shingles"][int(order[0])].as_py(), dtype=np.int64)
        sb = np.asarray(group["shingles"][int(order[1])].as_py(), dtype=np.int64)
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        j = inter / union if union else 0.0
        if j < tau:
            return empty
        return pa.table(
            {
                "doc_a": pa.array([int(docs[order[0]])], type=pa.int64()),
                "doc_b": pa.array([int(docs[order[1]])], type=pa.int64()),
                "jaccard": pa.array([round6(j)], type=pa.float64()),
            }
        )

    return (
        joined.groupby("doc_id")
        .map_groups(attach_set, batch_format="pyarrow")
        .groupby("pair")
        .map_groups(verify_pair, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
def dedup_clusters(
    sf_dir: str,
    tau: float = 0.5,
    n: int = 3,
    max_rounds: int = 50,
    edge_source: str = "minhash",
    max_df: int | None = 256,
    edges=None,
):
    """Connected-components grouping of the verified near-dup pair
    graph — the operator a training-data pipeline actually runs:
    "keep one doc per duplicate *cluster*", not pairs. Returns one row
    per document: (doc_id, keeper_doc_id) where keeper is the minimum
    doc_id reachable through Jaccard ≥ τ edges (singletons keep
    themselves).

    ``edge_source`` picks the pair generator: ``"minhash"`` (default —
    :func:`minhash_lsh_pairs`, the bounded production path: banded LSH
    candidates, exact verify, never quadratic in a hot shingle) or
    ``"ngram"`` (:func:`ngram_jaccard_pairs` with ``max_df``;
    ``max_df=None`` is the exact mode the DuckDB recursive-CTE oracle
    pins). ``edges`` overrides both with a caller-supplied Dataset of
    ``doc_a``/``doc_b`` rows (any near-dup generator — simhash,
    embedding-cosine — plugs in).

    Distributed min-label propagation over Ray Data (the classic
    BSP/Pregel shape): each round co-groups the label table with the
    edge list on node id, every edge forwards its endpoint's current
    label to the other endpoint, and a ``groupby(node).min`` takes the
    new label. Labels only decrease, so Σlabels is strictly decreasing
    while anything changes — convergence is detected with a cheap
    global sum instead of a per-node diff join. Per-round state is one
    (node, label) row per doc (16 B/doc — the only thing materialized
    between rounds); rounds = cluster diameter, small for dedup
    graphs. A DuckDB recursive CTE is the oracle.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    if edges is None:
        if edge_source == "minhash":
            edges = minhash_lsh_pairs(sf_dir, tau=tau, n=n)
        elif edge_source == "ngram":
            edges = ngram_jaccard_pairs(sf_dir, tau=tau, n=n, max_df=max_df)
        else:
            raise ValueError(f"unknown edge_source {edge_source!r}")
    edges = edges.select_columns(["doc_a", "doc_b"]).materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["doc_id"], "label": batch["doc_id"]})

    labels = (
        _documents(sf_dir)
        .select_columns(["doc_id"])
        .map_batches(init_labels, batch_format="pyarrow")
        .materialize()
    )

    def edge_msgs(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy()
        b = batch["doc_b"].to_numpy()
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "other": pa.array(np.concatenate([b, a]), type=pa.int64()),
                "label": pa.array([None] * (2 * len(a)), type=pa.int64()),
            }
        )

    def label_msgs(batch: pa.Table) -> pa.Table:
        nrows = batch.num_rows
        return pa.table(
            {
                "node": batch["node"],
                "other": pa.array([None] * nrows, type=pa.int64()),
                "label": batch["label"],
            }
        )

    def forward(group: pa.Table) -> pa.Table:
        # exactly one label row per node; forward it along every edge
        lab_col = group["label"].drop_null()
        lab = int(lab_col[0].as_py())
        node = int(group["node"][0].as_py())
        others = group["other"].drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
        nodes = np.concatenate([[node], others])
        labs = np.full(len(nodes), lab, dtype=np.int64)
        return pa.table(
            {"node": pa.array(nodes, type=pa.int64()), "label": pa.array(labs, type=pa.int64())}
        )

    prev_sum = None
    converged = False
    for _ in range(max_rounds):
        msgs = edges.map_batches(edge_msgs, batch_format="pyarrow").union(
            labels.map_batches(label_msgs, batch_format="pyarrow")
        )
        new_labels = (
            msgs.groupby("node")
            .map_groups(forward, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        total = new_labels.sum("label")
        labels = new_labels
        if prev_sum is not None and total == prev_sum:
            converged = True
            break
        prev_sum = total
    if not converged:
        # labels would be silently wrong (mid-propagation) — fail loudly;
        # rounds needed = cluster diameter, so max_rounds is the lever
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_rounds} rounds "
            "(cluster diameter exceeds max_rounds; raise max_rounds)"
        )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch["node"], "keeper_doc_id": batch["label"]}
        )

    return labels.map_batches(rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
def simhash_pairs(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dup, EXACT w.r.t. hamming(simhash) ≤ max_hamming:
    (max_hamming+1) bands → pigeonhole guarantees every qualifying pair
    shares at least one intact band; verification is exact popcount."""
    nbands = max_hamming + 1
    band_bits = 64 // nbands

    def sig_rows(batch: pa.Table) -> pa.Table:
        from collections import Counter

        out = {"band_key": [], "doc_id": [], "sim": []}
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            c = Counter(tokenize(text))
            terms = np.array(sorted(c), dtype=object)
            weights = np.array([c[t] for t in terms], dtype=np.float64)
            sim = simhash64(terms, weights)
            for b in range(nbands):
                band_val = (sim >> (b * band_bits)) & ((1 << band_bits) - 1)
                out["band_key"].append(f"{b}:{band_val}")
                out["doc_id"].append(doc_id)
                out["sim"].append(sim)
        return pa.table(
            {
                "band_key": pa.array(out["band_key"]),
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "sim": pa.array(np.array(out["sim"], dtype=np.uint64).astype(np.int64)),
            }
        )

    def candidates(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy()
        sims = group["sim"].to_numpy()
        order = np.argsort(ids)
        ids, sims = ids[order], sims[order]
        a, b = np.triu_indices(len(ids), k=1)
        ham = popcount64((sims[a].astype(np.uint64)) ^ (sims[b].astype(np.uint64)))
        keep = ham <= max_hamming
        return pa.table(
            {
                "doc_a": pa.array(ids[a][keep], type=pa.int64()),
                "doc_b": pa.array(ids[b][keep], type=pa.int64()),
                "hamming": pa.array(ham[keep].astype(np.int64), type=pa.int64()),
            }
        )

    def add_pair_key(batch: pa.Table) -> pa.Table:
        key = [f"{a}_{b}" for a, b in zip(batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist())]
        return batch.append_column("pair", pa.array(key))

    def first(group: pa.Table) -> pa.Table:
        return group.slice(0, 1).select(["doc_a", "doc_b", "hamming"])

    return (
        _documents(sf_dir)
        .map_batches(sig_rows, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(candidates, batch_format="pyarrow")
        .map_batches(add_pair_key, batch_format="pyarrow")
        .groupby("pair")
        .map_groups(first, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
def embedding_neardup_pairs(sf_dir: str, tau: float = 0.3):
    """Exact cosine-similarity ≥ τ pairs over the embeddings table.

    The embedding matrix is broadcast once (``ray.put``); each batch
    does one float64 matmul against it — the brute-force baseline that
    IVF/LSH variants are checked against (pipelines/ann.py)."""
    import ray
    import ray.data as rd

    from .ann import _corpus_ref

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    # corpus side loaded by a Ray task into the object store (never on
    # the driver); each streamed batch matmuls against it zero-copy
    ref = _corpus_ref(sf_dir)

    _norm_memo: dict = {}  # per-worker-process memo (ref → norms)

    def sims(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        all_norms = _norm_memo.get(ref)
        if all_norms is None:
            all_norms = _norm_memo[ref] = np.linalg.norm(all_mat, axis=1)
        bids = batch["vec_id"].to_numpy()
        bmat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        bnorms = np.linalg.norm(bmat, axis=1)
        cos = (bmat @ all_mat.T) / np.outer(bnorms, all_norms)
        keep_a, keep_b, vals = [], [], []
        for r in range(len(bids)):
            mask = (cos[r] >= tau) & (all_ids > bids[r])
            for c in np.flatnonzero(mask):
                keep_a.append(int(bids[r]))
                keep_b.append(int(all_ids[c]))
                vals.append(round6(float(cos[r, c])))
        return pa.table(
            {
                "vec_a": pa.array(keep_a, type=pa.int64()),
                "vec_b": pa.array(keep_b, type=pa.int64()),
                "cosine": pa.array(vals, type=pa.float64()),
            }
        )

    return emb.map_batches(sims, batch_format="pyarrow", batch_size=256)


# ---------------------------------------------------------------------------
def decontaminate(
    sf_dir: str, n: int = 3, min_shared: int = 5, eval_mod: int = 97
):
    """Benchmark decontamination: (train_doc_id, eval_doc_id,
    shared_ngrams) for every train doc sharing ≥ ``min_shared``
    distinct token n-gram shingles with an eval-set doc (here the
    deterministic holdout ``doc_id % eval_mod == 0``).

    Scale shape — the canonical broadcast-small decontamination join:
    the eval set is tiny relative to the corpus, so ONE Ray task
    shingles it (text fetched by a pushdown ``doc_id IN`` read, never
    a scan) into a sorted (shingle, eval_doc) probe table held in the
    object store; the training corpus then STREAMS through
    ``map_batches``, each batch probing with searchsorted — no
    all-to-all shuffle, no pair blowup, counts complete in-batch
    because a train doc lives in exactly one batch. Same shingle
    universe as :func:`ngram_jaccard_pairs` (hashed distinct n-grams,
    whole-text gram for short docs) — the DuckDB oracle rebuilds it
    relationally and must agree exactly."""
    import ray

    @ray.remote
    def _eval_probe(sf_dir: str, n: int, eval_mod: int):
        import pyarrow.parquet as pq

        ids = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id"]
        )["doc_id"].to_numpy()
        ev_ids = sorted(int(d) for d in ids if d % eval_mod == 0)
        t = pq.read_table(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text"],
            filters=[("doc_id", "in", ev_ids)],
        )
        sh_l, dc_l = [], []
        for d, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sh = shingle_hashes(tokenize(text), n=n).astype(np.int64)
            sh_l.append(sh)
            dc_l.append(np.full(len(sh), d, dtype=np.int64))
        sh = np.concatenate(sh_l) if sh_l else np.empty(0, np.int64)
        dc = np.concatenate(dc_l) if dc_l else np.empty(0, np.int64)
        o = np.lexsort((dc, sh))
        return sh[o], dc[o]

    ref = _eval_probe.remote(sf_dir, n, eval_mod)

    def probe(batch: pa.Table) -> pa.Table:
        import ray as _ray

        sh_sorted, ev_doc = _ray.get(ref)
        out_t, out_e, out_c = [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            if doc_id % eval_mod == 0 or not len(sh_sorted):
                continue
            sh = shingle_hashes(tokenize(text), n=n).astype(np.int64)
            lo = np.searchsorted(sh_sorted, sh, side="left")
            hi = np.searchsorted(sh_sorted, sh, side="right")
            widths = hi - lo
            if not widths.any():
                continue
            # gather every (shingle hit → eval doc) occurrence; distinct
            # shingles per doc make the per-eval-doc count = |∩ shingles|
            tot = int(widths.sum())
            idx = np.repeat(lo, widths) + (
                np.arange(tot) - np.repeat(np.cumsum(widths) - widths, widths)
            )
            evs, counts = np.unique(ev_doc[idx], return_counts=True)
            keep = counts >= min_shared
            for e, c in zip(evs[keep], counts[keep]):
                out_t.append(doc_id)
                out_e.append(int(e))
                out_c.append(int(c))
        return pa.table(
            {
                "train_doc_id": pa.array(out_t, type=pa.int64()),
                "eval_doc_id": pa.array(out_e, type=pa.int64()),
                "shared_ngrams": pa.array(out_c, type=pa.int64()),
            }
        )

    return _documents(sf_dir).map_batches(probe, batch_format="pyarrow")
