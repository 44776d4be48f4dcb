"""SearchGraph: navigable-graph ANN with beam search — the reference's
flagship index re-expressed Ray-Data-first (SURVEY.md §2 "what's
missing" closure; the reference's own CI bar is reproduced in
tests/test_dedup_ann.py: build the graph, search, macrorecall ≥ 0.8 vs
the exhaustive gold — ``/root/reference/test/testsearchgraph.jl:22-26``).

The reference builds incrementally: each insert beam-searches its own
neighborhood under a lock-guarded shared adjacency
(``/root/reference/src/searchgraph/insertions.jl:40-99``) and prunes it
with a SAT-family filter (``neighborhood.jl``). A shared mutable
adjacency is exactly what Ray Data should NOT express, so the build is
re-shaped batch-parallel with the same ingredients:

1. **kNN candidate graph** — the exact ``allknn`` pipeline (corpus
   broadcast via an object-store ref, nodes stream through
   ``map_batches``); ``build_k`` candidates per node.
2. **SAT pruning per node** (``DistalSatNeighborhood`` analog,
   distal-first scan) inside the same batch pass — O(build_k²) numpy
   per node, linear in N overall and embarrassingly parallel.
3. **Reverse links** (``connect_reverse_links!``,
   ``insertions.jl:40-99``): edges symmetrize through one sort
   (the Ray-side "shuffle = sync"), capped at ``max_degree`` keeping
   the CLOSEST neighbors (the reference's pruning rule).
4. **Freeze to CSR** (``StaticAdjList``/``adjstatic.jl:25-46`` analog)
   + entry points = farthest-first centers; the whole read-only graph
   ships as ONE object-store ref that every search actor maps
   zero-copy.

Search is the reference's ``beamsearch!`` contract
(``src/searchgraph/beamsearch.jl:30-97``): a TopK beam (covradius
pruning, (dist, id) tie rule — functions/topk.py), best-first
expansion of unvisited neighbors, stop when the closest frontier
candidate can no longer improve a full beam. Per-expansion distance
evaluation is one vectorized kernel over the node's ≤max_degree
neighbors; the visited set is an actor-resident mark scratch (no
allocation per query).

Scale note (100 TB): the CSR graph is 8 B × N × max_degree + the
vector matrix — the documented broadcast-memory bound, same as the
IVF refine path; beyond it, shard nodes by id range (doc-range pinned
searchers, one graph per shard, merge by the TopK contract) exactly
like sharded BM25 serving. Build cost is dominated by the allknn
candidate stage — swap in the IVF-bucketed allknn for beyond-memory
builds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.rounding import round6
from ..functions.topk import TopK

__all__ = [
    "build_searchgraph",
    "append_searchgraph",
    "searchgraph_knn",
    "GraphSearcher",
    "register_hint_policy",
    "HINT_POLICIES",
]

_GRAPH_REFS: dict[tuple, object] = {}

# ---------------------------------------------------------------------------
# Hint-selection policy family (the reference's hint callbacks,
# /root/reference/src/searchgraph/hints.jl:42-264: Random/Disjoint/
# KDisjoint/Epsilon/KCenters — there they re-fire on the exponential
# build callback cadence; here the build is one batch-parallel pass,
# so each policy runs ONCE at freeze time over the frozen CSR + vector
# matrix). A policy is ``fn(ids, mat, indptr, indices, n_entry, rng)
# -> entry POSITIONS (into ids/mat)``; register a custom one with
# :func:`register_hint_policy` (the §2.9 extension-hook shape, like
# neighborhood.register_neighborhood_filter). All builtin policies are
# deterministic (fixed-seed Generator) so graph caching and tests stay
# reproducible.


def _hints_fft(ids, mat, indptr, indices, n_entry, rng):
    """Farthest-first centers over the WHOLE corpus, seed = position 0
    (the engine's original single policy; KCentersHints' fft core)."""
    entries = [0]
    dmin = np.linalg.norm(mat - mat[0][None, :], axis=1)
    for _ in range(min(n_entry, len(ids)) - 1):
        nxt = int(np.argmax(dmin))
        entries.append(nxt)
        dmin = np.minimum(dmin, np.linalg.norm(mat - mat[nxt][None, :], axis=1))
    return np.asarray(entries, dtype=np.int64)


def _hints_random(ids, mat, indptr, indices, n_entry, rng):
    """RandomHints (hints.jl:38-75): random nodes with >2 neighbors,
    skipping anything already covered by a picked hint's 2-hop
    neighborhood."""
    n = len(ids)
    picked: list[int] = []
    visited: set[int] = set()
    for u in rng.permutation(n):
        u = int(u)
        if u in visited:
            continue
        nbrs = indices[indptr[u] : indptr[u + 1]]
        if len(nbrs) <= 2:
            continue
        visited.add(u)
        visited.update(int(v) for v in nbrs)
        for c in nbrs:
            visited.update(int(v) for v in indices[indptr[c] : indptr[c + 1]])
        picked.append(u)
        if len(picked) >= n_entry:
            break
    return np.asarray(picked or [0], dtype=np.int64)


def _hints_disjoint(ids, mat, indptr, indices, n_entry, rng):
    """DisjointHints (hints.jl:100-126): prefer nodes whose degree is
    closest to the mean degree, greedily keeping only nodes outside
    every previously-picked hint's neighborhood."""
    deg = np.diff(indptr)
    order = np.argsort(np.abs(deg - deg.mean()), kind="stable")
    picked: list[int] = []
    visited: set[int] = set()
    for u in order:
        u = int(u)
        if u in visited:
            continue
        picked.append(u)
        visited.add(u)
        visited.update(int(v) for v in indices[indptr[u] : indptr[u + 1]])
        if len(picked) >= n_entry:
            break
    return np.asarray(picked or [0], dtype=np.int64)


def _hints_kdisjoint(ids, mat, indptr, indices, n_entry, rng, expansion: int = 4):
    """KDisjointHints (hints.jl:128-174): random sample of
    ``expansion·n_entry`` nodes, highest-degree first, each pick
    BFS-expands its visited set to depth ``expansion``."""
    n = len(ids)
    sample = np.unique(rng.integers(0, n, size=max(1, expansion * n_entry)))
    deg = np.diff(indptr)
    sample = sample[np.argsort(-deg[sample], kind="stable")]
    picked: list[int] = []
    visited: set[int] = set()
    for u in sample:
        u = int(u)
        if u in visited:
            continue
        picked.append(u)
        visited.add(u)
        frontier = [(u, 0)]
        while frontier:
            parent, e = frontier.pop()
            for c in indices[indptr[parent] : indptr[parent + 1]]:
                c = int(c)
                if c not in visited:
                    visited.add(c)
                    if e + 1 <= expansion:
                        frontier.append((c, e + 1))
        if len(picked) >= n_entry:
            break
    return np.asarray(picked or [0], dtype=np.int64)


def _hints_epsilon(ids, mat, indptr, indices, n_entry, rng, quantile: float = 0.01):
    """EpsilonHints (hints.jl:176-220): ε = a low quantile of sampled
    pairwise distances; hints = a greedy ε-cover (the neardup contract)
    of a √n sample, capped at n_entry."""
    n = len(ids)
    m = min(n, max(2, int(np.ceil(np.sqrt(n)))))
    s = np.unique(rng.integers(0, n, size=m))
    sub = mat[s]
    a = rng.integers(0, len(s), size=len(s))
    b = rng.integers(0, len(s), size=len(s))
    d = np.linalg.norm(sub[a] - sub[b], axis=1)
    d = d[d > 0]
    eps = max(1e-5, float(np.quantile(d, quantile))) if len(d) else 1e-5
    kept: list[int] = []
    for i in range(len(s)):
        v = sub[i]
        if kept and float(np.min(np.linalg.norm(sub[kept] - v[None, :], axis=1))) <= eps:
            continue
        kept.append(i)
    kept = kept[:n_entry] if len(kept) > n_entry else kept
    return np.asarray([int(s[i]) for i in kept] or [0], dtype=np.int64)


def _hints_kcenters(
    ids, mat, indptr, indices, n_entry, rng, powsample: float = 1.5, qdiscard: float = 0.1
):
    """KCentersHints (hints.jl:222-264): fft over a degree-filtered
    random sample (degrees within the [0.25, 0.95] quantiles), then
    drop centers whose assigned population falls below the ``qdiscard``
    quantile."""
    n = len(ids)
    k = min(max(1, n // 2), n_entry)
    m = min(n, max(k + 1, int(np.ceil(k**powsample)) * 4))
    s = np.unique(rng.integers(0, n, size=m))
    deg = np.diff(indptr)[s]
    lo, hi = np.quantile(deg, [0.25, 0.95])
    s = s[(deg >= lo) & (deg <= hi)]
    if len(s) == 0:
        return np.asarray([0], dtype=np.int64)
    sub = mat[s]
    centers = [0]
    dmin = np.linalg.norm(sub - sub[0][None, :], axis=1)
    nn = np.zeros(len(s), dtype=np.int64)
    while len(centers) < min(k, len(s)):
        nxt = int(np.argmax(dmin))
        centers.append(nxt)
        d_new = np.linalg.norm(sub - sub[nxt][None, :], axis=1)
        closer = d_new < dmin
        nn[closer] = len(centers) - 1
        dmin = np.minimum(dmin, d_new)
    counts = np.bincount(nn, minlength=len(centers))
    cut = np.quantile(counts, qdiscard)
    kept = [c for c, cnt in zip(centers, counts) if cnt >= cut]
    return np.asarray([int(s[c]) for c in (kept or centers[:1])], dtype=np.int64)


HINT_POLICIES: dict[str, object] = {
    "fft": _hints_fft,
    "random": _hints_random,
    "disjoint": _hints_disjoint,
    "kdisjoint": _hints_kdisjoint,
    "epsilon": _hints_epsilon,
    "kcenters": _hints_kcenters,
}


def register_hint_policy(name: str, fn) -> None:
    """Plug a custom entry-point policy into :func:`build_searchgraph`
    (``fn(ids, mat, indptr, indices, n_entry, rng) -> positions``)."""
    HINT_POLICIES[name] = fn


def _sat_prune(
    cand_ids: np.ndarray,
    cand_dists: np.ndarray,
    cand_mat: np.ndarray,
    max_out: int,
) -> np.ndarray:
    """Distal-first SAT filter over one node's candidate list
    (reference ``DistalSatNeighborhood``): scanning candidates
    farthest-first, keep c unless an already-kept neighbor is closer
    to c than the node itself is. Returns kept candidate ids
    (≤ max_out). Vectorized against the kept set per step (the kept
    set is ≤ max_out ≤ 32 — bounded work per node)."""
    order = np.argsort(-cand_dists, kind="stable")
    kept: list[int] = []
    kept_rows: list[np.ndarray] = []
    for j in order:
        c = cand_mat[j]
        if kept_rows:
            dk = np.linalg.norm(np.asarray(kept_rows) - c[None, :], axis=1)
            if (dk < cand_dists[j]).any():
                continue
        kept.append(int(cand_ids[j]))
        kept_rows.append(c)
    if len(kept) > max_out:
        # keep the closest max_out of the kept set (degree cap)
        kd = {int(i): float(d) for i, d in zip(cand_ids, cand_dists)}
        kept = sorted(kept, key=lambda i: (kd[i], i))[:max_out]
    return np.asarray(kept, dtype=np.int64)


def build_searchgraph(
    sf_dir: str,
    build_k: int = 12,
    max_degree: int = 16,
    metric: str = "l2",
    n_entry: int = 4,
    max_vec_id: int | None = None,
    hints: str = "fft",
):
    """Build the graph; returns an ObjectRef of
    ``(ids, mat, indptr, indices, entries)`` (CSR over POSITIONS into
    ``ids``/``mat``, which are vec_id-ascending). Cached per
    (file state, knobs) like ann._corpus_ref. ``max_vec_id`` builds
    over the id-prefix subset (pushdown read) — the base graph for
    :func:`append_searchgraph` tests/workflows. ``hints`` picks the
    entry-point policy from :data:`HINT_POLICIES` (reference hint
    family, hints.jl:42-264); the resolved FUNCTION ships with the
    freeze task, so registered custom policies work too."""
    import os

    import ray

    from .ann import _corpus_ref, _dists, _read_matrix

    hint_fn = HINT_POLICIES[hints]
    st = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    key = (
        sf_dir, int(st.st_mtime_ns), int(st.st_size),
        build_k, max_degree, metric, n_entry, max_vec_id, hints,
    )
    ref = _GRAPH_REFS.get(key)
    if ref is not None:
        return ref
    for k in [k for k in _GRAPH_REFS if k[0] == sf_dir]:
        del _GRAPH_REFS[k]

    if max_vec_id is None:
        corpus = _corpus_ref(sf_dir)
    else:
        corpus = ray.put(_read_matrix(sf_dir, max_vec_id=max_vec_id))

    def edge_batch(batch: pa.Table) -> pa.Table:
        """kNN candidates + SAT prune for a batch of nodes → directed
        edge rows (src, dst, dist)."""
        all_ids, all_mat = ray.get(corpus)
        q_ids = batch["vec_id"].to_numpy().astype(np.int64)
        q_mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        d = _dists(all_mat, q_mat, metric)  # (corpus, batch)
        src_l, dst_l, dist_l = [], [], []
        # positions of all corpus rows by id (ids are sorted ascending)
        for j, qid in enumerate(q_ids):
            dj = d[:, j]
            mask = all_ids != qid
            ids_m, dj_m = all_ids[mask], dj[mask]
            sel = np.lexsort((ids_m, dj_m))[:build_k]
            cand_ids, cand_d = ids_m[sel], dj_m[sel]
            cand_pos = np.searchsorted(all_ids, cand_ids)
            kept = _sat_prune(cand_ids, cand_d, all_mat[cand_pos], max_degree)
            kd = dict(zip(cand_ids.tolist(), cand_d.tolist()))
            src_l.append(np.full(len(kept), qid, dtype=np.int64))
            dst_l.append(kept)
            dist_l.append(np.asarray([kd[int(i)] for i in kept], dtype=np.float64))
        return pa.table(
            {
                "src": pa.array(np.concatenate(src_l), type=pa.int64()),
                "dst": pa.array(np.concatenate(dst_l), type=pa.int64()),
                "dist": pa.array(np.concatenate(dist_l), type=pa.float64()),
            }
        )

    from .ann import load_embeddings

    emb_ds = load_embeddings(sf_dir)
    if max_vec_id is not None:

        def _cut(batch: pa.Table) -> pa.Table:
            keep = batch["vec_id"].to_numpy() < max_vec_id
            return batch.filter(pa.array(keep))

        emb_ds = emb_ds.map_batches(_cut, batch_format="pyarrow")
    edges = (
        emb_ds
        .map_batches(edge_batch, batch_format="pyarrow", batch_size=128)
        .to_pandas()
    )

    @ray.remote
    def freeze(edges_src, edges_dst, edges_dist, corpus, max_degree, n_entry, hint_fn):
        """Symmetrize + degree-cap + CSR freeze + entry points — one
        task, result lives in the object store. (``corpus`` arrives
        already dereferenced — Ray resolves top-level ObjectRef args.)"""
        all_ids, all_mat = corpus
        n = len(all_ids)
        # reverse links: every directed edge also enters dst's list
        s = np.concatenate([edges_src, edges_dst])
        t = np.concatenate([edges_dst, edges_src])
        w = np.concatenate([edges_dist, edges_dist])
        # unique (src, dst), keep min dist (dist is symmetric anyway)
        o = np.lexsort((t, w, s))
        s, t, w = s[o], t[o], w[o]
        keep = np.r_[True, (s[1:] != s[:-1]) | (t[1:] != t[:-1])]
        s, t, w = s[keep], t[keep], w[keep]
        # degree cap: keep the closest max_degree per src (rows are
        # sorted by (src, dist) after the lexsort+dedup above)
        o2 = np.lexsort((t, w, s))
        s, t, w = s[o2], t[o2], w[o2]
        bounds = np.flatnonzero(np.r_[True, s[1:] != s[:-1], True])
        starts, counts = bounds[:-1], np.diff(bounds)
        rank_in_src = np.arange(len(s)) - np.repeat(starts, counts)
        keep2 = rank_in_src < max_degree
        s, t = s[keep2], t[keep2]
        # CSR over positions
        src_pos = np.searchsorted(all_ids, s)
        dst_pos = np.searchsorted(all_ids, t)
        indptr = np.zeros(n + 1, dtype=np.int64)
        np.add.at(indptr, src_pos + 1, 1)
        np.cumsum(indptr, out=indptr)
        indices = np.empty(len(dst_pos), dtype=np.int64)
        order = np.argsort(src_pos, kind="stable")
        indices[:] = dst_pos[order]
        # entry points: the selected hint policy over the frozen CSR
        # (deterministic rng so the graph cache and tests reproduce)
        rng = np.random.default_rng(0x5EED5)
        entries = np.unique(
            np.asarray(
                hint_fn(all_ids, all_mat, indptr, indices, n_entry, rng),
                dtype=np.int64,
            )
        )
        if len(entries) == 0:
            entries = np.asarray([0], dtype=np.int64)
        return all_ids, all_mat, indptr, indices, entries

    ref = freeze.remote(
        edges["src"].to_numpy(),
        edges["dst"].to_numpy(),
        edges["dist"].to_numpy(),
        corpus,
        max_degree,
        n_entry,
        hint_fn,
    )
    _GRAPH_REFS[key] = ref
    return ref


def append_searchgraph(
    graph_ref,
    new_ids: np.ndarray,
    new_mat: np.ndarray,
    *,
    build_k: int = 12,
    max_degree: int = 16,
    metric: str = "l2",
    bs: int = 32,
):
    """Incremental insertion — the reference's ``push_item!`` on a
    SearchGraph (``/root/reference/src/searchgraph/insertions.jl:
    40-99``): each new item beam-searches its own neighborhood in the
    CURRENT graph (seeing previously appended items, exactly the
    reference's sequential semantics), SAT-prunes it, connects forward
    links and reverse links with the closest-first degree cap.

    Ray shape: appends are the SMALL side (the big side is the frozen
    graph), so the whole batch inserts inside ONE Ray task against the
    broadcast CSR — new edges accumulate in a delta overlay (the
    adjacency analog of the index's delta segments) and one freeze
    merges overlay + CSR into the new graph ref. For bulk appends at
    scale, chunk the batch and chain this call; each chunk's inserts
    see every earlier chunk. Returns the new graph ObjectRef."""
    import heapq

    import ray

    @ray.remote
    def _append(graph, new_ids, new_mat):
        ids, mat, indptr, indices, entries = graph
        n_old = len(ids)
        all_mat = np.concatenate([mat, new_mat.astype(np.float64)])
        all_ids = np.concatenate([ids, np.asarray(new_ids, dtype=np.int64)])
        if metric == "cosine":
            norms = np.linalg.norm(all_mat, axis=1)
        # delta overlay: positions ≥ n_old own fresh rows; old rows
        # grow through `overlay` (reverse links), pruned on overflow
        new_rows: dict[int, np.ndarray] = {}
        overlay: dict[int, list[int]] = {}

        def neighbors(u: int) -> np.ndarray:
            if u >= n_old:
                base = new_rows.get(u, np.empty(0, np.int64))
            else:
                base = indices[indptr[u] : indptr[u + 1]]
            extra = overlay.get(u)
            if extra:
                return np.concatenate([base, np.asarray(extra, dtype=np.int64)])
            return base

        def dist_to(pos: np.ndarray, q: np.ndarray) -> np.ndarray:
            sub = all_mat[pos]
            if metric == "l2":
                diff = sub - q[None, :]
                return np.sqrt((diff * diff).sum(axis=1))
            qn = float(np.linalg.norm(q))
            return 1.0 - (sub @ q) / (norms[pos] * qn)

        visited = np.zeros(len(all_mat), dtype=bool)

        def beam_search(q: np.ndarray, k: int, n_visible: int):
            """Top-k positions among the first ``n_visible`` nodes —
            the beamsearch.jl contract over the overlay adjacency."""
            beam = TopK(max(bs, k))
            ent = entries
            d0 = dist_to(ent, q)
            visited[ent] = True
            touched = [np.asarray(ent)]
            frontier: list[tuple[float, int]] = []
            for dd, pp in zip(d0, ent):
                beam.push(float(dd), int(pp))
                heapq.heappush(frontier, (float(dd), int(pp)))
            while frontier:
                d_u, u = heapq.heappop(frontier)
                if len(beam) >= beam.k and d_u > beam.covradius():
                    break
                nb = neighbors(u)
                nb = nb[nb < n_visible]
                nb = nb[~visited[nb]]
                if not len(nb):
                    continue
                visited[nb] = True
                touched.append(nb)
                dn = dist_to(nb, q)
                cov = beam.covradius()
                for dd, pp in zip(dn, nb):
                    fd = float(dd)
                    if beam.push(fd, int(pp)) or fd <= cov:
                        heapq.heappush(frontier, (fd, int(pp)))
            for arr in touched:
                visited[arr] = False
            return beam.items()[:k]  # ascending (dist, pos)

        def cap_row(u: int) -> None:
            """Degree cap, keeping the CLOSEST neighbors (the
            reference's reverse-link pruning rule)."""
            nb = neighbors(u)
            if len(nb) <= max_degree:
                return
            d = dist_to(nb, all_mat[u])
            keep = nb[np.lexsort((nb, d))[:max_degree]]
            if u >= n_old:
                new_rows[u] = keep
                overlay.pop(u, None)
            else:
                base = indices[indptr[u] : indptr[u + 1]]
                # old CSR rows are immutable; the overlay holds the
                # SURVIVING extras and a mask of dropped base links
                extras = [int(x) for x in keep if x not in set(base.tolist())]
                overlay[u] = extras
                dropped = set(base.tolist()) - set(keep.tolist())
                if dropped:
                    # record drops as a negative overlay: store kept
                    # base explicitly by replacing the row via new_rows
                    new_rows[u] = keep
                    overlay.pop(u, None)

        for j in range(len(new_ids)):
            v = n_old + j
            items = beam_search(all_mat[v], build_k, n_visible=v)
            if items:
                cand_pos = np.asarray([p for _, p in items], dtype=np.int64)
                cand_d = np.asarray([d for d, _ in items], dtype=np.float64)
                kept_ids = _sat_prune(cand_pos, cand_d, all_mat[cand_pos], max_degree)
            else:
                kept_ids = np.empty(0, np.int64)
            new_rows[v] = kept_ids
            for u in kept_ids:
                overlay.setdefault(int(u), []).append(v)
                cap_row(int(u))

        # freeze: merge CSR + overlay/new_rows into a new CSR
        n_all = len(all_ids)
        rows = []
        for u in range(n_all):
            if u in new_rows and u < n_old:
                rows.append(new_rows[u])
            elif u < n_old:
                base = indices[indptr[u] : indptr[u + 1]]
                extra = overlay.get(u)
                rows.append(
                    np.concatenate([base, np.asarray(extra, dtype=np.int64)])
                    if extra
                    else base
                )
            else:
                rows.append(new_rows.get(u, np.empty(0, np.int64)))
        counts = np.asarray([len(r) for r in rows], dtype=np.int64)
        new_indptr = np.zeros(n_all + 1, dtype=np.int64)
        np.cumsum(counts, out=new_indptr[1:])
        new_indices = (
            np.concatenate(rows) if counts.sum() else np.empty(0, np.int64)
        )
        return all_ids, all_mat, new_indptr, new_indices, entries

    return _append.remote(graph_ref, np.asarray(new_ids), np.asarray(new_mat))


class GraphSearcher:
    """Actor-pool beam searcher (the reference's ``beamsearch!``
    contract, ``beamsearch.jl:30-97``): graph + vectors map zero-copy
    from the broadcast ref in ``__init__``; per query a TopK beam of
    width ``bs`` expands best-first until the nearest frontier node
    can't improve a full beam (covradius stop). Visited marks are an
    actor-resident scratch — no per-query allocation."""

    def __init__(self, graph_ref, k: int = 8, bs: int = 32, metric: str = "l2"):
        import ray

        self.ids, self.mat, self.indptr, self.indices, self.entries = ray.get(graph_ref)
        self.k = k
        self.bs = max(bs, k)
        self.metric = metric
        self._visited = np.zeros(len(self.ids), dtype=bool)
        if metric == "cosine":
            self._norms = np.linalg.norm(self.mat, axis=1)

    def _dist_to(self, pos: np.ndarray, q: np.ndarray, qn: float) -> np.ndarray:
        sub = self.mat[pos]
        if self.metric == "l2":
            diff = sub - q[None, :]
            return np.sqrt((diff * diff).sum(axis=1))
        return 1.0 - (sub @ q) / (self._norms[pos] * qn)

    def search_one(self, q: np.ndarray) -> tuple[list[tuple[float, int]], int]:
        import heapq

        qn = float(np.linalg.norm(q)) if self.metric == "cosine" else 0.0
        beam = TopK(self.bs)
        visited = self._visited
        touched: list[np.ndarray] = []
        ent = self.entries
        d0 = self._dist_to(ent, q, qn)
        visited[ent] = True
        touched.append(ent)
        frontier: list[tuple[float, int]] = []
        ndists = len(ent)
        for dd, pp in zip(d0, ent):
            beam.push(float(dd), int(pp))
            heapq.heappush(frontier, (float(dd), int(pp)))
        while frontier:
            d_u, u = heapq.heappop(frontier)
            if len(beam) >= self.bs and d_u > beam.covradius():
                break  # nearest unexpanded node can't improve the beam
            nb = self.indices[self.indptr[u] : self.indptr[u + 1]]
            nb = nb[~visited[nb]]
            if not len(nb):
                continue
            visited[nb] = True
            touched.append(nb)
            dn = self._dist_to(nb, q, qn)
            ndists += len(nb)
            cov = beam.covradius() if len(beam) >= self.bs else np.inf
            for dd, pp in zip(dn, nb):
                fd = float(dd)
                if beam.push(fd, int(pp)) or fd <= cov:
                    heapq.heappush(frontier, (fd, int(pp)))
        for arr in touched:
            visited[arr] = False  # reset only touched slots
        items = beam.items()[: self.k]  # ascending (dist, pos)
        return items, ndists

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["query_id"].to_numpy().astype(np.int64)
        qmat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        out_q, out_r, out_v, out_d, out_c = [], [], [], [], []
        for j, qid in enumerate(qids):
            items, ndists = self.search_one(qmat[j])
            out_q.append(np.full(len(items), qid, dtype=np.int64))
            out_r.append(np.arange(1, len(items) + 1, dtype=np.int64))
            out_v.append(np.asarray([int(self.ids[p]) for _, p in items], dtype=np.int64))
            out_d.append(np.asarray([round6(d) for d, _ in items], dtype=np.float64))
            out_c.append(np.full(len(items), ndists, dtype=np.int64))
        cat = np.concatenate
        return pa.table(
            {
                "query_id": pa.array(cat(out_q) if out_q else [], type=pa.int64()),
                "rank": pa.array(cat(out_r) if out_r else [], type=pa.int64()),
                "vec_id": pa.array(cat(out_v) if out_v else [], type=pa.int64()),
                "dist": pa.array(cat(out_d) if out_d else [], type=pa.float64()),
                "dists_evaluated": pa.array(cat(out_c) if out_c else [], type=pa.int64()),
            }
        )


def searchgraph_knn(
    sf_dir: str,
    k: int = 8,
    n_queries: int = 20,
    bs: int = 32,
    build_k: int = 12,
    max_degree: int = 16,
    metric: str = "l2",
    concurrency: int = 2,
    hints: str = "fft",
):
    """``SearchGraph(dist, db)`` + ``searchbatch`` analog: approximate
    top-k for the fixed query set via beam search over the navigable
    graph. Same result schema as :func:`ann.knn_search` (+ the
    ``dists_evaluated`` cost column — the reference's ``costdist``);
    recall vs the exhaustive gold is pinned in pytest and tunable via
    ``tune.tune_searchgraph`` (``MinRecall`` over the beam width, the
    reference's ``BeamSearchSpace`` knob)."""
    import ray.data as rd

    from .ann import _read_matrix

    graph = build_searchgraph(
        sf_dir, build_k=build_k, max_degree=max_degree, metric=metric, hints=hints
    )
    qids, qmat = _read_matrix(sf_dir, max_vec_id=n_queries)
    qds = rd.from_items(
        [
            {"query_id": int(q), "embedding": qmat[i].tolist()}
            for i, q in enumerate(qids)
        ]
    ).repartition(concurrency)
    return qds.map_batches(
        GraphSearcher,
        batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_kwargs={"graph_ref": graph, "k": k, "bs": bs, "metric": metric},
        batch_size=64,
    )
