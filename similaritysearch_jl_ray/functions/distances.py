"""Vectorized distance kernels — the reference's ``src/dist/`` family
re-expressed as numpy batch kernels (SURVEY.md §2.2).

Every kernel maps a (batch, dim) matrix against a (queries, dim)
matrix → (batch, queries) float64 distances, mirroring ``evaluate``
semantics (``/root/reference/src/dist/vecs.jl:26-177``, ``cos.jl``,
``sets.jl``, ``seqs.jl``, ``bits.jl``). The registry is the
user-extension surface (§2.9): a new distance = register a kernel.
"""

from __future__ import annotations

import numpy as np

from .hashing import popcount64

__all__ = [
    "DISTANCES",
    "register_distance",
    "pairwise",
    "negative_distance",
    "similarity_from_distance",
    "distance_with_identifiers",
    "set_distance",
    "string_distance",
    "levenshtein_dists",
    "levenshtein_mask",
    "lev_dists_padded",
    "lev_within1_padded",
    "EditDistanceScratch",
]


def _l2(a, q):
    d = a[:, None, :] - q[None, :, :]
    return np.sqrt((d * d).sum(axis=2))


def _sqdl2(a, q):
    d = a[:, None, :] - q[None, :, :]
    return (d * d).sum(axis=2)


def _l1(a, q):
    return np.abs(a[:, None, :] - q[None, :, :]).sum(axis=2)


def _linf(a, q):
    return np.abs(a[:, None, :] - q[None, :, :]).max(axis=2)


def _lp(p):
    def k(a, q):
        return (np.abs(a[:, None, :] - q[None, :, :]) ** p).sum(axis=2) ** (1.0 / p)

    return k


def _cosine(a, q):
    an = np.linalg.norm(a, axis=1)
    qn = np.linalg.norm(q, axis=1)
    return 1.0 - (a @ q.T) / np.outer(an, qn)


def _angle(a, q):
    # reference fastacos clamping (src/dist/cos.jl:64-79)
    c = 1.0 - _cosine(a, q)
    return np.arccos(np.clip(c, -1.0, 1.0))


def _norm_cosine(a, q):
    """inputs assumed pre-normalized (reference NormalizedCosineDistance)."""
    return 1.0 - a @ q.T


def _neg_dot(a, q):
    """NegativeDistanceHack over the dot product (src/dist/hacks.jl:13-22)."""
    return -(a @ q.T)


DISTANCES = {
    "l2": _l2,
    "sql2": _sqdl2,
    "l1": _l1,
    "linf": _linf,
    "lp3": _lp(3.0),
    "cosine": _cosine,
    "angle": _angle,
    "norm_cosine": _norm_cosine,
    "neg_dot": _neg_dot,
}


def register_distance(name: str, kernel) -> None:
    """§2.9 extension hook: plug a custom kernel into every pipeline
    that takes a ``metric=`` argument."""
    DISTANCES[name] = kernel


def pairwise(a: np.ndarray, q: np.ndarray, metric: str) -> np.ndarray:
    return DISTANCES[metric](np.asarray(a, np.float64), np.asarray(q, np.float64))


# -- distance-hack wrappers (src/dist/hacks.jl:5-50) -------------------------
# The reference exposes these as SemiMetric wrappers; here each is a
# kernel COMBINATOR returning a batch kernel that plugs into
# :func:`register_distance`, so every pipeline taking ``metric=`` can
# serve them (the farthest-element use cases route through the same
# sign conventions the top-k heap already handles, functions/topk.py).
# ``DistanceF32`` stays n/a: the engine is float64-native end to end.
def _as_kernel(metric):
    return DISTANCES[metric] if isinstance(metric, str) else metric


def negative_distance(metric):
    """``NegativeDistanceHack`` (hacks.jl:5-17): evaluates as the
    negative of the wrapped distance — a similarity for
    farthest-point / farthest-pair searches."""
    base = _as_kernel(metric)

    def kernel(a, q):
        return -base(a, q)

    return kernel


def similarity_from_distance(metric):
    """``SimilarityFromDistance`` (hacks.jl:19-31): ``1/(1 + d)`` —
    a bounded similarity for farthest-element searches."""
    base = _as_kernel(metric)

    def kernel(a, q):
        return 1.0 / (1.0 + base(a, q))

    return kernel


def distance_with_identifiers(metric, db: np.ndarray):
    """``DistanceWithIdentifiers`` (hacks.jl:33-43): id-indirected
    evaluation — the returned kernel takes integer id batches and
    evaluates the wrapped distance over ``db`` rows (0-based ids; the
    reference is 1-based Julia). At scale ``db`` is the broadcast
    side: ``ray.put`` the matrix once and build the kernel inside
    each actor's ``__init__``, never per batch."""
    base = _as_kernel(metric)
    db = np.asarray(db, np.float64)

    def kernel(ia, iq):
        ia = np.asarray(ia, np.int64).ravel()
        iq = np.asarray(iq, np.int64).ravel()
        return base(db[ia], db[iq])

    return kernel


# -- set distances over sorted int arrays (src/dist/sets.jl:11-168) ---------
def _intersection_size(a: np.ndarray, b: np.ndarray) -> int:
    return len(np.intersect1d(a, b, assume_unique=True))


def set_distance(a: np.ndarray, b: np.ndarray, kind: str) -> float:
    i = _intersection_size(a, b)
    la, lb = len(a), len(b)
    if kind == "jaccard":
        u = la + lb - i
        return 1.0 - (i / u if u else 0.0)
    if kind == "dice":
        return 1.0 - (2.0 * i / (la + lb) if la + lb else 0.0)
    if kind == "intersection":
        return 1.0 - (i / max(1, min(la, lb)))
    if kind == "cosine_set":
        return 1.0 - (i / np.sqrt(la * lb) if la and lb else 0.0)
    raise ValueError(kind)


# -- string distances (src/dist/seqs.jl:10-132) -----------------------------
def string_distance(a: str, b: str, kind: str) -> int:
    if kind == "common_prefix":
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return max(len(a), len(b)) - n
    if kind == "hamming":
        if len(a) != len(b):
            raise ValueError("hamming needs equal lengths")
        return sum(x != y for x, y in zip(a, b))
    if kind in ("levenshtein", "lcs"):
        # DP with a reusable row (the reference's per-thread row cache
        # becomes a plain local here; actors reuse via closure scope)
        sub_cost = 1 if kind == "levenshtein" else 2**30  # lcs: no substitution
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i] + [0] * len(b)
            for j, cb in enumerate(b, 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (0 if ca == cb else sub_cost),
                )
            prev = cur
        return prev[-1]
    raise ValueError(kind)


def lev_dists_padded(q: np.ndarray, pad: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Core of :func:`levenshtein_dists` on a prebuilt byte matrix:
    ``pad[c, :lens[c]]`` = candidate c's bytes (0 elsewhere, 0 ∉
    alphabet), ``q`` = query bytes. Callers that hold a flat byte
    cache of their dictionary (the serving actor) gather ``pad``
    directly and skip per-query string joins."""
    k, nmax = pad.shape
    j_idx = np.arange(nmax + 1, dtype=np.int64)
    D = np.broadcast_to(j_idx, (k, nmax + 1)).copy()
    tmp = np.empty_like(D)
    for i in range(1, len(q) + 1):
        cost = (pad != q[i - 1]).astype(np.int64)
        tmp[:, 0] = i
        np.minimum(D[:, 1:] + 1, D[:, :-1] + cost, out=tmp[:, 1:])
        np.subtract(tmp, j_idx, out=tmp)
        np.minimum.accumulate(tmp, axis=1, out=tmp)
        np.add(tmp, j_idx, out=tmp)
        D, tmp = tmp, D
    return D[np.arange(k), lens]


def lev_within1_padded(q: np.ndarray, pad: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Closed-form ``dist ≤ 1`` on a prebuilt byte matrix: true iff
    ``|lc − lq| ≤ 1`` and common-prefix + common-suffix ≥
    max(lc, lq) − 1 (one substitution or one indel splits the strings
    into a shared prefix and a shared suffix)."""
    k, nmax = pad.shape
    lq = len(q)
    near = np.abs(lens - lq) <= 1
    if not near.any():
        return near
    W = min(nmax, lq)
    if W == 0:
        return near & (np.maximum(lens, lq) <= 1)
    P = np.cumprod(pad[:, :W] == q[:W], axis=1).sum(axis=1)
    idx = lens[:, None] - 1 - np.arange(W)[None, :]
    radj = np.where(idx >= 0, pad[np.arange(k)[:, None], np.maximum(idx, 0)], 0)
    S = np.cumprod(radj == q[::-1][:W], axis=1).sum(axis=1)
    return near & (P + S >= np.maximum(lens, lq) - 1)


def _pad_from_strings(cands) -> tuple[np.ndarray, np.ndarray] | None:
    """(pad, lens) byte matrix for an ASCII candidate list; None when
    any candidate is non-ASCII (callers fall back to the scalar DP)."""
    k = len(cands)
    try:
        joined = "".join(str(c) for c in cands).encode("ascii")
    except UnicodeEncodeError:
        return None
    lens = np.fromiter((len(str(c)) for c in cands), dtype=np.int64, count=k)
    nmax = int(lens.max()) if k else 0
    pad = np.zeros((k, nmax), dtype=np.uint8)
    pad[np.arange(nmax) < lens[:, None]] = np.frombuffer(joined, dtype=np.uint8)
    return pad, lens


def levenshtein_dists(tok: str, cands) -> np.ndarray:
    """Plain Levenshtein distance of ``tok`` to MANY candidates in one
    vectorized DP — the verify half of fuzzy expansion and the scan
    kernel of spell suggestion. The classic candidate-major
    vectorization: one (n_cands × maxlen) byte matrix, ``len(tok)``
    row updates, with the left-to-right dependency resolved by the
    ``min-accumulate(x − j) + j`` prefix trick. ASCII fast path (the
    tokenizer's [a-z0-9] alphabet); any non-ASCII candidate set falls
    back to the scalar kernel. Identical to
    ``string_distance(..., "levenshtein")`` per candidate (tested)."""
    k = len(cands)
    if k == 0:
        return np.zeros(0, dtype=np.int64)
    built = None
    try:
        q = np.frombuffer(tok.encode("ascii"), dtype=np.uint8)
        built = _pad_from_strings(cands)
    except UnicodeEncodeError:
        pass
    if built is None:
        return np.fromiter(
            (string_distance(tok, str(c), "levenshtein") for c in cands),
            dtype=np.int64,
            count=k,
        )
    return lev_dists_padded(q, *built)


def levenshtein_mask(tok: str, cands, max_edits: int) -> np.ndarray:
    """``levenshtein_dists(tok, cands) <= max_edits`` (see above);
    ``max_edits == 1`` short-circuits to the closed-form
    :func:`lev_within1_padded` — ~25× less work at the fuzzy default."""
    k = len(cands)
    if max_edits != 1 or k == 0:
        return levenshtein_dists(tok, cands) <= max_edits
    built = None
    try:
        q = np.frombuffer(tok.encode("ascii"), dtype=np.uint8)
        built = _pad_from_strings(cands)
    except UnicodeEncodeError:
        pass
    if built is None:
        return levenshtein_dists(tok, cands) <= max_edits
    return lev_within1_padded(q, *built)


class EditDistanceScratch:
    """Actor-resident DP row buffers for edit distances — the
    reference's per-thread ``Levenshtein.Cpool`` row cache
    (``/root/reference/src/dist/seqs.jl:44-53``) as per-actor state:
    construct once in an actor's ``__init__``, call per pair; the two
    rows are reused across calls instead of reallocated (the same
    no-per-call-allocation rule the scorer follows — BASELINE.md §C.4)."""

    __slots__ = ("_prev", "_cur")

    def __init__(self):
        self._prev = np.empty(0, dtype=np.int64)
        self._cur = np.empty(0, dtype=np.int64)

    def _rows(self, width: int):
        if len(self._prev) < width:
            self._prev = np.empty(width, dtype=np.int64)
            self._cur = np.empty(width, dtype=np.int64)
        return self._prev, self._cur

    def __call__(self, a: str, b: str, kind: str = "levenshtein") -> int:
        if kind not in ("levenshtein", "lcs"):
            return string_distance(a, b, kind)
        sub_cost = 1 if kind == "levenshtein" else 2**30
        w = len(b) + 1
        prev, cur = self._rows(w)
        prev[:w] = np.arange(w)
        for i, ca in enumerate(a, 1):
            cur[0] = i
            for j, cb in enumerate(b, 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (0 if ca == cb else sub_cost),
                )
            prev, cur = cur, prev  # reference swap: both buffers persist
        return int(prev[w - 1])


def binary_hamming(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Bit Hamming over uint64 word arrays (src/dist/bits.jl:18-29)."""
    return popcount64(np.bitwise_xor(a, b))


# -- cloud (set-of-vectors) distances (src/dist/cloud.jl:15-120) ------------
def _nn_dists(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """min_b ||a-b|| for each a (inner NN loop, vectorized)."""
    d = np.sqrt(((A[:, None, :] - B[None, :, :]) ** 2).sum(axis=2))
    return d.min(axis=1)


def hausdorff(A: np.ndarray, B: np.ndarray) -> float:
    """max(max_a min_b, max_b min_a) (cloud.jl HausdorffDistance)."""
    return float(max(_nn_dists(A, B).max(), _nn_dists(B, A).max()))


def chamfer(A: np.ndarray, B: np.ndarray) -> float:
    """Symmetric mean-of-NN distances (cloud.jl ChamferDistance)."""
    return float(_nn_dists(A, B).mean() + _nn_dists(B, A).mean())


def emd_greedy(A: np.ndarray, B: np.ndarray, p: float = 1.0) -> float:
    """Greedy perfect-matching EMD (``/root/reference/src/dist/cloud.jl:92-120``).

    For each row of A in order, scan the still-unmatched rows of
    B[:len(A)] for the minimum ``dist^p``; the matched row is swapped
    out of the candidate pool. Faithful to the reference's accumulation
    rule (cloud.jl:109 adds ``d`` on every *improvement* during the
    scan, not just the final minimum — semantics, not an optimization
    target here). Returns ``s^(1/p)``. Requires ``len(B) >= len(A)``;
    only the first ``len(A)`` rows of B participate, as in the
    reference's candidate array ``C = 1:n``."""
    n = len(A)
    if len(B) < n:
        raise ValueError("emd_greedy needs len(B) >= len(A)")
    C = np.arange(n)
    s = 0.0
    for i in range(n):
        d = np.sqrt(((B[C[i:]] - A[i]) ** 2).sum(axis=1)) ** p
        # reference scan: s += d at every new running minimum
        run_min = np.minimum.accumulate(d)
        improved = np.r_[True, run_min[1:] < run_min[:-1]]
        s += float(d[improved].sum())
        j = i + int(np.flatnonzero(d == run_min[-1])[0])
        C[i], C[j] = C[j], C[i]
    return float(s ** (1.0 / p))
