"""Deterministic hashing kernels for dedup: shingles, MinHash, SimHash.

All constants are fixed (no process-randomized ``hash()``), so results
are reproducible across runs, partitions and cluster sizes — the same
determinism requirement the index build has for doc_ids (SURVEY.md §7).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = [
    "stable_u64",
    "hash_tokens_u64",
    "shingle_hashes",
    "batch_shingle_sets",
    "minhash_signature",
    "batch_minhash_signatures",
    "band_keys",
    "simhash64",
    "batch_simhash64",
    "popcount64",
    "MINHASH_PERMS",
    "MINHASH_BANDS",
]

# FNV-1a fold constants + a splitmix64 finalizer: the vectorized
# n-gram combiner (hash tokens once, fold windows) that replaced the
# per-gram blake2b calls — same 64-bit birthday bound, no per-row
# Python. All arithmetic wraps mod 2^64 (numpy uint64 arrays).
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_TOKEN_HASH_SEED = 0x5EED5EED


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain constant set) — spreads the
    low-entropy FNV fold output across all 64 bits."""
    x = np.array(x, dtype=np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def hash_tokens_u64(tokens) -> np.ndarray:
    """Vectorized process-stable u64 hash of a string sequence
    (polars' native xxhash kernel — the same kernel exact_dedup's
    content hash rides on). Accepts list[str] / object ndarray /
    Arrow (Chunked)Array; preserves order."""
    import polars as pl

    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    if isinstance(tokens, pa.Array):
        s = pl.from_arrow(tokens)
    else:
        s = pl.Series([str(t) for t in tokens], dtype=pl.String)
    if len(s) == 0:
        return np.empty(0, dtype=np.uint64)
    return s.hash(seed=_TOKEN_HASH_SEED).to_numpy().astype(np.uint64, copy=False)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 has no bitwise_count).

    The reference's binary Hamming kernel counts bits over UInt64 words
    the same way (``/root/reference/src/dist/bits.jl:18-29``)."""
    v = np.ascontiguousarray(x, dtype=np.uint64)
    return np.unpackbits(v.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1).astype(np.int64)

_MERSENNE = (1 << 61) - 1
MINHASH_PERMS = 64
MINHASH_BANDS = 8  # 8 bands × 8 rows

# fixed multiply-shift constants (seeded once, hard-coded seed): the
# MinHash family is h_p(x) = a_p·x + b_p mod 2^64 with a_p odd —
# Dietzfelbinger's multiply-shift, 2-approximately-universal, and the
# shingle inputs are already splitmix64-finalized (uniform bits), so
# the LSH S-curve analysis holds in practice. Chosen over the earlier
# exact Mersenne-field affine family because it is 2 vector ops per
# permutation instead of ~12 (the signature stage was the dedup
# suite's throughput bound); empty sets keep the max-u64 sentinel.
_rng = np.random.default_rng(0xC0FFEE)
_A = (
    _rng.integers(0, 1 << 63, size=MINHASH_PERMS, dtype=np.int64).astype(np.uint64)
    * np.uint64(2)
    + np.uint64(1)
)  # odd multipliers
_B = _rng.integers(0, 1 << 63, size=MINHASH_PERMS, dtype=np.int64).astype(np.uint64)
_MINHASH_EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)


def stable_u64(s: str) -> int:
    """First 8 bytes of blake2b — stable across processes."""
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")


def _fold_windows(token_hashes: np.ndarray, n: int) -> np.ndarray:
    """FNV-fold every length-``n`` window of a token-hash array and
    finalize with :func:`_mix64` — the shared scalar/batch n-gram
    combiner (both paths MUST produce identical values)."""
    m = len(token_hashes) - n + 1
    g = np.full(m, _FNV_OFFSET, dtype=np.uint64)
    for k in range(n):
        g = (g * _FNV_PRIME) ^ token_hashes[k : k + m]
    return _mix64(g)


def shingle_hashes(tokens, n: int = 3) -> np.ndarray:
    """Sorted distinct hashed token n-grams (uint64). Shorter docs
    hash the whole token sequence as one shingle. Values are identical
    to :func:`batch_shingle_sets` over the same tokens (one token-hash
    pass + the FNV window fold — no per-gram string building)."""
    th = hash_tokens_u64(tokens)
    if len(th) == 0:
        return np.empty(0, dtype=np.uint64)
    if len(th) < n:
        return _fold_windows(th, len(th))  # one whole-sequence gram
    return np.unique(_fold_windows(th, n))


def batch_shingle_sets(
    doc_of_token: np.ndarray, token_hashes: np.ndarray, n_docs: int, n: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """Per-document distinct shingle sets for a whole batch, fully
    vectorized — the batch twin of :func:`shingle_hashes`.

    Inputs are occurrence-level (``functions.text.flat_tokens`` +
    :func:`hash_tokens_u64`): ``doc_of_token`` maps each token to its
    doc index (non-decreasing, doc-major), ``token_hashes`` its u64
    hash. Returns ``(counts, flat)``: ``counts[i]`` distinct shingles
    of doc i, ``flat`` the concatenated per-doc SORTED distinct shingle
    hashes (doc-major). Row-identical to calling ``shingle_hashes`` on
    each doc's token list."""
    counts0 = np.bincount(doc_of_token, minlength=n_docs).astype(np.int64)
    if len(token_hashes) == 0:
        return np.zeros(n_docs, dtype=np.int64), np.empty(0, dtype=np.uint64)
    vals_l, doc_l = [], []
    total = len(token_hashes)
    # full n-windows: valid iff the window's endpoints share a doc
    # (doc_of_token is non-decreasing, so equality bounds the middle)
    if total >= n:
        g = _fold_windows(token_hashes, n)
        valid = doc_of_token[: total - n + 1] == doc_of_token[n - 1 :]
        vals_l.append(g[valid])
        doc_l.append(doc_of_token[: total - n + 1][valid])
    # short docs (0 < len < n): one whole-sequence gram each
    starts = np.cumsum(counts0) - counts0
    for length in range(1, n):
        dsel = np.flatnonzero(counts0 == length)
        if not len(dsel):
            continue
        st = starts[dsel]
        g = np.full(len(dsel), _FNV_OFFSET, dtype=np.uint64)
        for k in range(length):
            g = (g * _FNV_PRIME) ^ token_hashes[st + k]
        vals_l.append(_mix64(g))
        doc_l.append(dsel.astype(np.int64))
    if not vals_l:
        return np.zeros(n_docs, dtype=np.int64), np.empty(0, dtype=np.uint64)
    vals = np.concatenate(vals_l)
    gdoc = np.concatenate(doc_l)
    # distinct per doc, ascending within doc: sort (doc, val), drop dups
    o = np.lexsort((vals, gdoc))
    vals, gdoc = vals[o], gdoc[o]
    keep = np.r_[True, (gdoc[1:] != gdoc[:-1]) | (vals[1:] != vals[:-1])]
    vals, gdoc = vals[keep], gdoc[keep]
    return np.bincount(gdoc, minlength=n_docs).astype(np.int64), vals


def _mulmod_mersenne61(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Exact (a·x) mod (2^61−1), vectorized, no uint64 overflow.

    Both operands must be < 2^61. The 122-bit product is formed in
    32-bit limbs: a = ah·2^32 + al, x = xh·2^32 + xl, then reduced with
    2^61 ≡ 1 (mod M) — so 2^64 ≡ 8 and mid·2^32 splits at bit 29.
    Every intermediate below stays < 2^64 (bounds in comments)."""
    M = np.uint64(_MERSENNE)
    ah, al = a >> np.uint64(32), a & np.uint64(0xFFFFFFFF)   # ah < 2^29
    xh, xl = x >> np.uint64(32), x & np.uint64(0xFFFFFFFF)   # xh < 2^29
    # high term: ah·xh·2^64 ≡ ah·xh·8 ; ah·xh < 2^58 → ·8 < 2^61
    hi = ((ah * xh) << np.uint64(3)) % M
    # mid term: (ah·xl + al·xh)·2^32, each product < 2^61, sum < 2^62
    mid = ah * xl + al * xh
    mh, ml = mid >> np.uint64(29), mid & np.uint64((1 << 29) - 1)
    # mid·2^32 = mh·2^61 + ml·2^32 ≡ mh + ml·2^32 ; ml·2^32 < 2^61
    mid_red = (mh % M + ((ml << np.uint64(32)) % M)) % M
    lo = (al * xl) % M                                        # < 2^64 pre-mod
    return (hi + mid_red + lo) % M  # ≤ 3(M−1) < 2^63, no overflow


def minhash_signature(shingles: np.ndarray) -> np.ndarray:
    """64-perm MinHash signature (uint64) of a shingle-hash set.

    Multiply-shift family: h_p(x) = a_p·x + b_p mod 2^64, a_p odd
    (Dietzfelbinger et al.) — 2 vector ops per permutation. The
    shingle values are splitmix64-finalized (:func:`_mix64`), so the
    family behaves like independent random hashing on this input;
    empty sets return the max-u64 sentinel row."""
    if len(shingles) == 0:
        return np.full(MINHASH_PERMS, _MINHASH_EMPTY, dtype=np.uint64)
    x = shingles.astype(np.uint64)[None, :]
    h = _A[:, None] * x + _B[:, None]
    return h.min(axis=1)


def batch_minhash_signatures(counts: np.ndarray, flat: np.ndarray) -> np.ndarray:
    """(n_docs × MINHASH_PERMS) uint64 signatures over per-doc shingle
    sets laid out as ``(counts, flat)`` (:func:`batch_shingle_sets`) —
    row-identical to :func:`minhash_signature` per doc, vectorized as
    64 permutation passes over the flat array + ``minimum.reduceat``
    per doc (never a docs×perms×shingles intermediate)."""
    n_docs = len(counts)
    sig = np.full((n_docs, MINHASH_PERMS), _MINHASH_EMPTY, dtype=np.uint64)
    if n_docs == 0 or len(flat) == 0:
        return sig
    x = flat.astype(np.uint64, copy=False)
    starts = np.cumsum(counts) - counts
    nonempty = np.flatnonzero(counts > 0)
    st = starts[nonempty]
    for p in range(MINHASH_PERMS):
        h = _A[p] * x + _B[p]
        sig[nonempty, p] = np.minimum.reduceat(h, st)
    return sig


def band_keys(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs × bands) int64 LSH bucket keys: FNV-fold + mix of each
    band's signature lanes (replaces one md5 call per (doc, band) —
    collisions only ADD candidates, which the exact verify removes)."""
    if MINHASH_PERMS % bands:
        raise ValueError(f"bands must divide {MINHASH_PERMS}")
    rows = MINHASH_PERMS // bands
    n_docs = sig.shape[0]
    out = np.empty((n_docs, bands), dtype=np.uint64)
    for b in range(bands):
        g = np.full(n_docs, _FNV_OFFSET, dtype=np.uint64)
        for r in range(rows):
            g = (g * _FNV_PRIME) ^ sig[:, b * rows + r]
        out[:, b] = _mix64(g)
    return out.view(np.int64)


def simhash64(terms: np.ndarray, weights: np.ndarray) -> int:
    """Weighted 64-bit SimHash over (term, weight) pairs."""
    if len(terms) == 0:
        return 0
    hs = hash_tokens_u64(list(terms))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.float64
    )
    acc = ((bits * 2.0 - 1.0) * np.asarray(weights, dtype=np.float64)[:, None]).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def batch_simhash64(
    doc_of_token: np.ndarray, token_hashes: np.ndarray, n_docs: int
) -> np.ndarray:
    """uint64 SimHash per doc from OCCURRENCE-level token hashes —
    bit-identical to ``simhash64(distinct_terms, counts)`` per doc
    (summing ±1 over occurrences equals summing ±count over distinct
    terms; all sums are exact integers, so the >0 bit test agrees).
    64 shift/and/reduceat passes — no per-doc Python, no docs×64
    float intermediate."""
    sims = np.zeros(n_docs, dtype=np.uint64)
    if len(token_hashes) == 0:
        return sims
    tc = np.bincount(doc_of_token, minlength=n_docs).astype(np.int64)
    starts = np.cumsum(tc) - tc
    nonempty = np.flatnonzero(tc > 0)
    st = starts[nonempty]
    tcn = tc[nonempty]
    for j in range(64):
        bit = ((token_hashes >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
        acc = 2 * np.add.reduceat(bit, st) - tcn
        sims[nonempty] |= (acc > 0).astype(np.uint64) << np.uint64(j)
    return sims
