"""Deterministic hashing kernels for dedup: shingles, MinHash, SimHash.

All constants are fixed (no process-randomized ``hash()``), so results
are reproducible across runs, partitions and cluster sizes — the same
determinism requirement the index build has for doc_ids (SURVEY.md §7).
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = [
    "stable_u64",
    "shingle_hashes",
    "minhash_signature",
    "simhash64",
    "popcount64",
    "MINHASH_PERMS",
    "MINHASH_BANDS",
]


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 has no bitwise_count).

    The reference's binary Hamming kernel counts bits over UInt64 words
    the same way (``/root/reference/src/dist/bits.jl:18-29``)."""
    v = np.ascontiguousarray(x, dtype=np.uint64)
    return np.unpackbits(v.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1).astype(np.int64)

_MERSENNE = (1 << 61) - 1
MINHASH_PERMS = 64
MINHASH_BANDS = 8  # 8 bands × 8 rows

# fixed affine permutation constants (seeded once, hard-coded seed)
_rng = np.random.default_rng(0xC0FFEE)
_A = (_rng.integers(1, _MERSENNE, size=MINHASH_PERMS, dtype=np.int64)).astype(np.uint64)
_B = (_rng.integers(0, _MERSENNE, size=MINHASH_PERMS, dtype=np.int64)).astype(np.uint64)


def stable_u64(s: str) -> int:
    """First 8 bytes of blake2b — stable across processes."""
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")


def shingle_hashes(tokens: list[str], n: int = 3) -> np.ndarray:
    """Distinct hashed token n-grams (uint64). Shorter docs hash the
    whole token sequence as one shingle."""
    if len(tokens) < n:
        grams = [" ".join(tokens)] if tokens else []
    else:
        grams = [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
    if not grams:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.fromiter((stable_u64(g) for g in set(grams)), dtype=np.uint64))


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

    A true affine permutation family over the 2^61−1 Mersenne field
    (h = a·x + b mod M, a ∈ [1, M), b ∈ [0, M)) — the multiply is done
    in 32-bit limbs so the field arithmetic is exact, preserving the
    universal-hash collision bounds the LSH recall analysis assumes."""
    if len(shingles) == 0:
        return np.full(MINHASH_PERMS, np.uint64(_MERSENNE), dtype=np.uint64)
    x = shingles.astype(np.uint64)[None, :] % np.uint64(_MERSENNE)
    prod = _mulmod_mersenne61(_A[:, None], x)
    h = (prod + _B[:, None]) % np.uint64(_MERSENNE)
    return h.min(axis=1)


def simhash64(terms: np.ndarray, weights: np.ndarray) -> int:
    """Weighted 64-bit SimHash over (term, weight) pairs."""
    if len(terms) == 0:
        return 0
    hs = np.fromiter((stable_u64(t) for t in terms), dtype=np.uint64, count=len(terms))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.float64
    )
    acc = ((bits * 2.0 - 1.0) * np.asarray(weights, dtype=np.float64)[:, None]).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)
