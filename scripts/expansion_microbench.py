"""Dictionary-expansion microbench on a synthetic 1M-term vocabulary.

Evidence for the sublinear-expansion claim (BASELINE §E.5): fuzzy
expansion must beat the O(vocab) Levenshtein scan and regexp expansion
must beat the O(vocab) RE2 sweep, with IDENTICAL result sets, on a
dictionary ~3 orders of magnitude past the bench fixture's vocabulary.

Single-process, no Ray: the expansion kernels are actor-resident
methods, exercised here on a Bm25Scorer shell with a synthetic
dictionary (the methods touch only ``_dictionary()`` state).

Run: PYTHONPATH=/root/repo python scripts/expansion_microbench.py
"""

from __future__ import annotations

import time

import numpy as np


def _synth_vocab(n: int = 1_000_000, seed: int = 7) -> np.ndarray:
    """Deterministic pseudo-words: 4-12 lowercase chars, zipf-ish
    letter mix — enough prefix diversity for range narrowing and
    enough shared trigrams to stress the prefilter."""
    rng = np.random.default_rng(seed)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    probs = np.linspace(3.0, 0.4, 26)
    probs /= probs.sum()
    lens = rng.integers(4, 13, size=n)
    flat = rng.choice(letters, size=int(lens.sum()), p=probs)
    out = np.empty(n, dtype=object)
    off = 0
    for i, ln in enumerate(lens):
        out[i] = "".join(flat[off : off + ln])
        off += ln
    return np.unique(out)


def _shell(vocab: np.ndarray):
    from similaritysearch_jl_ray.pipelines.query import Bm25Scorer

    sc = Bm25Scorer.__new__(Bm25Scorer)
    sc._dict_cache = np.sort(vocab)
    return sc


def main() -> None:
    from similaritysearch_jl_ray.functions.distances import string_distance

    vocab = _synth_vocab()
    sc = _shell(vocab)
    d = sc._dictionary()
    print(f"vocab: {len(d):,} terms")

    # one-time costs (amortized across every query of an actor's life)
    t0 = time.perf_counter()
    sc._gram_index()
    t_gram = time.perf_counter() - t0

    fuzz_toks = [str(d[i]) for i in range(0, len(d), len(d) // 8)][:8]
    t_tri = t_scan = 0.0
    for tok in fuzz_toks:
        t0 = time.perf_counter()
        got = set(sc._expand_fuzzy(tok, 1))
        t_tri += time.perf_counter() - t0
        t0 = time.perf_counter()
        want = {str(t) for t in d if string_distance(tok, str(t), "levenshtein") <= 1}
        t_scan += time.perf_counter() - t0
        assert got == want, f"fuzzy mismatch for {tok}"
    print(
        f"fuzzy e=1 x{len(fuzz_toks)}: trigram {1e3 * t_tri / len(fuzz_toks):.2f} ms/q"
        f" vs full scan {1e3 * t_scan / len(fuzz_toks):.0f} ms/q"
        f" = {t_scan / t_tri:.0f}x (gram index one-time {t_gram:.2f} s)"
    )

    import pyarrow as pa
    import pyarrow.compute as pc

    pats = [f"{str(d[i])[:4]}[a-z]*g" for i in range(0, len(d), len(d) // 6)][:6]
    t_nar = t_full = 0.0
    full_arr = pa.array([str(t) for t in d])
    for pat in pats:
        t0 = time.perf_counter()
        got = set(sc._expand_regexp(pat))
        t_nar += time.perf_counter() - t0
        t0 = time.perf_counter()
        m = pc.match_substring_regex(full_arr, f"^(?:{pat})$")
        want = set(pc.filter(full_arr, m).to_pylist())
        t_full += time.perf_counter() - t0
        assert got == want, f"regexp mismatch for {pat}"
    print(
        f"regexp x{len(pats)}: prefix-narrowed {1e3 * t_nar / len(pats):.2f} ms/q"
        f" vs full RE2 sweep {1e3 * t_full / len(pats):.0f} ms/q"
        f" = {t_full / t_nar:.0f}x"
    )


if __name__ == "__main__":
    main()
