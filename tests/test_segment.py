from __future__ import annotations

import numpy as np
import pytest

from similaritysearch_jl_ray.functions.bm25 import tf_norm
from similaritysearch_jl_ray.state.segment import (
    EncodedPostings,
    concat_runs,
    decode_all,
    decode_blocks,
    encode_postings,
)


def _random_postings(rng, n, id_lo=0, id_hi=10**7):
    doc_ids = np.sort(rng.choice(np.arange(id_lo, id_hi, dtype=np.int64), size=n, replace=False))
    tfs = rng.integers(1, 50, size=n).astype(np.int64)
    dls = rng.integers(5, 500, size=n).astype(np.int64)
    return doc_ids, tfs, dls


def test_roundtrip():
    rng = np.random.default_rng(5)
    for n in [1, 2, 127, 128, 129, 1000, 5000]:
        ids, tfs, dls = _random_postings(rng, n)
        enc = encode_postings(ids, tfs, dls, block_size=128)
        assert enc.df == n and enc.cf == int(tfs.sum())
        out_ids, out_tfs, out_dls = decode_all(enc)
        assert (out_ids == ids).all()
        assert (out_tfs == tfs).all()
        assert (out_dls == dls).all()


def test_block_metadata_and_partial_decode():
    rng = np.random.default_rng(6)
    ids, tfs, dls = _random_postings(rng, 1000)
    enc = encode_postings(ids, tfs, dls, block_size=128)
    nblocks = len(enc.block_count)
    assert nblocks == 8  # ceil(1000/128)
    assert enc.block_first[0] == ids[0] and enc.block_last[-1] == ids[-1]
    # (max_tf, min_dl) are exact per-block extrema, and the derived
    # tf_norm bound dominates every member posting for any avgdl
    tfn = tf_norm(tfs, dls, 100.0)
    for i in range(nblocks):
        s, e = i * 128, min((i + 1) * 128, 1000)
        assert enc.block_max_tf[i] == tfs[s:e].max()
        assert enc.block_min_dl[i] == dls[s:e].min()
        bound = tf_norm(enc.block_max_tf[i], enc.block_min_dl[i], 100.0)
        assert bound >= tfn[s:e].max() - 1e-12
    # partial decode of an arbitrary ascending subset
    bidx = np.array([0, 3, 7])
    out_ids, out_tfs, out_dls = decode_blocks(enc, bidx)
    want = np.concatenate([np.arange(i * 128, min((i + 1) * 128, 1000)) for i in bidx])
    assert (out_ids == ids[want]).all()
    assert (out_tfs == tfs[want]).all()
    assert (out_dls == dls[want]).all()


def test_concat_runs_equals_whole():
    rng = np.random.default_rng(7)
    ids, tfs, dls = _random_postings(rng, 2000)
    cuts = [0, 700, 701, 1990, 2000]  # uneven, incl. a 1-posting run
    runs = []
    for a, b in zip(cuts[:-1], cuts[1:]):
        runs.append(encode_postings(ids[a:b], tfs[a:b], dls[a:b], block_size=128))
    merged = concat_runs(runs)
    assert merged.df == 2000 and merged.cf == int(tfs.sum())
    out_ids, out_tfs, out_dls = decode_all(merged)
    assert (out_ids == ids).all()
    assert (out_tfs == tfs).all()
    assert (out_dls == dls).all()
    # block extrema remain valid upper bounds on each block's tf-norm
    tfn_by_id = dict(zip(ids.tolist(), tf_norm(tfs, dls, 100.0).tolist()))
    for i in range(len(merged.block_count)):
        bi, _, _ = decode_blocks(merged, np.array([i]))
        bound = tf_norm(merged.block_max_tf[i], merged.block_min_dl[i], 100.0)
        assert bound >= max(tfn_by_id[d] for d in bi.tolist()) - 1e-12


def test_concat_mixed_positions_warns_and_drops():
    """Merging a positional with a non-positional run drops the
    sidecar LOUDLY (segment-level with_positions can't express a
    per-term loss) — all-positional merges keep it silently."""
    rng = np.random.default_rng(9)
    ids, tfs, dls = _random_postings(rng, 200)
    pos_a = np.sort(
        rng.choice(10**6, size=int(tfs[:100].sum()), replace=False)
    ).astype(np.int64)
    a = encode_postings(ids[:100], tfs[:100], dls[:100], positions=pos_a)
    b = encode_postings(ids[100:], tfs[100:], dls[100:])  # no positions
    with pytest.warns(UserWarning, match="dropping the positions sidecar"):
        merged = concat_runs([a, b])
    assert len(merged.pos_payload) == 0
    pos_b = np.sort(
        rng.choice(10**6, size=int(tfs[100:].sum()), replace=False)
    ).astype(np.int64)
    b2 = encode_postings(ids[100:], tfs[100:], dls[100:], positions=pos_b)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        both = concat_runs([a, b2])
    assert len(both.pos_payload) > 0


def test_concat_rejects_overlap():
    rng = np.random.default_rng(8)
    ids, tfs, dls = _random_postings(rng, 100)
    a = encode_postings(ids[:60], tfs[:60], dls[:60])
    b = encode_postings(ids[50:], tfs[50:], dls[50:])
    with pytest.raises(ValueError):
        concat_runs([a, b])


def test_unsorted_rejected():
    with pytest.raises(ValueError):
        encode_postings(np.array([5, 3]), np.array([1, 1]), np.array([10, 10]))


def test_row_roundtrip():
    rng = np.random.default_rng(9)
    ids, tfs, dls = _random_postings(rng, 300)
    enc = encode_postings(ids, tfs, dls)
    row = enc.to_row("hello")
    back = EncodedPostings.from_row(row)
    out_ids, out_tfs, out_dls = decode_all(back)
    assert (out_ids == ids).all() and (out_tfs == tfs).all() and (out_dls == dls).all()


def test_grouped_encode_bit_identical():
    """encode_postings_grouped must produce byte-identical payloads and
    identical block metadata to calling encode_postings per group —
    the build's fused D1 stage relies on this (build_index.encode_local)."""
    from similaritysearch_jl_ray.state.segment import encode_postings_grouped

    rng = np.random.default_rng(11)
    for trial in range(8):
        k = int(rng.integers(1, 10))
        groups = []
        for _ in range(k):
            n = int(rng.integers(1, 300))
            ids = np.sort(rng.choice(10**6, size=n, replace=False)).astype(np.int64)
            tfs = rng.integers(1, 6, size=n).astype(np.int64)
            dls = rng.integers(5, 500, size=n).astype(np.int64)
            pos = np.concatenate(
                [np.sort(rng.choice(1000, size=t, replace=False)) for t in tfs]
            ).astype(np.int64)
            groups.append((ids, tfs, dls, pos))
        doc_ids = np.concatenate([g[0] for g in groups])
        tfs = np.concatenate([g[1] for g in groups])
        dls = np.concatenate([g[2] for g in groups])
        pos = np.concatenate([g[3] for g in groups])
        go = np.r_[0, np.cumsum([len(g[0]) for g in groups])]
        bs = int(rng.choice([4, 16, 128]))
        with_pos = trial % 2 == 0
        out = encode_postings_grouped(
            doc_ids, tfs, dls, go, block_size=bs, positions=pos if with_pos else None
        )
        for g, (ids, tf, dl, p) in enumerate(groups):
            ref = encode_postings(ids, tf, dl, block_size=bs, positions=p if with_pos else None)
            row = ref.to_row("t")
            assert out["df"][g].as_py() == ref.df
            assert out["cf"][g].as_py() == ref.cf
            assert out["run_first"][g].as_py() == row["run_first"]
            assert out["run_last"][g].as_py() == row["run_last"]
            assert out["payload"][g].as_py() == bytes(ref.payload)
            assert out["pos_payload"][g].as_py() == (bytes(ref.pos_payload) if with_pos else b"")
            for name in (
                "block_first", "block_last", "block_count", "block_offset",
                "block_vstart", "block_max_tf", "block_min_dl",
                "block_pvstart", "block_poffset",
            ):
                assert out[name][g].as_py() == row[name], (trial, g, name)


def test_grouped_encode_validation():
    from similaritysearch_jl_ray.state.segment import encode_postings_grouped

    one = np.ones(2, np.int64)
    with pytest.raises(ValueError):  # non-increasing within a group
        encode_postings_grouped(np.array([3, 2]), one, one, np.array([0, 2]))
    with pytest.raises(ValueError):  # empty group
        encode_postings_grouped(np.array([1, 2]), one, one, np.array([0, 0, 2]))
    # decreasing ACROSS a group boundary is legal
    encode_postings_grouped(
        np.array([5, 9, 2, 3]), np.ones(4, np.int64), np.ones(4, np.int64), np.array([0, 2, 4])
    )


def test_positions_block_selective_decode():
    """Layout v5: decode_positions_blocks over any ascending block
    subset equals the matching slice of the full decode_positions —
    including across concat_runs (offsets shift with the sidecar)."""
    from similaritysearch_jl_ray.state.segment import (
        decode_blocks,
        decode_positions,
        decode_positions_blocks,
    )

    rng = np.random.default_rng(21)
    ids, tfs, dls = _random_postings(rng, 500)
    pos = np.concatenate(
        [np.sort(rng.choice(4000, size=t, replace=False)) for t in tfs]
    ).astype(np.int64)
    enc = encode_postings(ids, tfs, dls, block_size=16, positions=pos)
    assert enc.has_pos_blocks
    full = decode_positions(enc, tfs)
    offs = np.r_[0, np.cumsum(tfs)]
    blk = np.r_[0 : len(ids) : 16]
    for _ in range(10):
        nb = len(enc.block_count)
        bidx = np.sort(rng.choice(nb, size=rng.integers(1, nb + 1), replace=False))
        ids_b, tfs_b, _ = decode_blocks(enc, bidx)
        got = decode_positions_blocks(enc, bidx, tfs_b)
        want = np.concatenate(
            [full[offs[blk[b]] : offs[min(blk[b] + 16, len(ids))]] for b in bidx]
        )
        assert (got == want).all()
    # concat of two runs keeps the selective decode exact
    mid = 256
    a = encode_postings(ids[:mid], tfs[:mid], dls[:mid], block_size=16,
                        positions=pos[: int(tfs[:mid].sum())])
    b = encode_postings(ids[mid:], tfs[mid:], dls[mid:], block_size=16,
                        positions=pos[int(tfs[:mid].sum()) :])
    cat = concat_runs([a, b])
    assert cat.has_pos_blocks
    nb = len(cat.block_count)
    bidx = np.sort(rng.choice(nb, size=nb // 2, replace=False))
    ids_b, tfs_b, _ = decode_blocks(cat, bidx)
    got = decode_positions_blocks(cat, bidx, tfs_b)
    # reference: whole-run decode of the concat, sliced per block
    full_cat = decode_positions(cat, np.concatenate([tfs[:mid], tfs[mid:]]))
    cnt = cat.block_count.astype(np.int64)
    pstart = np.r_[0, np.cumsum(cnt)]
    offs_cat = np.r_[0, np.cumsum(np.concatenate([tfs[:mid], tfs[mid:]]))]
    want = np.concatenate(
        [full_cat[offs_cat[pstart[i]] : offs_cat[pstart[i + 1]]] for i in bidx]
    )
    assert (got == want).all()
    # v4 row (no sidecar offsets) falls back loudly
    row = enc.to_row("t")
    row.pop("block_pvstart"); row.pop("block_poffset")
    v4 = EncodedPostings.from_row(row)
    assert not v4.has_pos_blocks
    with pytest.raises(ValueError):
        decode_positions_blocks(v4, np.array([0]), decode_blocks(v4, np.array([0]))[1])
