"""Multimodal (image/audio/video) columns: binary payloads + typed
metadata, processed by actor-pool ``map_batches`` stages.

Task-brief contract: the image/audio libraries are NOT in this
container, so the *decode* of real formats is stubbed — importing a
real decoder is attempted once per actor in ``__init__`` and a
deterministic fake-format codec is used otherwise — while the Ray-side
plumbing (schemas, binary columns, batch sizing for wide rows, actor
signature, output layout) is real and tested.

Fake media synthesis is deterministic from the documents fixture: a
``FAKEIMG1`` container holding (width, height, channel) and a
text-derived byte payload. All batch stages are flat-buffer numpy
kernels over the Arrow binary column (offsets + values — no per-blob
Python slicing); the per-row scalar twins (:func:`_fake_media`,
:meth:`MediaDecoder._decode_fake`) stay as the byte-identity oracle
the tests pin the kernels against. The only residual per-row call is
one ``blake2b`` C digest per text in synthesis — inherent to the
content hash, like a real decoder call would be per image.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

__all__ = ["media_dataset", "MediaDecoder", "decode_features", "sample_frames"]

_MAGIC = b"FAKEIMG1"
_HDR = len(_MAGIC) + 4  # magic + u16 width + u16 height


def _fake_media(doc_id: int, text: str) -> bytes:
    """Deterministic fake image container: magic + w + h + payload.
    SCALAR TWIN of the batched ``synth`` kernel — byte-identity pinned
    by tests/test_extensions.py."""
    h = hashlib.blake2b(text.encode(), digest_size=32).digest()
    w = 16 + (doc_id % 16)
    ht = 16 + (doc_id % 8)
    payload = (h * ((w * ht * 3) // len(h) + 1))[: w * ht * 3]
    return _MAGIC + struct.pack("<HH", w, ht) + payload


def _binary_column(offsets: np.ndarray, flat: np.ndarray) -> pa.Array:
    """Arrow binary array from int64 row offsets + flat uint8 values
    (one buffer handoff, no per-row Python)."""
    return pa.Array.from_buffers(
        pa.binary(),
        len(offsets) - 1,
        [None, pa.py_buffer(offsets.astype(np.int32).tobytes()), pa.py_buffer(flat.tobytes())],
    )


def _media_buffers(col) -> tuple[np.ndarray, np.ndarray]:
    """(row_offsets int64, flat uint8 values) of a binary column."""
    arr = col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()  # ChunkedArray with ≤1 chunk
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0) if arr.num_chunks else pa.array([], type=pa.binary())
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    vals = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return offs, vals


def media_dataset(sf_dir: str):
    """(doc_id, media:binary, media_type, n_bytes) — the opaque binary
    column with typed metadata. Batches stay small: wide binary rows
    must not blow block sizes (SURVEY.md §7 wide-row watch item)."""
    import ray.data as rd

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        n = len(ids)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "media": pa.array([], type=pa.binary()),
                    "media_type": pa.array([], type=pa.string()),
                    "n_bytes": pa.array([], type=pa.int64()),
                }
            )
        # per-row digest (the one inherent per-row call); everything
        # after is one vectorized container-assembly pass
        digs = np.frombuffer(
            b"".join(
                hashlib.blake2b(t.encode(), digest_size=32).digest() for t in texts
            ),
            dtype=np.uint8,
        ).reshape(n, 32)
        w = (16 + ids % 16).astype(np.int64)
        ht = (16 + ids % 8).astype(np.int64)
        plen = w * ht * 3
        reps = int(plen.max() // 32 + 1)
        tiled = np.tile(digs, (1, reps))  # row r: digest repeated — prefix == scalar twin
        hdr = np.empty((n, _HDR), dtype=np.uint8)
        hdr[:, : len(_MAGIC)] = np.frombuffer(_MAGIC, dtype=np.uint8)
        hdr[:, len(_MAGIC)] = w & 0xFF
        hdr[:, len(_MAGIC) + 1] = w >> 8
        hdr[:, len(_MAGIC) + 2] = ht & 0xFF
        hdr[:, len(_MAGIC) + 3] = ht >> 8
        rowlen = _HDR + plen
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(rowlen, out=offsets[1:])
        flat = np.empty(int(offsets[-1]), dtype=np.uint8)
        row_of = np.repeat(np.arange(n, dtype=np.int64), rowlen)
        pos_in = np.arange(int(offsets[-1]), dtype=np.int64) - np.repeat(offsets[:-1], rowlen)
        is_hdr = pos_in < _HDR
        flat[is_hdr] = hdr[row_of[is_hdr], pos_in[is_hdr]]
        flat[~is_hdr] = tiled[row_of[~is_hdr], pos_in[~is_hdr] - _HDR]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media": _binary_column(offsets, flat),
                "media_type": pa.array(["image/x-fake"] * n),
                "n_bytes": pa.array(rowlen, type=pa.int64()),
            }
        )

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        synth, batch_format="pyarrow", batch_size=256
    )


class MediaDecoder:
    """Actor-pool decode + feature-extract stage.

    ``__init__`` runs once per actor: try the real decoder (PIL), fall
    back to the fake-format codec. ``__call__`` per batch: decode →
    (doc_id, width, height, mean_byte, std_byte) — one flat-buffer
    pass over the whole batch (headers parsed from the values buffer,
    per-row mean/std via ``reduceat`` on the payload bytes), no
    per-blob Python. With a REAL format the decode itself would be one
    library call per blob (inherent); the surrounding plumbing stays
    batch-shaped either way.
    """

    def __init__(self, strict: bool = False):
        try:  # real decoder path (absent in this container)
            from PIL import Image  # noqa: F401

            self._real = True
        except ImportError:
            self._real = False
            if strict:
                raise NotImplementedError(
                    "real image decoding requires PIL; container ships none "
                    "(stubbed per task brief — fake-format codec active)"
                )

    @staticmethod
    def _decode_fake(blob: bytes) -> tuple[int, int, np.ndarray]:
        """SCALAR TWIN of the batch kernel (tests pin equality of the
        rounded features on the fixture)."""
        if blob[: len(_MAGIC)] != _MAGIC:
            raise ValueError("not a FAKEIMG1 container")
        w, h = struct.unpack("<HH", blob[len(_MAGIC) : _HDR])
        px = np.frombuffer(blob, dtype=np.uint8, offset=_HDR)
        return w, h, px

    def __call__(self, batch: pa.Table) -> pa.Table:
        offs, vals = _media_buffers(batch["media"])
        n = len(offs) - 1
        starts = offs[:-1]
        magic = np.frombuffer(_MAGIC, dtype=np.uint8)
        m = len(_MAGIC)
        heads = vals[(starts[:, None] + np.arange(m)[None, :]).reshape(-1)].reshape(n, m)
        if not (heads == magic[None, :]).all():
            raise ValueError("not a FAKEIMG1 container")
        w = vals[starts + m].astype(np.int64) | (vals[starts + m + 1].astype(np.int64) << 8)
        h = vals[starts + m + 2].astype(np.int64) | (vals[starts + m + 3].astype(np.int64) << 8)
        plen = (offs[1:] - starts - _HDR).astype(np.int64)
        # payload-only flat view: drop the 12 header bytes of every row
        total = int(plen.sum())
        pstarts = np.zeros(n, dtype=np.int64)
        np.cumsum(plen[:-1], out=pstarts[1:])
        gather = np.repeat(starts + _HDR, plen) + (
            np.arange(total, dtype=np.int64) - np.repeat(pstarts, plen)
        )
        px = vals[gather].astype(np.float64)
        sums = np.add.reduceat(px, pstarts) if n else np.empty(0)
        mean = sums / plen
        centered = px - np.repeat(mean, plen)
        var = np.add.reduceat(centered * centered, pstarts) / plen if n else np.empty(0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "width": pa.array(w, type=pa.int64()),
                "height": pa.array(h, type=pa.int64()),
                "mean_byte": pa.array(np.round(mean, 6), type=pa.float64()),
                "std_byte": pa.array(np.round(np.sqrt(var), 6), type=pa.float64()),
            }
        )


def decode_features(sf_dir: str, concurrency: int = 2):
    """media → per-image features via the actor pool (stateful stage:
    decoder loads once per actor)."""
    return media_dataset(sf_dir).map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=128,
        concurrency=concurrency,
    )


def sample_frames(sf_dir: str, every: int = 4, frame_bytes: int = 256):
    """Treat each payload as a frame stream; keep every Nth frame —
    the video frame-sampling plumbing (stateless, flat_map-shaped:
    one input row → many frame rows). One flat-buffer gather per
    batch: kept-frame start offsets compute vectorized from the
    binary column's offsets, the frame bytes come out in a single
    fancy-index, and the output binary column is built from (uniform)
    offsets + the gathered flat buffer."""

    def frames(batch: pa.Table) -> pa.Table:
        offs, vals = _media_buffers(batch["media"])
        n = len(offs) - 1
        ids = batch["doc_id"].to_numpy()
        plen = offs[1:] - offs[:-1] - _HDR
        nfr = plen // frame_bytes
        nkept = (nfr + every - 1) // every
        total_f = int(nkept.sum())
        if not total_f:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "frame_idx": pa.array([], type=pa.int64()),
                    "frame": pa.array([], type=pa.binary()),
                }
            )
        row_of = np.repeat(np.arange(n, dtype=np.int64), nkept)
        kstarts = np.zeros(n, dtype=np.int64)
        np.cumsum(nkept[:-1], out=kstarts[1:])
        k_in_row = np.arange(total_f, dtype=np.int64) - np.repeat(kstarts, nkept)
        frame_idx = k_in_row * every
        fstarts = offs[:-1][row_of] + _HDR + frame_idx * frame_bytes
        gather = np.repeat(fstarts, frame_bytes) + np.tile(
            np.arange(frame_bytes, dtype=np.int64), total_f
        )
        flat = vals[gather]
        out_offs = np.arange(total_f + 1, dtype=np.int64) * frame_bytes
        return pa.table(
            {
                "doc_id": pa.array(ids[row_of], type=pa.int64()),
                "frame_idx": pa.array(frame_idx, type=pa.int64()),
                "frame": _binary_column(out_offs, flat),
            }
        )

    return media_dataset(sf_dir).map_batches(frames, batch_format="pyarrow", batch_size=64)
