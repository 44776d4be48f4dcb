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
text-derived byte payload.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

__all__ = ["media_dataset", "MediaDecoder", "decode_features", "sample_frames"]

_MAGIC = b"FAKEIMG1"


def _fake_media(doc_id: int, text: str) -> bytes:
    """Deterministic fake image container: magic + w + h + payload."""
    h = hashlib.blake2b(text.encode(), digest_size=32).digest()
    w = 16 + (doc_id % 16)
    ht = 16 + (doc_id % 8)
    payload = (h * ((w * ht * 3) // len(h) + 1))[: w * ht * 3]
    return _MAGIC + struct.pack("<HH", w, ht) + payload


def media_dataset(sf_dir: str):
    """(doc_id, media:binary, media_type, n_bytes) — the opaque binary
    column with typed metadata. Batches stay small: wide binary rows
    must not blow block sizes (SURVEY.md §7 wide-row watch item)."""
    import ray.data as rd

    def synth(batch: pa.Table) -> pa.Table:
        blobs = [
            _fake_media(int(d), t)
            for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist())
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media": pa.array(blobs, type=pa.binary()),
                "media_type": pa.array(["image/x-fake"] * len(blobs)),
                "n_bytes": pa.array([len(b) for b in blobs], type=pa.int64()),
            }
        )

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        synth, batch_format="pyarrow", batch_size=256
    )


class MediaDecoder:
    """Actor-pool decode + feature-extract stage.

    ``__init__`` runs once per actor: try the real decoder (PIL), fall
    back to the fake-format codec. ``__call__`` per batch: decode →
    (doc_id, width, height, mean_byte, std_byte).
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
        if blob[: len(_MAGIC)] != _MAGIC:
            raise ValueError("not a FAKEIMG1 container")
        w, h = struct.unpack("<HH", blob[len(_MAGIC) : len(_MAGIC) + 4])
        px = np.frombuffer(blob, dtype=np.uint8, offset=len(_MAGIC) + 4)
        return w, h, px

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "width": [], "height": [], "mean_byte": [], "std_byte": []}
        for doc_id, blob in zip(batch["doc_id"].to_pylist(), batch["media"].to_pylist()):
            w, h, px = self._decode_fake(blob)
            out["doc_id"].append(doc_id)
            out["width"].append(w)
            out["height"].append(h)
            out["mean_byte"].append(round(float(px.mean()), 6))
            out["std_byte"].append(round(float(px.std()), 6))
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "width": pa.array(out["width"], type=pa.int64()),
                "height": pa.array(out["height"], type=pa.int64()),
                "mean_byte": pa.array(out["mean_byte"], type=pa.float64()),
                "std_byte": pa.array(out["std_byte"], type=pa.float64()),
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
    one input row → many frame rows)."""
    def frames(batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "frame_idx": [], "frame": []}
        for doc_id, blob in zip(batch["doc_id"].to_pylist(), batch["media"].to_pylist()):
            body = blob[len(_MAGIC) + 4 :]
            n = len(body) // frame_bytes
            for i in range(0, n, every):
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["frame"].append(body[i * frame_bytes : (i + 1) * frame_bytes])
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "frame_idx": pa.array(out["frame_idx"], type=pa.int64()),
                "frame": pa.array(out["frame"], type=pa.binary()),
            }
        )

    return media_dataset(sf_dir).map_batches(frames, batch_format="pyarrow", batch_size=64)
