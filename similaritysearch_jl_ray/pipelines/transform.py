"""Embedding transforms: random projection + scalar quantization as
Ray Data stages (SURVEY.md §2.2 rows "transform random projections" and
"scalar quantization encode").

Both are stateless ``map_batches`` with the (small) model broadcast via
``ray.put`` — the reference's ``@batch out[:,i] = M' * v`` loop
(``/root/reference/src/special/proj.jl:13-70``) becomes one matmul per
Arrow batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.quantize import sq_decode, sq_encode

__all__ = ["random_projection", "gaussian_matrix", "quantize_embeddings"]


def gaussian_matrix(in_dim: int, out_dim: int, seed: int = 0xAB) -> np.ndarray:
    """Seeded Gaussian projection; QR-orthonormalized when square-ish
    (the reference's GaussianRandomProjection / QR variant)."""
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((in_dim, out_dim))
    if out_dim <= in_dim:
        q, _ = np.linalg.qr(m)
        m = q[:, :out_dim]
    return m / np.sqrt(out_dim)


def random_projection(sf_dir: str, out_dim: int = 16, seed: int = 0xAB):
    """embeddings → (vec_id, projected: list<double>[out_dim])."""
    import ray
    import ray.data as rd

    import pyarrow.parquet as pq

    in_dim = len(
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])["embedding"][0]
    )
    ref = ray.put(gaussian_matrix(in_dim, out_dim, seed))

    def project(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        x = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        y = x @ m
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "projected": pa.array(list(y), type=pa.list_(pa.float64())),
            }
        )

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]).map_batches(
        project, batch_format="pyarrow"
    )


def quantize_embeddings(sf_dir: str, bits: int = 8):
    """embeddings → (vec_id, codes:binary, minv, c, max_abs_err).

    The per-row max reconstruction error column makes the quantizer's
    contract (err ≤ c/2) testable in the oracle-free driver check.
    """
    import ray.data as rd

    def q(batch: pa.Table) -> pa.Table:
        x = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        packed, mins, cs = sq_encode(x, bits=bits)
        back = sq_decode(packed, mins, cs, bits, x.shape[1])
        err = np.abs(back - x).max(axis=1)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "codes": pa.array([p.tobytes() for p in packed], type=pa.binary()),
                "minv": pa.array(mins, type=pa.float64()),
                "c": pa.array(cs, type=pa.float64()),
                "max_abs_err": pa.array(err, type=pa.float64()),
            }
        )

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]).map_batches(
        q, batch_format="pyarrow"
    )
