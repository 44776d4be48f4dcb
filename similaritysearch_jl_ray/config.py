"""Engine-wide constants and tunables.

The BM25 parameters and the tokenizer are part of the engine's
*correctness contract*: the DuckDB oracle SQL in ``__ray_entry__.py``
re-states exactly the same formula and token regex, so any change here
must be mirrored there.
"""

from __future__ import annotations

import dataclasses

# Tokenizer: lowercase + ASCII word runs. Chosen to be expressible
# identically in DuckDB as regexp_extract_all(lower(text), '[a-z0-9]+').
TOKEN_PATTERN = r"[a-z0-9]+"


@dataclasses.dataclass(frozen=True)
class Bm25Params:
    """Okapi BM25 with the Lucene-style idf.

    score(q, d) = sum over unique query terms t of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))

    All arithmetic in float64; term partials are summed in ascending
    term order (fixed accumulation order → reproducible across runs,
    SURVEY.md §7 "rank-identity" watch item).
    """

    k1: float = 1.2
    b: float = 0.75


DEFAULT_BM25 = Bm25Params()

# Posting-list layout (state/segment.py). Blocks are independent: each
# block's first docID is stored absolutely in the block header arrays,
# so sub-runs produced under different shuffle salts concatenate
# without re-encoding (SURVEY.md §7 step 4).
POSTING_BLOCK_SIZE = 128

# Index shuffle / layout knobs.
DEFAULT_NUM_PARTS = 8          # term-hash output partitions (postings/part=*/)
DEFAULT_SALT_FACTOR = 4        # sub-runs per head term in the groupby shuffle
HEAD_TERM_DF_FRACTION = 0.01   # df/N above this → term is salted ("head")

# Number of decimal digits both the engine's oracle-facing outputs and
# the DuckDB oracle round scores to before ranking/compare.
SCORE_ROUND_DECIMALS = 6

# On-disk segment layout version: bump on any change to RUN_SCHEMA /
# stats.json shape so cached indexes from older code are rebuilt, not
# misread (entry_helpers keys its /tmp cache by this).
INDEX_LAYOUT_VERSION = 5  # v5: per-block offsets into the positions sidecar

# Per-node budget for the decoded broadcast serving pack. search() with
# broadcast=None (the default) broadcasts only while the estimated
# decoded size fits this budget; above it, serving auto-routes to the
# doc-sharded pinned path (each actor holds ~1/n_shards of the index) —
# "every node holds the whole index" must never be an implicit
# assumption at scale. Override via GRAFT_PACK_BUDGET_BYTES.
import os as _os

BROADCAST_PACK_BUDGET_BYTES = int(
    _os.environ.get("GRAFT_PACK_BUDGET_BYTES", 2 << 30)
)

# Default fan-out for hash-partitioned grouped stages when the cluster
# size can't be read (Ray not initialised) and no override is set.
DEFAULT_GROUPED_PARTS = 64


def grouped_parts() -> int:
    """Fan-out for hash-partitioned grouped stages (dedup pair/verify
    steps, sessionize, PMI ranking): each grouped step shuffles on
    ``key_hash % parts`` and runs ONE vectorized call per partition,
    so this bounds both the stage's parallelism and its per-partition
    working set (~1/parts of the keyed rows). It must therefore track
    cluster size, not stay a compile-time constant.

    Priority: ``GRAFT_GROUPED_PARTS`` env override → 2× cluster CPUs
    when Ray is initialised (floored at DEFAULT_GROUPED_PARTS so
    bench-scale partitions keep their current shape) → the default.
    Resolve ONCE per pipeline on the driver at construction time and
    close over the value — never call this inside a worker function —
    so every stage of one run agrees on the modulus. Results are
    partition-count-invariant by construction (the partition id only
    routes rows; every reduce is per original key) — pinned by
    tests/test_dedup.py's parts-invariance test.
    """
    v = _os.environ.get("GRAFT_GROUPED_PARTS")
    if v:
        return max(1, int(v))
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
            if cpus > 0:
                return max(DEFAULT_GROUPED_PARTS, 2 * cpus)
    except Exception:
        pass
    return DEFAULT_GROUPED_PARTS
