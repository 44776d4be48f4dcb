#!/usr/bin/env python
"""``ray job submit`` entry point — the production deployment surface
of the north rule ("executed via ray job submit on fixed multi-node
clusters"), runnable locally in this sandbox with the same code path.

    ray job submit --working-dir . -- python scripts/ray_job.py \
        --sf-dir /root/testdata/sf0.1 --index-dir /tmp/ssjr_job/index \
        --replicate 20 --queries-out /tmp/ssjr_job/results

The build is resumable: resubmitting after a failure completes only
the missing stages/partitions (checkpoint layout in
pipelines/build_index.py); pass ``--rebuild`` to force a clean build.
On a cluster, ``ray.init(address="auto")`` attaches to the running
cluster instead of starting a local one.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--num-parts", type=int, default=16)
    ap.add_argument("--salt-factor", type=int, default=8)
    ap.add_argument("--queries-out", default=None, help="write top-k results parquet here")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument(
        "--mode", default="wand",
        choices=["wand", "exhaustive", "and", "dismax", "phrase", "near",
                 "prefix", "fuzzy", "wildcard", "boost"])
    ap.add_argument("--queries-file", default=None,
                    help="parquet with (query_id, text); default = the mode's fixture set")
    ap.add_argument("--shards", type=int, default=0,
                    help="serve doc-sharded with this many range-pinned pools")
    ap.add_argument("--lang", default=None, help="field filter: only docs with this lang")
    ap.add_argument("--cache-size", type=int, default=0, help="per-actor results LRU")
    ap.add_argument("--rebuild", action="store_true")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():  # under `ray job submit` the session exists
        # attach to the cluster the job manager points at; "local" only
        # as the sandbox fallback when no RAY_ADDRESS is set
        import os as _os

        ray.init(
            address=_os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from similaritysearch_jl_ray.pipelines.build_index import build_index
    from similaritysearch_jl_ray.pipelines.lifecycle import rebuild
    from similaritysearch_jl_ray.pipelines.query import search_to_parquet
    from similaritysearch_jl_ray.pipelines import queryset as qsets
    from similaritysearch_jl_ray.sources.pages import pages_dataset

    def queries_dataset():
        if args.queries_file:
            import ray.data as rd

            return rd.read_parquet(args.queries_file)
        return {
            "near": qsets.near_queries_dataset,
            "prefix": qsets.prefix_queries_dataset,
            "fuzzy": qsets.fuzzy_queries_dataset,
            "wildcard": qsets.wildcard_queries_dataset,
            "boost": qsets.boost_queries_dataset,
        }.get(args.mode, qsets.queries_dataset)()

    t0 = time.perf_counter()
    pages = pages_dataset(args.sf_dir, replicate=args.replicate)
    docmap = pages_dataset(args.sf_dir, replicate=args.replicate, with_html=False)
    build = rebuild if args.rebuild else build_index
    stats = build(
        pages,
        args.index_dir,
        docmap_ds=docmap,
        num_parts=args.num_parts,
        salt_factor=args.salt_factor,
    )
    build_sec = time.perf_counter() - t0

    out = {
        "n_docs": stats["n_docs"],
        "total_tokens": stats["total_tokens"],
        "build_sec": round(build_sec, 3),
        "build_docs_per_sec": round(stats["n_docs"] / max(build_sec, 1e-9), 1),
    }
    if args.queries_out:
        t0 = time.perf_counter()
        if args.shards > 0:
            from similaritysearch_jl_ray.pipelines.query import sharded_search

            sharded_search(
                queries_dataset(), args.index_dir, k=args.k,
                n_shards=args.shards, mode=args.mode, lang=args.lang,
                cache_size=args.cache_size,
            ).write_parquet(args.queries_out, compression="zstd")
        else:
            search_to_parquet(
                queries_dataset(), args.index_dir, args.queries_out,
                k=args.k, mode=args.mode, lang=args.lang,
                cache_size=args.cache_size,
            )
        out["query_sec"] = round(time.perf_counter() - t0, 3)
        out["results_dir"] = args.queries_out
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
