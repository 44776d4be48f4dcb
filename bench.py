"""Headline benchmark: inverted-index build (docs/s) + BM25 WAND query
serving (p50 latency, qps) over the synthesized pages corpus.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {"build": ..., "query_wand": ..., "query_exhaustive": ...},
   "sf": ..., "num_cpus": N, ...extras}

Env:
  GRAFT_SF_DIR      input scale dir   (default /root/testdata/sf0.1)
  RAY_GRAFT_CPUS    ray num_cpus      (default 32)
  GRAFT_REPLICATE   corpus replication factor (default 40 → 200k docs
                    at sf0.1; copies get distinct doc_ids/urls)
  GRAFT_QUERY_REPS  times the 20-query reference set is repeated
                    through the serving pool (default 100 → 2000 queries)

``--scaling``: run the bench twice in FRESH processes at num_cpus=8
and num_cpus=32 on the same input and print throughput at both plus
scaling efficiency (the sandbox protocol for the north rule's N vs 4N
cluster criterion — see BASELINE.md §B).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    replicate = int(os.environ.get("GRAFT_REPLICATE", "40"))
    query_reps = int(os.environ.get("GRAFT_QUERY_REPS", "100"))

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import numpy as np

    from similaritysearch_jl_ray.pipelines.build_index import build_index
    from similaritysearch_jl_ray.pipelines.query import search
    from similaritysearch_jl_ray.pipelines.queryset import REFERENCE_QUERIES
    from similaritysearch_jl_ray.sources.pages import pages_dataset

    index_dir = f"/tmp/ssjr_bench/index_cpus{num_cpus}"
    shutil.rmtree(index_dir, ignore_errors=True)

    # warm-up: one untimed pass over the replicated corpus spawns the
    # full worker pool and pages the input into cache, so the timed run
    # measures compute + shuffle, not process spawn / first-touch I/O
    # (same warm-up at both scaling levels → comparable steady state).
    pages_dataset(sf_dir, replicate=replicate).map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow"
    ).count()

    # ---- build -----------------------------------------------------------
    # exact corpus size from parquet metadata → the docmap write folds
    # into the fused D1 pass (one corpus pass total, no stage A)
    import pyarrow.parquet as pqm

    n_hint = pqm.read_metadata(f"{sf_dir}/documents.parquet").num_rows * replicate
    t0 = time.perf_counter()
    stats = build_index(
        pages_dataset(sf_dir, replicate=replicate),
        index_dir,
        docmap_ds=pages_dataset(sf_dir, replicate=replicate, with_html=False),
        num_parts=16,  # merge-task parallelism in stage D
        salt_factor=8,  # fixed across scaling levels for comparability
        n_docs_hint=n_hint,
    )
    build_sec = time.perf_counter() - t0
    n_docs = stats["n_docs"]
    build_timings = stats.get("build_timings", {})

    # ---- query serving ---------------------------------------------------
    import ray.data as rd

    items = [
        {"query_id": rep * len(REFERENCE_QUERIES) + qid, "text": text}
        for rep in range(query_reps)
        for qid, text in REFERENCE_QUERIES
    ]
    n_queries = len(items)
    # leave ≥1 CPU for the non-actor operators (repartition/input) —
    # at num_cpus=2, two pool actors consume every CPU and the
    # upstream repartition starves: a real Ray Data deadlock
    concurrency = max(1, num_cpus - 2)

    timings = {}
    lat_p50 = {}
    for mode in ("wand", "exhaustive"):
        qds = rd.from_items(items).repartition(concurrency)
        t0 = time.perf_counter()
        res = search(
            qds, index_dir, k=10, mode=mode, concurrency=concurrency, batch_size=64
        ).to_pandas()
        timings[f"query_{mode}"] = time.perf_counter() - t0
        per_q = res.groupby("query_id")[["latency_us", "actor_seq"]].first()
        lat_p50[mode] = float(np.median(per_q["latency_us"])) / 1e3 if len(per_q) else 0.0
        # steady-state serving rate: in-actor busy time of WARM queries
        # (drop each actor's first 3 — pack materialization + caches),
        # spread over the pool. Excludes actor-pool spin-up entirely.
        warm = per_q[per_q["actor_seq"] >= 3]["latency_us"]
        n_warm = max(1, len(warm))
        busy_sec = float(warm.sum()) / 1e6 / concurrency
        timings[f"steady_{mode}"] = max(busy_sec, 1e-9)
        timings[f"steady_n_{mode}"] = n_warm

    # phrase serving (positional index, reader-path actors) — measured
    # with a SMALLER rep count (positions decode once per actor) and
    # EXCLUDED from the headline total so cross-round "value"
    # comparisons stay apples-to-apples with rounds 1-2
    phrase_items = items[: max(len(items) // 4, len(REFERENCE_QUERIES))]
    qds = rd.from_items(phrase_items).repartition(concurrency)
    t0 = time.perf_counter()
    res = search(
        qds, index_dir, k=10, mode="phrase", concurrency=concurrency, batch_size=64
    ).to_pandas()
    timings["query_phrase"] = time.perf_counter() - t0
    per_q = res.groupby("query_id")[["latency_us", "actor_seq"]].first()
    # warm-only, like the wand steady metric: each reader-path actor's
    # first queries pay the one-time position-run decode
    warm = per_q[per_q["actor_seq"] >= 3]["latency_us"]
    lat_p50["phrase"] = float(np.median(warm)) / 1e3 if len(warm) else 0.0
    timings["steady_phrase"] = max(float(warm.sum()) / 1e6 / concurrency, 1e-9)
    timings["steady_n_phrase"] = max(1, len(warm))
    n_phrase = len(phrase_items)

    # hybrid RRF lap (round 5): wall-clock only, reduced rep count,
    # EXCLUDED from the headline total (cross-round comparability) and
    # guarded — a failure here must never break the driver's bench line
    hybrid_sec = hybrid_n = 0
    try:
        from similaritysearch_jl_ray.pipelines.query import hybrid_search

        # few actors: each pays a one-time doc-norm pass, so a wide
        # pool on a small rep count measures warm-up, not serving
        hybrid_cc = min(8, concurrency)
        hybrid_items = items[: max(len(items) // 4, len(REFERENCE_QUERIES))]
        qds = rd.from_items(hybrid_items).repartition(hybrid_cc)
        t0 = time.perf_counter()
        hybrid_search(
            qds, index_dir, k=10, concurrency=hybrid_cc, batch_size=64
        ).to_pandas()
        hybrid_sec = time.perf_counter() - t0
        hybrid_n = len(hybrid_items)
    except Exception:
        pass

    total = build_sec + timings["query_wand"] + timings["query_exhaustive"]
    out = {
        "metric": "bm25_index_build_plus_query",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {
            "build": round(build_sec, 3),
            "query_wand": round(timings["query_wand"], 3),
            "query_exhaustive": round(timings["query_exhaustive"], 3),
        },
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_docs": n_docs,
        "n_queries": n_queries,
        "build_docs_per_sec": round(n_docs / build_sec, 1),
        "query_qps_wand": round(n_queries / timings["query_wand"], 1),
        "query_qps_wand_steady": round(timings["steady_n_wand"] / timings["steady_wand"], 1),
        "query_p50_ms_wand": round(lat_p50["wand"], 3),
        "query_p50_ms_exhaustive": round(lat_p50["exhaustive"], 3),
        "query_p50_ms_phrase_warm": round(lat_p50["phrase"], 3),
        "query_qps_phrase_steady": round(
            timings["steady_n_phrase"] / timings["steady_phrase"], 1
        ),
        "query_qps_hybrid_wall": round(hybrid_n / hybrid_sec, 1) if hybrid_sec else 0.0,
        "total_postings": stats["total_tokens"],
        "build_stage_sec": stats.get("build_timings", {}),
    }
    ray.shutdown()
    return out


def _compute_ceiling(lo: int, hi: int) -> dict:
    """Measure the MACHINE's parallel-speedup ceiling with a pure
    embarrassingly-parallel Ray workload (regex + matmul, no I/O, no
    shuffle). On this VM 32 vCPUs deliver ~2.3× the throughput of 8
    (SMT/turbo/host sharing), so no pipeline can show 4×; engine
    efficiency is therefore reported raw AND normalized by this
    ceiling — the ceiling does not apply to real N → 4N *node*
    scaling, where per-node clocks are identical."""
    probe = (
        "import ray, sys, time\n"
        "n = int(sys.argv[1])\n"
        "ray.init(address='local', num_cpus=n, include_dashboard=False, logging_level='ERROR')\n"
        "import numpy as np, re\n"
        "@ray.remote\n"
        "def work(seed):\n"
        "    rng = np.random.default_rng(seed)\n"
        "    tok = re.compile(r'[a-z0-9]+')\n"
        "    s = ' '.join(rng.choice(['alpha','beta','gamma','delta','x1','y2'], size=20000).tolist())\n"
        "    total = 0\n"
        "    for _ in range(12):\n"
        "        toks = tok.findall(s.lower())\n"
        "        a = rng.standard_normal((300, 300))\n"
        "        total += len(toks) + int((a @ a.T).trace())\n"
        "    return total\n"
        "_ = ray.get([work.remote(i) for i in range(8)])\n"
        "t0 = time.perf_counter()\n"
        "_ = ray.get([work.remote(i) for i in range(256)])\n"
        "print(round(time.perf_counter() - t0, 3))\n"
        "ray.shutdown()\n"
    )
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(probe)
        path = f.name
    secs = {}
    for n in (lo, hi):
        out = subprocess.run(
            [sys.executable, path, str(n)], capture_output=True, text=True, check=True
        ).stdout
        secs[n] = float(out.strip().splitlines()[-1])
        time.sleep(5)
    ceiling = (secs[lo] / secs[hi]) / (hi / lo)
    return {"probe_sec": {str(lo): secs[lo], str(hi): secs[hi]},
            "compute_ceiling_efficiency": round(ceiling, 3)}


def run_scaling() -> dict:
    """Interleaved repeats, median per level: the sandbox VM shows
    ±2-3× wall-clock noise from host-level interference, so a single
    pair of runs is not meaningful evidence either way."""
    levels = os.environ.get("GRAFT_SCALING_CPUS", "8,32").split(",")
    lo, hi = int(levels[0]), int(levels[1])
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "3"))
    runs: dict[int, list[dict]] = {lo: [], hi: []}
    for rep in range(repeats):
        for n in (lo, hi):
            if rep or n != lo:
                time.sleep(15)  # let the previous Ray session's workers exit
            env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            )
            runs[n].append(json.loads(proc.stdout.strip().splitlines()[-1]))

    def med(vals):
        vals = sorted(vals)
        return vals[len(vals) // 2]

    results = {
        n: med_run
        for n, med_run in (
            (n, min(rs, key=lambda r: abs(r["value"] - med([x["value"] for x in rs]))))
            for n, rs in runs.items()
        )
    }
    thr_lo = med([r["n_docs"] / r["queries"]["build"] for r in runs[lo]])
    thr_hi = med([r["n_docs"] / r["queries"]["build"] for r in runs[hi]])
    t_lo = med([r["value"] for r in runs[lo]])
    t_hi = med([r["value"] for r in runs[hi]])
    eff_total = (t_lo / t_hi) / (hi / lo)
    eff_build = (thr_hi / thr_lo) / (hi / lo)
    q_lo = med([r["query_qps_wand_steady"] for r in runs[lo]])
    q_hi = med([r["query_qps_wand_steady"] for r in runs[hi]])
    ceiling = _compute_ceiling(lo, hi)
    cl = max(ceiling["compute_ceiling_efficiency"], 1e-9)
    return {
        **ceiling,
        "normalized_efficiency_total": round((t_lo / t_hi) / (hi / lo) / cl, 3),
        "normalized_efficiency_build": round((thr_hi / thr_lo) / (hi / lo) / cl, 3),
        "repeats": repeats,
        "all_sec": {str(n): [r["value"] for r in rs] for n, rs in runs.items()},
        "all_build_docs_per_sec": {
            str(n): [round(r["n_docs"] / r["queries"]["build"], 1) for r in rs]
            for n, rs in runs.items()
        },
        "metric": "scaling_efficiency",
        "cpus": [lo, hi],
        "sec": {str(lo): t_lo, str(hi): t_hi},
        "build_docs_per_sec": {
            str(lo): round(thr_lo, 1),
            str(hi): round(thr_hi, 1),
        },
        "query_qps_wand_steady": {str(lo): q_lo, str(hi): q_hi},
        "scaling_efficiency_total": round(eff_total, 3),
        "scaling_efficiency_build": round(eff_build, 3),
        "scaling_efficiency_query_steady": round((q_hi / q_lo) / (hi / lo), 3),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
