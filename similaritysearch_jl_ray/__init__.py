"""similaritysearch_jl_ray — a Ray-Data-native full-text (BM25) engine.

A brand-new engine with the query/data-processing capabilities of
sadit/SimilaritySearch.jl (reference at /root/reference, read-only),
re-expressed Ray-Data-first per SURVEY.md:

* top-k machinery mirrors the reference's ``KnnResult`` fixed-capacity
  queue semantics (``src/pqueue/knnheap.jl``) — see ``functions.topk``;
* the inverted index is the CSR analog of the reference's
  ``StaticAdjList`` (``src/adj/adjstatic.jl``) — see ``state.segment``;
* pipelines are ``ray.data.Dataset`` graphs of ``map_batches`` over
  zero-copy Arrow batches with actor pools for stateful stages.

Nothing here calls ``ray.init``/``ray.shutdown`` — sessions are owned
by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
