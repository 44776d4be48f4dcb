"""Formal index/search protocols — the engine's analog of the
reference's ``AbstractSearchIndex`` surface
(``/root/reference/src/SimilaritySearch.jl:60-140``: ``search`` /
``searchbatch`` / ``index!`` / ``database`` / ``distance`` over any
index type).

These are *structural* protocols (``typing.Protocol``): anything with
the right methods conforms — no inheritance required, matching how the
reference dispatches on duck-typed index structs. The built-ins
conform today:

* :class:`~similaritysearch_jl_ray.state.reader.IndexReader` →
  :class:`IndexState`
* :class:`~similaritysearch_jl_ray.pipelines.query.Bm25Scorer` →
  :class:`Scorer`

A third-party index plugs in by (a) writing segments any way it likes,
(b) exposing an :class:`IndexState` for serving state, and (c) a
:class:`Scorer`-conforming callable class handed to
``queries.map_batches(Cls, concurrency=N)`` — the actor-pool contract
is the engine's real extension point (§2.9).
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable


@runtime_checkable
class IndexState(Protocol):
    """Pinned per-actor serving state over an on-disk index slice."""

    stats: dict

    def __contains__(self, term: str) -> bool: ...

    def df(self, term: str) -> int: ...

    def idf(self, term: str) -> float: ...

    def postings(self, term: str): ...


@runtime_checkable
class Scorer(Protocol):
    """Stateful ``map_batches`` scorer: construct once per actor,
    score per batch. ``score_query`` returns (hits, cost1, cost2)
    with hits ordered by the §2.4 tie rule (score desc, id asc)."""

    def score_query(self, text: str): ...

    def __call__(self, batch): ...
