"""Fixed-capacity top-k queue with the reference's ``KnnResult`` semantics.

Mirrors SimilaritySearch.jl's ``AbstractKnn`` contract
(``/root/reference/src/pqueue/pqueue.jl:111-121``,
``src/pqueue/knnheap.jl:48-71``):

* capacity-k queue over (dist, id) pairs, kept smallest-by-dist;
* while not full, every push is accepted;
* once full, a new item is REJECTED when ``item.dist >= maximum(res)``
  (``knnheap.jl:63`` / ``knnsorted.jl:114``) — i.e. ties lose, only a
  strict improvement replaces the frontier;
* ``covradius`` (``pqueue.jl:35``) is +inf until the queue holds k
  items, then the worst kept dist — this is the WAND θ threshold;
* cost counters ``costdist`` / ``costblk`` (``knnsorted.jl:10-13``);
* ``reuse!`` resets without realloc (``knnheap.jl:91-103``).

BM25 is a *similarity*, so the engine pushes ``dist = -score`` (the
reference's own ``NegativeDistanceHack``, ``src/dist/hacks.jl:13-22``).
When items are pushed in ascending doc_id order (the exhaustive scan
order, ``src/sequential-exhaustive.jl:61-65``), the final content is
exactly the k smallest under the lexicographic key ``(dist, doc_id)``
— equivalently the k best under ``(score desc, doc_id asc)``. The
vectorized :func:`topk_indices` computes the same selection closed-form
and is property-tested equal to the heap.
"""

from __future__ import annotations

import heapq
import math

import numpy as np

__all__ = ["TopK", "TopKSorted", "topk_indices", "merge_topk"]

_INF = math.inf


class TopK:
    """Bounded max-heap over ``dist = -score`` keyed ``(dist, doc_id)``.

    ``heapq`` is a min-heap, so entries are stored negated:
    ``(-dist, -doc_id)`` → the heap root is the *worst* kept item
    (largest dist, then largest doc_id), i.e. the frontier.
    """

    __slots__ = ("k", "_heap", "costdist", "costblk")

    def __init__(self, k: int):
        if k <= 0:
            raise ValueError("k must be positive")
        self.k = k
        self._heap: list[tuple[float, int]] = []
        # reference cost counters: distance evaluations / blocks visited
        self.costdist = 0
        self.costblk = 0

    def __len__(self) -> int:
        return len(self._heap)

    # -- covradius / frontier (pqueue.jl:35) --------------------------------
    def covradius(self) -> float:
        """Worst kept dist; +inf while the queue is not yet full."""
        if len(self._heap) < self.k:
            return _INF
        return -self._heap[0][0]

    def theta(self) -> float:
        """WAND θ on the score scale: -covradius (−inf until full)."""
        return -self.covradius()

    def push(self, dist: float, doc_id: int) -> bool:
        """Insert with the knnheap.jl:63 rejection rule; True if kept."""
        h = self._heap
        if len(h) < self.k:
            heapq.heappush(h, (-dist, -doc_id))
            return True
        worst_dist, worst_negid = h[0]
        # reject when item.dist >= maximum(res): ties lose. For exact
        # dist ties the kept set must be minimal under (dist, doc_id),
        # so a tie on dist admits the item only if its doc_id beats the
        # frontier's (callers pushing in ascending doc_id order never
        # hit that branch — it exists for out-of-order merges).
        if dist > -worst_dist or (dist == -worst_dist and -doc_id <= worst_negid):
            return False
        heapq.heapreplace(h, (-dist, -doc_id))
        return True

    def push_score(self, score: float, doc_id: int) -> bool:
        """Similarity-flavored push (dist = -score)."""
        return self.push(-score, doc_id)

    # -- accessors (pqueue.jl:35-39) ----------------------------------------
    def maximum(self) -> float:
        """Worst kept dist (frontier); -inf when empty."""
        return -self._heap[0][0] if self._heap else -_INF

    def minimum(self) -> float:
        """Best kept dist; +inf when empty."""
        return min(-d for d, _ in self._heap) if self._heap else _INF

    def argmax(self) -> int:
        return -self._heap[0][1] if self._heap else -1

    def argmin(self) -> int:
        if not self._heap:
            return -1
        d, negid = min(self._heap, key=lambda t: (-t[0], -t[1]))
        return -negid

    def pop_max(self) -> tuple[float, int]:
        """Remove and return the frontier item (knnheap.jl:76-84)."""
        d, negid = heapq.heappop(self._heap)
        return -d, -negid

    def pop_min(self) -> tuple[float, int]:
        """Remove and return the best item (KnnSorted deque end,
        knnsorted.jl:123-129); O(n) here — used by beam-style
        traversals and the reference's allknn self-skip."""
        h = self._heap
        best = min(range(len(h)), key=lambda i: (-h[i][0], -h[i][1]))
        d, negid = h.pop(best)
        heapq.heapify(h)
        return -d, -negid

    # -- final ordering (knnheap.jl:37-41) ----------------------------------
    def items(self) -> list[tuple[float, int]]:
        """(dist, doc_id) ascending by (dist, doc_id) — the sorted result."""
        return sorted((-d, -i) for d, i in self._heap)

    def result(self) -> list[tuple[int, float]]:
        """(doc_id, score) by descending score, ascending doc_id."""
        return [(i, -d) for d, i in self.items()]

    def reuse(self, k: int | None = None) -> None:
        """Reset in place (knnheap.jl:91-103); optionally re-cap."""
        self._heap.clear()
        if k is not None:
            self.k = k
        self.costdist = 0
        self.costblk = 0

    # -- IdView / DistView projections (pqueue.jl IdView/DistView) ----------
    def ids(self) -> list[int]:
        """Sorted-result ids only (the reference's ``IdView``)."""
        return [i for _, i in self.items()]

    def dists(self) -> list[float]:
        """Sorted-result dists only (the reference's ``DistView``)."""
        return [d for d, _ in self.items()]


class TopKSorted:
    """Second queue implementation with the SAME contract as
    :class:`TopK`, kept as an always-sorted array instead of a heap —
    the reference maintains ``KnnHeap`` AND ``KnnSorted``
    (``/root/reference/src/pqueue/knnsorted.jl:91-118``) and proves
    them equivalent as a test strategy (``test/testresults.jl:52-84``);
    the property test in tests/test_topk.py does the same here, which
    pins the queue *contract* independently of either implementation.

    Ascending ``(dist, doc_id)``; the frontier is the last element.
    """

    __slots__ = ("k", "_items", "costdist", "costblk")

    def __init__(self, k: int):
        if k <= 0:
            raise ValueError("k must be positive")
        self.k = k
        self._items: list[tuple[float, int]] = []
        self.costdist = 0
        self.costblk = 0

    def __len__(self) -> int:
        return len(self._items)

    def covradius(self) -> float:
        if len(self._items) < self.k:
            return _INF
        return self._items[-1][0]

    def theta(self) -> float:
        return -self.covradius()

    def push(self, dist: float, doc_id: int) -> bool:
        import bisect

        it = self._items
        key = (dist, doc_id)
        if len(it) < self.k:
            bisect.insort(it, key)
            return True
        # knnsorted.jl:114 reject rule: the same (dist, doc_id) total
        # order as TopK — ties on dist admit only a smaller doc_id
        if key >= it[-1]:
            return False
        it.pop()
        bisect.insort(it, key)
        return True

    def push_score(self, score: float, doc_id: int) -> bool:
        return self.push(-score, doc_id)

    def maximum(self) -> float:
        return self._items[-1][0] if self._items else -_INF

    def minimum(self) -> float:
        return self._items[0][0] if self._items else _INF

    def argmax(self) -> int:
        return self._items[-1][1] if self._items else -1

    def argmin(self) -> int:
        return self._items[0][1] if self._items else -1

    def pop_max(self) -> tuple[float, int]:
        return self._items.pop()

    def pop_min(self) -> tuple[float, int]:
        return self._items.pop(0)

    def items(self) -> list[tuple[float, int]]:
        return list(self._items)

    def result(self) -> list[tuple[int, float]]:
        return [(i, -d) for d, i in self._items]

    def reuse(self, k: int | None = None) -> None:
        self._items.clear()
        if k is not None:
            self.k = k
        self.costdist = 0
        self.costblk = 0

    def ids(self) -> list[int]:
        return [i for _, i in self._items]

    def dists(self) -> list[float]:
        return [d for d, _ in self._items]


def topk_indices(scores: np.ndarray, doc_ids: np.ndarray, k: int) -> np.ndarray:
    """Vectorized selection identical to pushing (score, doc_id) pairs
    into :class:`TopK` in ascending doc_id order.

    Returns positions into ``scores`` ordered by (score desc, doc_id
    asc) — at most k of them.
    """
    n = len(scores)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if k < n:
        # O(n) argpartition cut, then exact (score desc, doc_id asc)
        # resolution over the candidates. Any true top-k item has
        # score >= v (the k-th largest value), so including all ties at
        # v keeps the selection exact under the §2.4 tie rule.
        part = np.argpartition(-scores, k - 1)[:k]
        v = scores[part].min()
        cand = np.flatnonzero(scores >= v)
        order = np.lexsort((doc_ids[cand], -scores[cand]))[:k]
        return cand[order]
    return np.lexsort((doc_ids, -scores))


def merge_topk(partials: list[list[tuple[int, float]]], k: int) -> list[tuple[int, float]]:
    """Merge per-partition top-k partials into a global top-k.

    Partials are (doc_id, score) lists. Doc ids across partitions are
    distinct (doc-sharded index), so the merge is a pure selection
    under the same (score desc, doc_id asc) key.
    """
    q = TopK(k)
    for part in partials:
        for doc_id, score in part:
            q.push_score(score, doc_id)
    return q.result()
