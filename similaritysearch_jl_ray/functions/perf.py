"""Recall / evaluation utilities — the reference's ``src/perf.jl``
(``recallscore`` ``:10-12``, ``macrorecall`` ``:36-52``)."""

from __future__ import annotations

__all__ = ["recallscore", "macrorecall"]


def recallscore(gold: list[int], got: list[int]) -> float:
    """|gold ∩ got| / |gold| (perf.jl:10-12)."""
    g = set(gold)
    return len(g & set(got)) / max(1, len(g))


def macrorecall(gold_lists: dict, got_lists: dict) -> float:
    """Mean per-query recall (perf.jl:36-52); queries missing from
    ``got_lists`` count as recall 0."""
    if not gold_lists:
        return 1.0
    return sum(
        recallscore(gold_lists[q], got_lists.get(q, [])) for q in gold_lists
    ) / len(gold_lists)
