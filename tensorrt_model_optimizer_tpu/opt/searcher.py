"""Search algorithm base + solvers (`modelopt/torch/opt/searcher.py:60,312`).

`BaseSearcher` standardizes before/run/after hooks and checkpointable search
state; `binary_search` and `evolutionary_search` are the generic engines
(FastNAS binary channel search, AutoNAS evolution); the selection ILP lives
in `quant/auto.py` (scipy.milp, the pulp-LP analog).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Callable, Optional

import numpy as np


@dataclasses.dataclass
class SearchState:
    best_config: Optional[dict] = None
    best_score: float = float("inf")
    history: list = dataclasses.field(default_factory=list)

    def save(self, path: str):
        with open(path, "w") as f:
            json.dump(
                {"best_config": self.best_config, "best_score": self.best_score,
                 "history": self.history},
                f,
            )

    @staticmethod
    def load(path: str) -> "SearchState":
        with open(path) as f:
            d = json.load(f)
        return SearchState(d["best_config"], d["best_score"], d["history"])


class BaseSearcher:
    """Subclass hooks: `candidates()`, `score(config) -> float`,
    `satisfies(config) -> bool` (constraints)."""

    def __init__(self, checkpoint: Optional[str] = None):
        self.checkpoint = checkpoint
        self.state = (
            SearchState.load(checkpoint)
            if checkpoint and os.path.exists(checkpoint)
            else SearchState()
        )

    def before_search(self):  # pragma: no cover - hook
        pass

    def after_search(self):  # pragma: no cover - hook
        pass

    def run_search(self):
        raise NotImplementedError

    def search(self) -> SearchState:
        self.before_search()
        self.run_search()
        self.after_search()
        if self.checkpoint:
            self.state.save(self.checkpoint)
        return self.state


def binary_search(
    lo: float,
    hi: float,
    feasible: Callable[[float], bool],
    steps: int = 10,
) -> float:
    """Largest x in [lo, hi] with feasible(x) (FastNAS channel search,
    `prune/fastnas.py:327`). Assumes monotone feasibility."""
    best = lo
    for _ in range(steps):
        mid = (lo + hi) / 2
        if feasible(mid):
            best, lo = mid, mid
        else:
            hi = mid
    return best


def evolutionary_search(
    sample: Callable[[np.random.Generator], dict],
    mutate: Callable[[dict, np.random.Generator], dict],
    score: Callable[[dict], float],
    satisfies: Callable[[dict], bool],
    iterations: int = 50,
    population: int = 16,
    seed: int = 0,
) -> SearchState:
    """(mu + lambda)-style evolution (AutoNAS, `nas/autonas.py:475`)."""
    rng = np.random.default_rng(seed)
    state = SearchState()
    pop: list[tuple[float, dict]] = []
    while len(pop) < population:
        c = sample(rng)
        if satisfies(c):
            pop.append((score(c), c))
    pop.sort(key=lambda t: t[0])
    for it in range(iterations):
        parent = pop[rng.integers(0, max(len(pop) // 2, 1))][1]
        child = mutate(dict(parent), rng)
        if not satisfies(child):
            continue
        s = score(child)
        state.history.append({"iter": it, "score": s})
        pop.append((s, child))
        pop.sort(key=lambda t: t[0])
        pop = pop[:population]
    state.best_score, state.best_config = pop[0]
    return state
