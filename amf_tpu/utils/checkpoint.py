"""Checkpoint/resume for active-learning sweeps.

Reference analogues (SURVEY.md §5.4): MMMF saves partial_results.mat every 20
steps mid-run (mmmf/evaluate_active.m:84-86); Makefile targets skip existing
results; warm-start state carries across steps. Here a single partial-pickle
per run holds, per criterion, the records list and the query trace — enough
to replay the problem state exactly (selections are deterministic replays of
recorded picks, so resume is exact regardless of RNG).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Tuple


class LoopCheckpointer:
    """Periodically persists per-criterion records; supports exact resume by
    replaying recorded picks into the problem state."""

    def __init__(self, path: Optional[str], every: int = 20):
        self.path = path
        self.every = max(every, 1)
        self._state: Dict[str, List[tuple]] = {}
        if path and os.path.exists(path):
            with open(path, "rb") as f:
                self._state = pickle.load(f)

    def completed_records(self, key: str) -> Optional[List[tuple]]:
        """Records saved for a criterion in a previous run (or None)."""
        return self._state.get(key)

    def replay(self, key: str, problem, real):
        """Re-apply recorded picks to a fresh problem; returns
        (problem, records) positioned exactly where the previous run stopped.
        """
        records = list(self._state.get(key) or [])
        for rec in records:
            ij = rec[2]
            if ij is not None:
                problem = problem.add_rating(
                    int(ij[0]), int(ij[1]), float(real[ij[0], ij[1]])
                )
        return problem, records

    def update(self, key: str, records: List[tuple], force: bool = False):
        if not self.path:
            return
        self._state[key] = records
        n_steps = len(records) - 1
        if force or (n_steps % self.every == 0):
            tmp = self.path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump(self._state, f)
            os.replace(tmp, self.path)
