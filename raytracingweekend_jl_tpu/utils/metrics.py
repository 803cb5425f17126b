"""Metrics / benchmark history.

The reference tracks performance as hand-edited comments in proto.jl and the
test file (SURVEY.md §5: 'timing history kept as comments'); here every bench
run appends a JSON record so regressions are diffable by machines.
"""

from __future__ import annotations

import json
import os
import platform
import time


def throughput_record(label: str, wall_s: float, n_paths: int,
                      extra: dict | None = None) -> dict:
    rec = {
        "ts": time.time(),
        "label": label,
        "wall_s": round(wall_s, 4),
        "paths": n_paths,
        "mpaths_per_s": round(n_paths / wall_s / 1e6, 3),
        "host": platform.node(),
    }
    if extra:
        rec.update(extra)
    return rec


def append_history(rec: dict, path: str = "bench_history.jsonl") -> None:
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")


class PhaseTimer:
    """Per-phase wall timers (raygen/trace/assemble) — the structured stand-in
    for the reference's BenchmarkTools sprinkling (SURVEY.md §5)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self._t0: dict[str, float] = {}

    def start(self, phase: str) -> None:
        self._t0[phase] = time.time()

    def stop(self, phase: str) -> None:
        self.totals[phase] = self.totals.get(phase, 0.0) + time.time() - self._t0.pop(phase)

    def discard(self, phase: str) -> None:
        """Drop an open timer without accumulating (e.g. a failed attempt)."""
        self._t0.pop(phase, None)

    def as_dict(self) -> dict:
        return {k: round(v, 4) for k, v in sorted(self.totals.items())}
