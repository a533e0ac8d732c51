"""Metrics, logging and the render report (SURVEY.md §5.5).

The reference's only runtime observability is a per-row stderr progress line
(``src/main.cpp:219-220``).  Here: structured per-step records (rays traced,
Mrays/s, wall time), pluggable sinks, and a final report.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from typing import Callable, List, Optional


@dataclasses.dataclass
class RenderReport:
    scene: str
    width: int
    height: int
    total_spp: int
    seconds: float
    segments: int
    camera_rays: int

    @property
    def mrays_per_s(self) -> float:
        return self.segments / self.seconds / 1e6 if self.seconds else 0.0

    @property
    def avg_depth(self) -> float:
        return self.segments / self.camera_rays if self.camera_rays else 0.0

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["mrays_per_s"] = round(self.mrays_per_s, 3)
        d["avg_depth"] = round(self.avg_depth, 3)
        return json.dumps(d)

    def summary(self) -> str:
        return (
            f"{self.scene} {self.width}x{self.height}@{self.total_spp}spp: "
            f"{self.seconds:.2f}s, {self.segments / 1e6:.1f}M rays, "
            f"{self.mrays_per_s:.1f} Mrays/s, avg depth {self.avg_depth:.1f}"
        )


class ProgressLogger:
    """Replaces the reference's '\\rRendering (N spp) xx.xx%' stderr line
    (``src/main.cpp:219-220``) with an equivalent batch-level progress line."""

    def __init__(self, total_spp: int, stream=None):
        self.total_spp = total_spp
        self.stream = stream if stream is not None else sys.stderr
        self.t0 = time.perf_counter()

    def __call__(self, done: int, total: int) -> None:
        pct = 100.0 * done / total
        dt = time.perf_counter() - self.t0
        print(
            f"\rRendering ({self.total_spp} spp) {pct:5.1f}%  [{dt:.1f}s]",
            end="",
            file=self.stream,
            flush=True,
        )
        if done >= total:
            print(file=self.stream)


class MetricsSink:
    """Collects per-step metric records; optionally mirrors to stdout."""

    def __init__(self, echo: bool = False):
        self.records: List[dict] = []
        self.echo = echo

    def log(self, **kv) -> None:
        kv.setdefault("t", time.time())
        self.records.append(kv)
        if self.echo:
            print(json.dumps(kv), flush=True)


class Timer:
    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self.t0
        return False
