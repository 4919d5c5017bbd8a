"""Tracing / profiling / observability.

The reference's entire observability story is two printfs: a per-tile
shape-test count (macos_main.mm:161) and one final wall-clock summary line
(macos_main.mm:680); its cycle-counter macro system (platform.h:288-304)
has no call sites. This module is the structured replacement:

- ``PhaseTimer``: named per-phase wall-clock sections (scene load, BVH
  build, compile, render, write) emitted as one JSON line — the analog of
  the reference's summary printf, machine-readable;
- ``RenderMeter``: rays/s accounting fed by the integrator's own
  alive-mask statistics (the analog of ``test_shape_count``);
- ``device_trace``: a context manager around ``jax.profiler`` producing
  Perfetto/TensorBoard traces of the on-device timeline.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from dataclasses import dataclass, field


class PhaseTimer:
    """Named wall-clock phases.

    >>> t = PhaseTimer()
    >>> with t.phase("bvh_build"):
    ...     ...
    >>> t.emit()              # one JSON line on stderr
    """

    def __init__(self) -> None:
        self.phases: dict[str, float] = {}
        self._t0 = time.time()

    @contextlib.contextmanager
    def phase(self, name: str):
        start = time.time()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + time.time() - start

    def total(self) -> float:
        return time.time() - self._t0

    def as_dict(self) -> dict:
        d = dict(self.phases)
        d["total"] = round(self.total(), 4)
        return d

    def emit(self, extra: dict | None = None, file=None) -> None:
        rec = {"event": "timing", **{k: round(v, 4) for k, v in self.phases.items()},
               "total": round(self.total(), 4)}
        if extra:
            rec.update(extra)
        print(json.dumps(rec), file=file or sys.stderr, flush=True)


@dataclass
class RenderMeter:
    """Rays/s + per-bounce occupancy accounting.

    ``add_launch`` records one wavefront launch; ``alive_per_bounce`` is
    the integrator's per-bounce alive-lane counts (see
    ``integrator.trace_paths(..., collect_stats=True)``), from which the
    true segment count (camera + bounces) and NEE shadow-ray count follow.
    """

    paths: int = 0
    segments: float = 0.0
    shadow_rays: float = 0.0
    seconds: float = 0.0
    launches: int = 0
    bounce_histogram: list = field(default_factory=list)

    def add_launch(self, n_paths: int, alive_per_bounce, nee_enabled: bool,
                   seconds: float) -> None:
        alive = [float(a) for a in alive_per_bounce]
        self.paths += int(n_paths)
        # camera segment for every path + one segment per surviving bounce
        self.segments += n_paths + sum(alive)
        # one shadow ray per alive shading point when NEE is on
        if nee_enabled:
            self.shadow_rays += n_paths + sum(alive[:-1]) if alive else n_paths
        self.seconds += seconds
        self.launches += 1
        if len(self.bounce_histogram) < len(alive):
            self.bounce_histogram += [0.0] * (len(alive) - len(self.bounce_histogram))
        for i, a in enumerate(alive):
            self.bounce_histogram[i] += a

    @property
    def total_rays(self) -> float:
        return self.segments + self.shadow_rays

    def mrays_per_s(self) -> float:
        return self.total_rays / max(self.seconds, 1e-9) / 1e6

    def as_dict(self) -> dict:
        return {
            "event": "render_meter",
            "paths": self.paths,
            "segments": round(self.segments),
            "shadow_rays": round(self.shadow_rays),
            "rays": round(self.total_rays),
            "seconds": round(self.seconds, 4),
            "mrays_per_s": round(self.mrays_per_s(), 3),
            "mean_path_length": round(self.segments / max(self.paths, 1), 3),
        }

    def emit(self, file=None) -> None:
        print(json.dumps(self.as_dict()), file=file or sys.stderr, flush=True)


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """jax.profiler trace (TensorBoard / Perfetto) when log_dir is set."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
