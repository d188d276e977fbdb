"""Profiling & observability.

The reference's only instrumentation is a scanline countdown print
(reference src/main.zig:384). Here: wall-clock phase timers, rays/s
accounting, per-bounce alive-fraction statistics (the wavefront's
occupancy — the number XLA/TPU actually cares about), and optional
jax.profiler trace capture for perfetto.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class PhaseTimer:
    """Accumulates wall time per named phase (blocks on device work)."""

    totals: Dict[str, float] = dataclasses.field(default_factory=dict)
    counts: Dict[str, int] = dataclasses.field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for k in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(
                f"{k}: {self.totals[k]:.3f}s over {self.counts[k]} calls"
            )
        return "\n".join(lines)


def rays_per_second(n_primary: int, seconds: float) -> float:
    return n_primary / max(seconds, 1e-12)


def alive_fractions(scene, o, d, times, pixel_ids, sample_ids, seed,
                    max_depth: int):
    """Fraction of rays still alive entering each bounce [max_depth].

    Diagnostic companion to the integrator (same semantics, jnp path):
    shows wavefront occupancy decay, which bounds the win from the
    Pallas kernel's per-tile early exit.
    """
    from rtweekend_tpu.ops.intersect import intersect
    from rtweekend_tpu.ops.scatter import scatter

    def bounce(carry, b):
        o, d, alive = carry
        frac = jnp.mean(alive.astype(jnp.float32))
        h = intersect(scene, o, d, times)
        sc = scatter(scene, seed, pixel_ids, sample_ids, b, d, h)
        new_alive = alive & h.hit & sc.alive
        o = jnp.where(new_alive[:, None], h.p, o)
        d = jnp.where(new_alive[:, None], sc.direction, d)
        return (o, d, new_alive), frac

    (_, _, _), fracs = jax.lax.scan(
        bounce,
        (o, d, times == times),
        jnp.arange(max_depth, dtype=jnp.int32),
    )
    return fracs


@contextlib.contextmanager
def trace(dirname: Optional[str]):
    """jax.profiler trace context (view in perfetto); no-op if dirname
    is None."""
    if dirname is None:
        yield
        return
    with jax.profiler.trace(dirname):
        yield
