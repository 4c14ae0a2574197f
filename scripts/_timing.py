"""Shared chained-marginal timing helper for every benchmark harness.

One implementation of the measurement discipline (docs/DESIGN.md §9,
and the round-5 additions in §9e/ROUND5.md):

- chained-in-one-jit marginal: time t(k_hi) - t(k_lo) of a k-chained
  program so per-dispatch overhead and launch cost cancel;
- EVERY timed call carries a fresh input jitter: the tunnel's dispatch
  cache keys on (program, inputs) and SURVIVES process restarts, so
  identical repeated dispatches return cached results and collapse the
  marginal to zero;
- the caller builds its jitted chain ONCE and passes the same function
  object — a fresh jax.jit wrapper per call measures retrace instead
  of device time.

The timed callable receives (k, jitter) where jitter is a tiny float
(n * 1e-7) the caller must fold into a traced INPUT (e.g. `ox + j` or
as the chain's eps0 argument) — never into a static argument.
"""

from __future__ import annotations

import itertools
import time

import jax
import jax.numpy as jnp

_jit_ctr = itertools.count(1)


def jitter():
    """Fresh tiny perturbation for the next timed dispatch."""
    return jnp.float32(next(_jit_ctr)) * 1e-7


def marginal_s(fn, k_lo, k_hi, reps=3):
    """Chained marginal in SECONDS. fn(k, jitter_value) -> jax value."""

    def timed(k):
        jax.block_until_ready(fn(k, jitter()))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(k, jitter()))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(k_lo), timed(k_hi)
    return max((t_hi - t_lo) / (k_hi - k_lo), 1e-9)


def marginal_ms(fn, k_lo=2, k_hi=6, reps=3):
    """Chained marginal in MILLISECONDS. fn(k, jitter_value)."""
    return marginal_s(fn, k_lo, k_hi, reps=reps) * 1e3
