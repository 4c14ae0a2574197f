"""Microbenchmark: what does a Mosaic lax.cond cost per loop iteration?

The roofline v2 attributes ~300 ns/iteration of the traversal loops to
scalar glue; each iteration runs a leaf-vs-inner lax.cond plus (in the
adaptive schedules) a nested width cond. This harness measures the
marginal cost of data-dependent conds wrapping identical vector bodies:

  0 conds: straight-line body
  1 cond:  cond(p, body, body)
  2 conds: cond(p, cond(q, body, body), cond(q, body, body))
  switch:  lax.switch over 4 identical bodies (the flattened 2x2)

If a cond costs ~50-100 ns, flattening the traversal's nested branches
into one lax.switch saves that much per iteration.

Run on the real chip:  python scripts/microbench_cond.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _bench(name, step_builder, k_lo=100_000, k_hi=400_000, reps=3):
    def kernel(k_ref, a_ref, out_ref):
        a0 = a_ref[:, :]

        def step(i, carry):
            e, a = carry
            e, a = step_builder(e, a)
            return (jnp.abs(e) % 1024, a)

        e, a = jax.lax.fori_loop(0, k_ref[0], step, (jnp.int32(0), a0))
        out_ref[0, 0] = a.max() + e.astype(jnp.float32)

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(8, 128)), jnp.float32)

    def timed(k):
        ks = jnp.asarray([k], jnp.int32)
        float(fn(ks, a)[0, 0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(ks, a)[0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(k_lo), timed(k_hi)
    ns = (t_hi - t_lo) / (k_hi - k_lo) * 1e9
    print(f"{name:40s} {ns:8.1f} ns/iter")
    return ns


def _body(e, a):
    # ~24 vector ops + a scalar result, roughly one narrow visit's work
    for _ in range(8):
        a = jnp.minimum(a * 1.0001 + 0.1, jnp.maximum(a, 0.5))
    e = e + 1 + (a[0, 0] < 0).astype(jnp.int32)
    return e, a


def main():
    print(f"devices: {jax.devices()}")
    out = {}

    def s0(e, a):
        return _body(e, a)

    def s1(e, a):
        return jax.lax.cond(e % 2 == 0, _body, _body, e, a)

    def s2(e, a):
        def inner(e, a):
            return jax.lax.cond(e % 3 == 0, _body, _body, e, a)
        return jax.lax.cond(e % 2 == 0, inner, inner, e, a)

    def sw(e, a):
        idx = (e % 2) * 2 + (e % 3 == 0).astype(jnp.int32)
        return jax.lax.switch(idx, [_body] * 4, e, a)

    out["straight"] = _bench("0 conds (straight-line)", s0)
    out["cond1"] = _bench("1 cond", s1)
    out["cond2_nested"] = _bench("2 nested conds", s2)
    out["switch4"] = _bench("lax.switch over 4", sw)
    out["cond_cost_ns"] = out["cond1"] - out["straight"]
    out["nested_extra_ns"] = out["cond2_nested"] - out["cond1"]
    out["switch_vs_nested_ns"] = out["switch4"] - out["cond2_nested"]
    print(json.dumps(out, indent=1))
    os.makedirs("metrics", exist_ok=True)
    with open("metrics/microbench_cond.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
