"""render(): pure function scene -> image, plus the ray generator.

The TPU analog of the reference's per-thread/per-CUDA-thread pixel loop
(cpu/src/main.c:228-261, gpu/src/gpu.cu:60-95): the whole image is one batched
computation. Pixel (x, y) gets the unnormalized direction
dir00 + x*inc_x + y*inc_y from the camera basis; colors are clamped to [0,1]
at the end (vec_constrain, cpu/src/main.c:235-238).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.camera import Camera, ray_basis
from . import trace_brute
from .shade import trace_rays
from .vecmath import Vec3


def generate_rays(
    origin: np.ndarray,
    dir00: np.ndarray,
    inc_x: np.ndarray,
    inc_y: np.ndarray,
    width: int,
    height: int,
    y_offset: int = 0,
    rows: Optional[int] = None,
) -> Tuple[Vec3, Vec3]:
    """Per-pixel (origin, direction) planes of shape (rows, width).

    y_offset/rows select a horizontal band (for chunked or sharded rendering).
    """
    rows = height if rows is None else rows
    x = jax.lax.broadcasted_iota(jnp.float32, (rows, width), 1)
    y = jax.lax.broadcasted_iota(jnp.float32, (rows, width), 0) + jnp.float32(
        y_offset
    )

    def plane(c):
        return dir00[c] + x * inc_x[c] + y * inc_y[c]

    d = Vec3(plane(0), plane(1), plane(2))
    o = Vec3(
        jnp.full((rows, width), origin[0], jnp.float32),
        jnp.full((rows, width), origin[1], jnp.float32),
        jnp.full((rows, width), origin[2], jnp.float32),
    )
    return o, d


def render_band(
    ds,
    closest_fn,
    occluded_fn,
    cam_arrays,
    width: int,
    height: int,
    y_offset,
    rows: int,
    bounces: int,
):
    """Render a band of `rows` scanlines -> (rows, width, 3) f32 in [0,1]."""
    origin, dir00, inc_x, inc_y = cam_arrays
    o, d = generate_rays(origin, dir00, inc_x, inc_y, width, height, y_offset, rows)
    flat_o = o.reshape(rows * width)
    flat_d = d.reshape(rows * width)
    col = trace_rays(ds, closest_fn, occluded_fn, flat_o, flat_d, bounces)
    col = col.clamp(0.0, 1.0).reshape(rows, width)
    return jnp.stack([col.x, col.y, col.z], axis=-1)


@functools.partial(
    jax.jit, static_argnames=("width", "height", "bounces", "chunk", "row_chunk")
)
def _render_bruteforce(
    ds,
    cam_arrays,
    width: int,
    height: int,
    bounces: int,
    chunk: int = 512,
    row_chunk: int = 0,
):
    closest_fn, occluded_fn = trace_brute.make_tracer(ds, chunk=chunk)
    if not row_chunk or row_chunk >= height:
        return render_band(
            ds, closest_fn, occluded_fn, cam_arrays, width, height,
            jnp.int32(0), height, bounces,
        )
    assert height % row_chunk == 0, (height, row_chunk)

    def band(y0):
        return render_band(
            ds, closest_fn, occluded_fn, cam_arrays, width, height,
            y0, row_chunk, bounces,
        )

    offsets = jnp.arange(0, height, row_chunk, dtype=jnp.int32)
    bands = jax.lax.map(band, offsets)
    return bands.reshape(height, width, 3)


def render_bruteforce(
    ds, cam: Camera, width: int, height: int, bounces: int = 4,
    chunk: int = 512, row_chunk: int = 0,
):
    """USE_BVH=0 oracle render (cpu/src/raytracer.c:112-130 semantics)."""
    cam_arrays = tuple(
        jnp.asarray(a) for a in ray_basis(cam, width, height)
    )
    return _render_bruteforce(
        ds, cam_arrays, width, height, bounces, chunk, row_chunk
    )
