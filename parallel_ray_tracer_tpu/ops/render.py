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
from .shade import occluded_from_closest, trace_rays
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
    reverse_shadows: bool = True,
):
    """Render a band of `rows` scanlines -> (rows, width, 3) f32 in [0,1]."""
    origin, dir00, inc_x, inc_y = cam_arrays
    o, d = generate_rays(origin, dir00, inc_x, inc_y, width, height, y_offset, rows)
    flat_o = o.reshape(rows * width)
    flat_d = d.reshape(rows * width)
    col = trace_rays(ds, closest_fn, occluded_fn, flat_o, flat_d, bounces,
                     reverse_shadows=reverse_shadows)
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
    y_offset=0,
):
    closest_fn, occluded_fn = trace_brute.make_tracer(ds, chunk=chunk)
    if not row_chunk or row_chunk >= height:
        return render_band(
            ds, closest_fn, occluded_fn, cam_arrays, width, height,
            jnp.int32(y_offset), height, bounces,
        )
    assert height % row_chunk == 0, (height, row_chunk)

    def band(y0):
        return render_band(
            ds, closest_fn, occluded_fn, cam_arrays, width, height,
            y0, row_chunk, bounces,
        )

    offsets = jnp.arange(0, height, row_chunk, dtype=jnp.int32) + jnp.int32(
        y_offset
    )
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


# ---------------------------------------------------------------------------
# Tile-major packet rendering (BVH variants)
# ---------------------------------------------------------------------------

def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def tile_image_shape(width: int, height: int, tr: int, tc: int):
    """Padded dims + tile grid for (tr, tc) pixel tiles."""
    wp, hp = _ceil_to(width, tc), _ceil_to(height, tr)
    return wp, hp, hp // tr, wp // tc


def tiles_to_image(flat, width, height, tr, tc):
    """(ntiles*K,) or (ntiles*K, C) tile-major -> (height, width[, C]), cropped.

    Tile order is row-major over the (hp/tr, wp/tc) tile grid; within a tile,
    row-major over (tr, tc) pixels.
    """
    wp, hp, nty, ntx = tile_image_shape(width, height, tr, tc)
    trailing = flat.shape[1:]
    img = flat.reshape(nty, ntx, tr, tc, *trailing)
    img = jnp.moveaxis(img, 2, 1).reshape(hp, wp, *trailing)
    return img[:height, :width]


def generate_rays_tiled(cam_arrays, width, height, tr, tc, y_offset=0):
    """(ntiles*K,) Vec3 origin/direction planes in tile-major order.

    y_offset shifts pixel rows (band rendering): row r gets the direction
    of full-frame row r + y_offset, computed with the same arithmetic as
    the full frame (bit-exact bands)."""
    origin, dir00, inc_x, inc_y = cam_arrays
    wp, hp, nty, ntx = tile_image_shape(width, height, tr, tc)
    o, d = generate_rays(origin, dir00, inc_x, inc_y, wp, hp, y_offset, hp)

    def tilewise(p):
        return (
            p.reshape(nty, tr, ntx, tc).swapaxes(1, 2).reshape(nty * ntx * tr * tc)
        )

    return (
        Vec3(tilewise(o.x), tilewise(o.y), tilewise(o.z)),
        Vec3(tilewise(d.x), tilewise(d.y), tilewise(d.z)),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "bounces", "leaf_size", "stack_depth",
        "tile_rows", "tile_cols", "fast_light", "reverse_shadows",
    ),
)
def _render_bvh_jax(
    ds,
    bvh,
    cam_arrays,
    width: int,
    height: int,
    bounces: int,
    leaf_size: int,
    stack_depth: int,
    tile_rows: int,
    tile_cols: int,
    fast_light: bool = True,
    y_offset=0,
    reverse_shadows: bool = True,
):
    from . import trace_bvh

    o, d = generate_rays_tiled(
        cam_arrays, width, height, tile_rows, tile_cols, y_offset
    )
    closest_fn, occluded_fn = trace_bvh.make_tracer(
        bvh, ds, leaf_size, stack_depth, packet=tile_rows * tile_cols
    )
    if not fast_light:
        # Keep the USE_BVH_FAST_LIGHT=0 parity mode literally
        # reference-shaped: forward shadow rays.
        occluded_fn = occluded_from_closest(closest_fn)
    col = trace_rays(ds, closest_fn, occluded_fn, o, d, bounces,
                     reverse_shadows=fast_light and reverse_shadows)
    col = col.clamp(0.0, 1.0)
    flat = jnp.stack([col.x, col.y, col.z], axis=-1)
    return tiles_to_image(flat, width, height, tile_rows, tile_cols)


def render_bvh_jax(
    ds,
    bvh,
    cam: Camera,
    width: int,
    height: int,
    bounces: int = 4,
    leaf_size: int = 4,
    stack_depth: int = 64,
    tile_rows: int = 32,
    tile_cols: int = 32,
    fast_light: bool = True,
    reverse_shadows: bool = True,
):
    """Packet-traversal render, pure JAX (lax.while_loop) variant."""
    cam_arrays = tuple(jnp.asarray(a) for a in ray_basis(cam, width, height))
    return _render_bvh_jax(
        ds, bvh, cam_arrays, width, height, bounces,
        leaf_size, stack_depth, tile_rows, tile_cols, fast_light,
        reverse_shadows=reverse_shadows,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "bounces", "leaf_size", "tile_rows", "tile_cols",
        "interpret", "fast_light", "stack_depth", "compressed", "dual",
        "stream", "npop", "npop0", "reverse_shadows", "adaptive",
    ),
)
def _render_bvh_pallas(
    ds,
    packed_dev,
    cam_arrays,
    width: int,
    height: int,
    bounces: int,
    leaf_size: int,
    tile_rows: int,
    tile_cols: int,
    interpret: bool,
    fast_light: bool = True,
    stack_depth: int = 96,
    y_offset=0,
    compressed: bool = False,
    dual: bool = True,
    stream: bool = False,
    npop: int = 2,
    npop0: int = 0,
    reverse_shadows: bool = True,
    adaptive: bool = False,
):
    from . import pallas_trace

    o, d = generate_rays_tiled(
        cam_arrays, width, height, tile_rows, tile_cols, y_offset
    )
    closest_fn, occluded_fn = pallas_trace.make_tracer(
        packed_dev, leaf_size, interpret=interpret, ds=ds,
        stack_depth=stack_depth, compressed=compressed, dual=dual,
        stream=stream, npop=npop, adaptive=adaptive,
    )
    if npop0 and npop0 != npop:
        # Coherent primary bounce at its own (narrower) pop width.
        c0, o0 = pallas_trace.make_tracer(
            packed_dev, leaf_size, interpret=interpret, ds=ds,
            stack_depth=stack_depth, compressed=compressed, dual=dual,
            stream=stream, npop=npop0, adaptive=adaptive,
        )
        closest_fn = [c0, closest_fn]
        occluded_fn = [o0, occluded_fn]
    if not fast_light:
        occluded_fn = (
            [occluded_from_closest(c) for c in closest_fn]
            if isinstance(closest_fn, list)
            else occluded_from_closest(closest_fn)
        )
    col = trace_rays(ds, closest_fn, occluded_fn, o, d, bounces,
                     reverse_shadows=fast_light and reverse_shadows)
    col = col.clamp(0.0, 1.0)
    flat = jnp.stack([col.x, col.y, col.z], axis=-1)
    return tiles_to_image(flat, width, height, tile_rows, tile_cols)


def _render_bvh_fused(
    ds,
    packed_dev,
    cam_arrays,
    width: int,
    height: int,
    bounces: int,
    leaf_size: int,
    tile_rows: int,
    tile_cols: int,
    interpret: bool,
    stack_depth: int = 96,
    y_offset=0,
    compressed: bool = False,
    npop: int = 2,
    npop0: int = 0,
    reverse_shadows: bool = True,
    adaptive: bool = False,
):
    from . import pallas_trace

    o, d = generate_rays_tiled(
        cam_arrays, width, height, tile_rows, tile_cols, y_offset
    )
    rows = o.x.shape[0] // pallas_trace.LANES
    o2 = o.reshape(rows, pallas_trace.LANES)
    d2 = d.reshape(rows, pallas_trace.LANES)
    lamb = pallas_trace.pack_lights(ds)
    col = pallas_trace.frame_tiles(
        *packed_dev[:4], lamb, o2, d2, bounces=bounces, leaf_size=leaf_size,
        interpret=interpret, stack_depth=stack_depth, compressed=compressed,
        cmat=packed_dev[4] if len(packed_dev) >= 5 else None, npop=npop,
        npop0=npop0, reverse_shadows=reverse_shadows, adaptive=adaptive,
        sph=pallas_trace.pack_spheres(ds),
    )
    col = col.reshape(o.x.shape[0]).clamp(0.0, 1.0)
    flat = jnp.stack([col.x, col.y, col.z], axis=-1)
    return tiles_to_image(flat, width, height, tile_rows, tile_cols)


def render_bvh_fused(
    ds,
    packed_dev,
    cam: Camera,
    width: int,
    height: int,
    bounces: int = 4,
    leaf_size: int = 8,
    tile_rows: int = 32,
    tile_cols: int = 32,
    interpret: bool = False,
    stack_depth: int = 96,
    compressed: bool = False,
    npop: int = 2,
    npop0: int = 0,
    reverse_shadows: bool = True,
    adaptive: bool = False,
):
    """Whole-frame fused-kernel render (pallas_trace.frame_tiles): the
    entire bounce loop in ONE kernel launch per packet — no inter-pass
    barriers or XLA glue. Requires bvh_width >= 4; spheres ride a dense
    in-kernel pass after each BVH traversal (pallas_trace.pack_spheres);
    image matches render_bvh_pallas (tests/test_fused.py)."""
    from .pallas_trace import PACKET

    assert tile_rows * tile_cols == PACKET, (tile_rows, tile_cols)
    cam_arrays = tuple(
        jnp.asarray(a) for a in ray_basis(cam, width, height)
    )
    return _render_bvh_fused(
        ds, packed_dev, cam_arrays, width, height, bounces, leaf_size,
        tile_rows, tile_cols, interpret, stack_depth,
        compressed=compressed, npop=npop, npop0=npop0,
        reverse_shadows=reverse_shadows, adaptive=adaptive,
    )


def render_bvh_pallas(
    ds,
    packed_dev,
    cam: Camera,
    width: int,
    height: int,
    bounces: int = 4,
    leaf_size: int = 8,
    tile_rows: int = 32,
    tile_cols: int = 32,
    interpret: bool = False,
    fast_light: bool = True,
    stack_depth: int = 96,
    compressed: bool = False,
    dual: bool = True,
    stream: bool = False,
    npop: int = 2,
    npop0: int = 0,
    reverse_shadows: bool = True,
    adaptive: bool = False,
):
    """Packet-traversal render with the Pallas TPU kernels (production path).

    packed_dev: (cbox, cmeta, tri) device arrays from pallas_trace.pack_bvh.
    Pixel tiles must hold exactly 1024 rays (one (8,128) packet per grid
    step); (32, 32) blocks are the most ray-coherent choice.
    """
    from .pallas_trace import PACKET

    assert tile_rows * tile_cols == PACKET, (tile_rows, tile_cols)
    cam_arrays = tuple(jnp.asarray(a) for a in ray_basis(cam, width, height))
    return _render_bvh_pallas(
        ds, packed_dev, cam_arrays, width, height, bounces,
        leaf_size, tile_rows, tile_cols, interpret, fast_light,
        stack_depth, compressed=compressed, dual=dual, stream=stream,
        npop=npop, npop0=npop0, reverse_shadows=reverse_shadows,
        adaptive=adaptive,
    )
