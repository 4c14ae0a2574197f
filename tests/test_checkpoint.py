"""Checkpoint / resume utilities."""

import numpy as np
import jax.numpy as jnp

from parallel_ray_tracer_tpu.utils.checkpoint import (
    TileRenderCheckpoint,
    load_pytree,
    save_pytree,
)


def test_pytree_roundtrip(tmp_path):
    tree = {
        "verts": jnp.arange(12.0).reshape(4, 3),
        "opt": (jnp.zeros(3), {"step": jnp.int32(7)}),
    }
    path = str(tmp_path / "ck.npz")
    save_pytree(path, tree)
    back = load_pytree(path, tree)
    assert np.array_equal(back["verts"], np.asarray(tree["verts"]))
    assert int(back["opt"][1]["step"]) == 7


def test_tile_render_resume(tmp_path):
    path = str(tmp_path / "render.npz")
    calls = []

    def render_band(y0, rows):
        calls.append(y0)
        return np.full((rows, 8, 3), float(y0), np.float32)

    ck = TileRenderCheckpoint(path, width=8, height=10, band_rows=4)
    # Simulate a crash after two bands.
    state = ck.load()
    for b in range(2):
        y0 = b * 4
        rows = min(4, 10 - y0)
        state["image"][y0 : y0 + rows] = render_band(y0, rows)
        state["done"][b] = True
    save_pytree(path, state)

    img = ck.run(render_band)
    # Resume rendered only the missing last band (y0=8).
    assert calls == [0, 4, 8]
    assert img.shape == (10, 8, 3)
    assert (img[0:4] == 0.0).all() and (img[8:10] == 8.0).all()
