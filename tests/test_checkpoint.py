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


def test_render_band_matches_full_frame(tiny_scene):
    """pipe.render_band rows are bit-identical to the whole frame's rows."""
    from parallel_ray_tracer_tpu import pipeline
    from parallel_ray_tracer_tpu.config import RenderConfig

    cfg = RenderConfig(
        width=64, height=32, bounces=2, tile_rows=8, tile_cols=128,
        use_native=False, variant="jax",
    )
    pipe = pipeline.prepare(cfg, scene=tiny_scene)
    full = np.asarray(pipe.render(variant="jax"))
    for y0, rows in ((0, 8), (8, 16), (24, 8)):
        band = np.asarray(pipe.render_band(y0, rows, variant="jax"))
        np.testing.assert_array_equal(band[:rows], full[y0 : y0 + rows])


def test_cli_checkpoint_resume(tmp_path, tiny_scene, monkeypatch):
    """--checkpoint renders banded, persists, and resumes to completion."""
    import parallel_ray_tracer_tpu.pipeline as pipeline_mod
    from parallel_ray_tracer_tpu import cli

    monkeypatch.setattr(
        pipeline_mod, "load_scene", lambda _dir: tiny_scene
    )
    ck = str(tmp_path / "resume.npz")
    out = str(tmp_path / "out.bmp")
    argv = [
        "--scene", "car_only", "--asset-root", str(tmp_path),
        "--width", "64", "--height", "32", "--bounces", "1",
        "--variant", "jax", "--tile", "8x128", "--band-rows", "8",
        "--checkpoint", ck, "--output", out, "--quiet",
        "--no-native", "--heuristic", "6",
    ]
    # Asset dir must exist for cfg.asset_dir(); loader is monkeypatched.
    import os

    os.makedirs(tmp_path / "car_only", exist_ok=True)
    (tmp_path / "car_only" / "triangles.obj").write_text("")
    (tmp_path / "car_only" / "triangles.mtl").write_text("")
    assert cli.main(argv) == 0
    assert os.path.exists(ck) and os.path.exists(out)
    # Second invocation resumes (all bands done -> no rework, still exits 0).
    assert cli.main(argv) == 0
