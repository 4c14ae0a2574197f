"""Regenerate the repo-bundled scene snapshots from a reference checkout.

The bundled assets/<scene>.npz files are compressed array snapshots of the
reference's OBJ/MTL/lights text assets (parsed with the same loader the
framework uses at runtime). They make the repo self-contained: rendering
and the test suite work with /root/reference absent. Re-run this script
against a reference checkout to refresh them:

    python scripts/snapshot_assets.py [/path/to/reference/assets]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_ray_tracer_tpu.models.scene import load_scene, save_scene_npz

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENES = ("car_only", "car_boxed")


def main() -> None:
    src_root = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/assets"
    out_root = os.path.join(REPO, "assets")
    os.makedirs(out_root, exist_ok=True)
    for name in SCENES:
        src = os.path.join(src_root, name)
        if not os.path.isdir(src):
            print(f"skip {name}: {src} not found")
            continue
        scene = load_scene(src)
        out = os.path.join(out_root, name + ".npz")
        save_scene_npz(scene, out)
        print(
            f"{out}: {scene.num_triangles} tris, {scene.num_lights} lights, "
            f"{os.path.getsize(out)/1e6:.2f} MB"
        )


if __name__ == "__main__":
    main()
