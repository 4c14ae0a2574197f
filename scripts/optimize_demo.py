"""Inverse-rendering demo: recover scene parameters from a target image.

The north star's differentiable-optimization configuration in miniature:
render a target, perturb parameters, then descend the pixel L2 loss through
the differentiable tracer (ops/diff.py: frozen-topology custom VJP +
optional soft shadows) until the scene re-converges.

Default mode optimizes light position + diffuse albedo (smooth, strongly
observable parameters). `--verts` additionally optimizes the vertex buffer —
note that vertex gradients from the interior formulation act only through
shading (hit distances/normals); silhouette motion carries no gradient, so
pure-geometry recovery is much slower and benefits from --soft shadows.

    python scripts/optimize_demo.py [--steps 100] [--soft] [--verts]
"""

from __future__ import annotations

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--lr", type=float, default=2e-2)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--soft", action="store_true", help="soft shadow gradients")
    ap.add_argument("--verts", action="store_true",
                    help="also optimize the vertex buffer")
    ap.add_argument("--perturb", type=float, default=0.15)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from parallel_ray_tracer_tpu.models.camera import default_camera, ray_basis
    from parallel_ray_tracer_tpu.models.device_scene import build_device_scene
    from parallel_ray_tracer_tpu.models.scene import Scene
    from parallel_ray_tracer_tpu.ops import diff, trace_brute
    from parallel_ray_tracer_tpu.ops.render import (
        generate_rays_tiled,
        tiles_to_image,
    )

    # A simple lit scene: floor + pyramid.
    verts0 = np.array(
        [
            [-5, -5, 0], [5, -5, 0], [5, 5, 0], [-5, 5, 0],
            [-1.2, -0.5, 0.0], [1.2, -0.5, 0.0], [0.0, 1.0, 0.0],
            [0.0, 0.0, 2.2],
        ],
        np.float32,
    )
    faces = np.array(
        [[0, 1, 2], [0, 2, 3], [4, 5, 7], [5, 6, 7], [6, 4, 7]], np.int32
    )
    scene = Scene(
        verts=verts0,
        faces=faces,
        mat_idx=np.array([0, 0, 1, 1, 1], np.int32),
        mats_kd=np.array([[0.75, 0.75, 0.75], [0.65, 0.15, 0.1]], np.float32),
        mats_ks=np.array([[0.0, 0.0, 0.0], [0.3, 0.3, 0.3]], np.float32),
        mats_kr=np.zeros((2, 3), np.float32),
        lights_pos=np.array([[2.0, -6.0, 7.0]], np.float32),
        lights_kl=np.array([[45.0, 45.0, 45.0]], np.float32),
    )

    cam_arrays = tuple(
        jnp.asarray(a)
        for a in ray_basis(default_camera(), args.width, args.height)
    )
    o, d = generate_rays_tiled(cam_arrays, args.width, args.height, 32, 32)

    def render(params):
        ds = build_device_scene(
            params["verts"], scene.faces, scene.mat_idx, params["kd"],
            scene.mats_ks, scene.mats_kr, params["light"], scene.lights_kl,
        )
        cf, of = trace_brute.make_tracer(ds)
        col = diff.trace_rays_diff(
            ds, cf, of, o, d, bounces=1, soft_shadows=args.soft
        )
        return jnp.stack([col.x, col.y, col.z], axis=-1)

    true_params = {
        "verts": jnp.asarray(verts0),
        "light": jnp.asarray(scene.lights_pos),
        "kd": jnp.asarray(scene.mats_kd),
    }
    target = render(true_params)

    rng = np.random.RandomState(args.seed)
    params = dict(true_params)
    params["light"] = true_params["light"] + jnp.asarray(
        rng.randn(*scene.lights_pos.shape).astype(np.float32) * 1.0
    )
    params["kd"] = jnp.clip(
        true_params["kd"]
        + jnp.asarray(rng.randn(2, 3).astype(np.float32) * 0.15),
        0.05, 0.95,
    )
    if args.verts:
        pert = np.zeros_like(verts0)
        pert[4:] = rng.randn(4, 3).astype(np.float32) * args.perturb
        params["verts"] = jnp.asarray(verts0 + pert)

    opt_keys = ["light", "kd"] + (["verts"] if args.verts else [])

    def loss_fn(p):
        full = dict(true_params)
        full.update(p)
        return jnp.mean((render(full) - target) ** 2)

    step = jax.jit(
        lambda p: (loss_fn(p), jax.grad(loss_fn)(p))
    )

    def errors(p):
        return {
            k: float(jnp.abs(p[k] - true_params[k]).max()) for k in opt_keys
        }

    opt = {k: params[k] for k in opt_keys}
    print("initial errors:", {k: f"{v:.4f}" for k, v in errors(opt).items()})
    # Tiny Adam (the raw pixel-loss gradients span orders of magnitude
    # between light position and albedo).
    lr = {"light": 5.0 * args.lr, "kd": args.lr, "verts": args.lr}
    m = {k: jnp.zeros_like(opt[k]) for k in opt_keys}
    v = {k: jnp.zeros_like(opt[k]) for k in opt_keys}
    b1, b2, eps = 0.9, 0.999, 1e-8
    for i in range(args.steps):
        loss, g = step(opt)
        for k in opt_keys:
            m[k] = b1 * m[k] + (1 - b1) * g[k]
            v[k] = b2 * v[k] + (1 - b2) * g[k] ** 2
            mh = m[k] / (1 - b1 ** (i + 1))
            vh = v[k] / (1 - b2 ** (i + 1))
            opt[k] = opt[k] - lr[k] * mh / (jnp.sqrt(vh) + eps)
        if i % 10 == 0 or i == args.steps - 1:
            e = errors(opt)
            print(f"step {i:4d}  loss {float(loss):.3e}  " +
                  "  ".join(f"{k} err {v2:.4f}" for k, v2 in e.items()))

    final = errors(opt)
    init = errors({k: params[k] for k in opt_keys})
    ok = all(final[k] < init[k] * 0.5 + 1e-6 for k in ("light", "kd"))
    print("final:", {k: f"{v:.4f}" for k, v in final.items()},
          "-> recovered" if ok else "-> partial")
    return 0


if __name__ == "__main__":
    sys.exit(main())
