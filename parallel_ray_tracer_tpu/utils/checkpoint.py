"""Checkpoint / resume: npz pytree snapshots (SURVEY.md §5).

The reference persists nothing but the final BMP (cpu/src/main.c:190-191).
For long multi-host 4K renders and differentiable-optimization runs this
module adds the minimal durable state story:

  - `save_pytree` / `load_pytree`: any jax/numpy pytree (optimizer state,
    vertex buffers, partial results) as a single .npz with the treedef
    stored alongside, written atomically (tmp + rename) so an interrupted
    save never corrupts the previous checkpoint.
  - `TileRenderCheckpoint`: incremental tile-band rendering — completed tile
    ranges land in the checkpoint, a restart resumes at the first missing
    band. This is the render-side resume used for large frames.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Callable, Optional, Tuple

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    """Atomically persist a pytree of arrays as npz + treedef JSON."""
    leaves, treedef = jax.tree.flatten(tree)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    payload["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8
    )
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
    os.close(fd)
    try:
        np.savez(tmp, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_pytree(path: str, like: Any) -> Any:
    """Restore a pytree saved by save_pytree, shaped like `like`."""
    with np.load(path) as z:
        leaves = [z[f"leaf_{i}"] for i in range(len(z.files) - 1)]
    _, treedef = jax.tree.flatten(like)
    return jax.tree.unflatten(treedef, leaves)


class TileRenderCheckpoint:
    """Resumable banded rendering of a large frame.

    render_band(y0, rows) -> (rows, W, 3); completed bands accumulate in the
    checkpoint file, and `run` resumes from the first missing band.
    """

    def __init__(self, path: str, width: int, height: int, band_rows: int):
        self.path = path
        self.width = width
        self.height = height
        self.band_rows = band_rows
        self.n_bands = -(-height // band_rows)

    def _state_like(self):
        return {
            "done": np.zeros(self.n_bands, np.bool_),
            "image": np.zeros((self.height, self.width, 3), np.float32),
        }

    def load(self):
        if os.path.exists(self.path):
            state = load_pytree(self.path, self._state_like())
            if state["image"].shape == (self.height, self.width, 3):
                return state
        return self._state_like()

    def run(
        self,
        render_band: Callable[[int, int], np.ndarray],
        progress: Optional[Callable[[int, int], None]] = None,
    ) -> np.ndarray:
        state = self.load()
        for b in range(self.n_bands):
            if state["done"][b]:
                continue
            y0 = b * self.band_rows
            rows = min(self.band_rows, self.height - y0)
            state["image"][y0 : y0 + rows] = np.asarray(
                render_band(y0, rows)
            )[:rows]
            state["done"][b] = True
            save_pytree(self.path, state)
            if progress:
                progress(b + 1, self.n_bands)
        return state["image"]
