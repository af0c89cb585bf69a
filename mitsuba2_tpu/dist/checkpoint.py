"""Checkpoint / resume for long renders and optimizations.

The reference has no checkpointing (SURVEY.md §5.4 — Adam state lives in
process memory, films are only recoverable mid-render via develop()); the
TPU rebuild makes it first-class: the complete render/optimization state
(film accumulator + weights, pass counter, parameter pytree, optimizer
moments, RNG bookkeeping) is a pytree saved as an .npz snapshot every N
passes. Resume = load + continue; multi-host failure recovery = restart
from the latest snapshot (§5.3).
"""
from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree) -> Tuple[Dict[str, np.ndarray], str]:
    leaves, treedef = jax.tree.flatten(tree)
    arrs = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    return arrs, str(treedef)


def save(path: str, state: Any, step: int = 0, meta: dict = None) -> None:
    """Atomically snapshot a pytree `state` (+ step + JSON-able meta)."""
    arrs, treedef = _flatten(state)
    payload = dict(arrs)
    payload["__meta__"] = np.frombuffer(
        json.dumps({"step": step, "treedef": treedef,
                    "meta": meta or {}}).encode(), np.uint8)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load(path: str, like: Any = None) -> Tuple[Any, int, dict]:
    """Load a snapshot. `like` (an example pytree with the same structure)
    restores the exact pytree type; without it a list of leaves is
    returned. Returns (state, step, meta)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        n = len([k for k in z.files if k.startswith("leaf_")])
        leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
    if like is not None:
        treedef = jax.tree.structure(like)
        state = jax.tree.unflatten(treedef, leaves)
    else:
        state = leaves
    return state, meta["step"], meta["meta"]


class CheckpointedRender:
    """Restartable multi-pass render: accumulates (image, wsum, pass) and
    snapshots every `every` passes. Usage:

        ck = CheckpointedRender("film.npz", every=8)
        start = ck.resume()            # 0 on a fresh run
        for p in range(start, n_passes):
            img_p, w_p = render_pass(scene, config, seed_for(p))
            ck.update(img_p, w_p, p)
        image = ck.develop()
    """

    def __init__(self, path: str, every: int = 8):
        self.path = path
        self.every = every
        self.image = None
        self.wsum = None
        self.done = 0

    def resume(self) -> int:
        if os.path.exists(self.path):
            state, step, _ = load(self.path)
            self.image, self.wsum = state[0], state[1]
            self.done = step
        return self.done

    def update(self, img_p, w_p, pass_idx: int) -> None:
        self.image = img_p if self.image is None else self.image + img_p
        self.wsum = w_p if self.wsum is None else self.wsum + w_p
        self.done = pass_idx + 1
        if self.done % self.every == 0:
            save(self.path, [self.image, self.wsum], step=self.done)

    def develop(self):
        from ..render import film as film_mod
        save(self.path, [self.image, self.wsum], step=self.done)
        return film_mod.develop(self.image, self.wsum)
