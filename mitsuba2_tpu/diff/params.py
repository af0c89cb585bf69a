"""Differentiable-parameter traversal — mitsuba's `traverse()`/ParameterMap.

TPU-native rebuild of src/python/python/util.py::traverse. The reference
walks the C++ object graph collecting DiffArray leaves into a flat
string-keyed map; here the scene already IS a pytree, so `traverse` simply
exposes named views into the packed tables, recorded at build time in
`SceneData.param_paths` (scene/scene.py).

Key differences, by design:
- `ParameterMap.update()` is FUNCTIONAL: it returns a new SceneData rather
  than mutating (there is nothing to mutate — scenes are frozen pytrees).
- `scene_with(scene, {name: value})` is fully jit-differentiable: RGB slot
  updates re-derive the spectral upsampling coefficients ON DEVICE through
  the fitted coefficient lattice, so `jax.grad` w.r.t. the value dict works
  in every color mode (the reference re-runs parameters_changed() on host).
"""
from __future__ import annotations

import re
from typing import Dict, Iterable

import jax.numpy as jnp

from ..core import spectrum as sp
from ..render.spectra import SLOT_ILLUMINANT


def _get_table(scene, table: str):
    obj = scene
    for part in table.split("."):
        obj = getattr(obj, part)
    return obj


def _set_table(scene, table: str, value):
    parts = table.split(".")
    if len(parts) == 1:
        return scene.replace(**{table: value})
    # one level of nesting (e.g. "textures.data")
    assert len(parts) == 2
    child = getattr(scene, parts[0]).replace(**{parts[1]: value})
    if table == "textures.data" and getattr(child, "mips", None) is not None:
        # derived rebuild (parameters_changed()): keep the mip pyramid in
        # sync with the updated texels
        from ..render import texture as texture_mod
        child = child.replace(mips=texture_mod.build_mips(child.data,
                                                          child.info))
    return scene.replace(**{parts[0]: child})


def _slot_update(row_slice, rgb):
    """Rebuild a full 8-wide spectrum slot from new RGB, on device &
    differentiably: coefficients from the fitted lattice, out-of-gamut
    brightness folded into the scale column (spectra.py layout)."""
    rgb = jnp.asarray(rgb, jnp.float32).reshape(3)
    scale = jnp.maximum(jnp.max(rgb) / 0.999, 1.0)
    lattice = sp.srgb_model_fetch_lattice()
    coeffs = sp.srgb_model_fetch_interp(lattice, rgb / scale)
    kind = row_slice[7]
    return jnp.concatenate([rgb, coeffs, scale[None], kind[None]])


class ParameterMap:
    """Flat name -> parameter view over a frozen scene pytree."""

    def __init__(self, scene, entries=None):
        self.scene = scene
        if entries is None:
            entries = {p[0]: p[1:] for p in scene.param_paths}
        self._entries = dict(entries)

    def keys(self):
        return self._entries.keys()

    def items(self):
        return ((k, self[k]) for k in self._entries)

    def __len__(self):
        return len(self._entries)

    def __contains__(self, name):
        return name in self._entries

    def __iter__(self):
        return iter(self._entries)

    def __getitem__(self, name) -> jnp.ndarray:
        table, row, c0, c1, kind = self._entries[name]
        arr = _get_table(self.scene, table)
        if kind == "image":
            return arr[row]
        if kind == "full":   # whole-table view (e.g. the density grid)
            return arr
        return arr[row, c0:c1] if c1 - c0 > 1 else arr[row, c0]

    def keep(self, patterns) -> "ParameterMap":
        """Filter to names matching any regex (util.py::ParameterMap.keep)."""
        if isinstance(patterns, str):
            patterns = [patterns]
        kept = {k: v for k, v in self._entries.items()
                if any(re.search(p, k) for p in patterns)}
        return ParameterMap(self.scene, kept)

    def flat(self) -> Dict[str, jnp.ndarray]:
        """Materialize {name: value} — the optimizable pytree."""
        return {k: self[k] for k in self._entries}

    def update(self, values: Dict[str, jnp.ndarray]) -> "ParameterMap":
        """Return a new ParameterMap over a scene with `values` applied
        (the functional analog of params.update())."""
        new_scene = scene_with(self.scene, values, self._entries)
        return ParameterMap(new_scene, self._entries)


def traverse(scene) -> ParameterMap:
    """mitsuba.python.util.traverse: scene -> flat parameter map."""
    return ParameterMap(scene)


def scene_with(scene, values: Dict[str, jnp.ndarray], entries=None):
    """Functionally apply {name: value} onto the scene tables.

    Jit-differentiable w.r.t. `values`; this is the entry point the
    optimization loop jits: grad(loss(render(scene_with(scene, θ))), θ).
    """
    if entries is None:
        entries = {p[0]: p[1:] for p in scene.param_paths}
    # group updates by table so each table is scattered once
    by_table: Dict[str, list] = {}
    for name, value in values.items():
        table, row, c0, c1, kind = entries[name]
        by_table.setdefault(table, []).append((row, c0, c1, kind, value))
    for table, ups in by_table.items():
        arr = _get_table(scene, table)
        for row, c0, c1, kind, value in ups:
            value = jnp.asarray(value, jnp.float32)
            if kind == "image":
                arr = arr.at[row].set(value)
            elif kind == "full":
                arr = value.reshape(arr.shape)
            elif kind == "rgb":
                slot = _slot_update(arr[row, c0:c0 + 8], value)
                arr = arr.at[row, c0:c0 + 8].set(slot)
            else:
                # "vec"/"scalar": plain columns (medium rows store raw
                # RGB, not 8-wide spectrum slots)
                arr = arr.at[row, c0:c1].set(value.reshape(c1 - c0))
        scene = _set_table(scene, table, arr)
    return scene
