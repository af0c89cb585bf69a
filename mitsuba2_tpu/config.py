"""Render configuration — the TPU-native replacement for mitsuba2 variants.

The reference compiles the cartesian product {scalar,packet,gpu,gpu_autodiff}
x {mono,rgb,spectral}[_polarized][_double] as C++ template instantiations
selected by `mitsuba.set_variant()` (mitsuba.conf + codegen, SURVEY.md §5.6).
Under JAX one codebase retraces per static config instead: `RenderConfig` is
a frozen dataclass passed as a static jit argument.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

COLOR_MODES = ("mono", "rgb", "spectral")


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rendering configuration (hashable -> usable as jit static arg)."""
    color_mode: str = "rgb"           # mono | rgb | spectral
    polarized: bool = False           # Stokes-vector radiance (post-MVP)
    max_depth: int = 2                # path depth; 2 = direct illumination
    rr_depth: int = 5                 # start Russian roulette at this depth
    spp: int = 64                     # samples per pixel
    spp_per_pass: int = 64            # wavefront chunk (memory bound)
    width: int = 256
    height: int = 256
    seed: int = 0
    rfilter: str = "box"              # box | tent | gaussian | mitchell | catmullrom | lanczos
    # hdrfilm crop window (films/hdrfilm.cpp): render only a (width, height)
    # window whose top-left sits at (crop_x, crop_y) of a film_width x
    # film_height full film. None = uncropped (full film = width x height).
    film_width: Optional[int] = None
    film_height: Optional[int] = None
    crop_x: int = 0
    crop_y: int = 0
    hide_emitters: bool = False
    sampler: str = "independent"
    # full integrator family (L3 plugins): path | volpath | volpathmis |
    # direct | depth | aov | moment | stokes. render() runs the transport
    # integrators directly; integrators.render_any dispatches the rest.
    integrator: str = "path"
    # `aov` integrator: the output channels and the wrapped child
    aovs: tuple = ()
    aov_child: str = "path"
    remat: bool = False               # checkpoint each bounce (adjoint memory)
    compact: bool = False             # sort wavefront between bounces (kernels/compact.py)
    # Reparameterized transport (diff/reparam.py, pathreparam branch /
    # Loubet 2019): warp NEE + BSDF-sampled directions (and camera rays)
    # so visibility discontinuities become stationary — geometry/pose
    # gradients include the boundary term at EVERY bounce. Expensive
    # (K_AUX auxiliary traces per reparameterized direction); off for
    # forward rendering.
    reparam: bool = False
    # Auxiliary rays per reparameterized direction (Loubet's K). The
    # K-vs-FD-accuracy tradeoff is measured in docs/TPU_TRAVERSAL.md
    # ("Reparam cost decomposition"); all K aux rays of a pass batch into
    # ONE traversal, so cost is ~linear in K.
    reparam_kaux: int = 16
    # The reference's `_double` variant family: "float64" renders with the
    # scene upcast to f64; JAX type promotion then carries f64 through the
    # shading/emission arithmetic (requires jax_enable_x64 — use
    # jax.enable_x64(True) around the render). Intended for
    # high-precision FD gradient oracles, not production.
    dtype: str = "float32"            # float32 | float64

    def __post_init__(self):
        if self.color_mode not in COLOR_MODES:
            raise ValueError(f"unknown color_mode {self.color_mode!r}")
        if self.dtype not in ("float32", "float64"):
            raise ValueError(f"unknown dtype {self.dtype!r}")
        if self.integrator not in ("path", "volpath", "volpathmis", "direct",
                                   "depth", "aov", "moment", "stokes"):
            raise ValueError(f"unknown integrator {self.integrator!r}")
        # the aov wrapper's child must be a non-wrapper transport
        # integrator (prevents aov-in-aov recursion)
        if self.aov_child not in ("path", "volpath", "volpathmis", "direct",
                                  "moment", "stokes"):
            raise ValueError(f"invalid aov child {self.aov_child!r}")

    @property
    def float_dtype(self):
        import jax.numpy as jnp
        return jnp.float64 if self.dtype == "float64" else jnp.float32

    @property
    def n_channels(self) -> int:
        """Spectral/radiance channels carried per lane."""
        return {"mono": 1, "rgb": 3, "spectral": 4}[self.color_mode]

    @property
    def n_image_channels(self) -> int:
        """Channels in the developed image (spectral develops to RGB)."""
        return {"mono": 1, "rgb": 3, "spectral": 3}[self.color_mode]

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)

    @property
    def variant(self) -> str:
        """The reference-style variant string of this config
        (`{mono,rgb,spectral}[_polarized][_double]`, SURVEY.md §5.6)."""
        return (self.color_mode
                + ("_polarized" if self.polarized else "")
                + ("_double" if self.dtype == "float64" else ""))


def variants() -> tuple:
    """All supported variant strings (mitsuba.variants() analog). The
    reference's scalar/packet/gpu axis is absorbed by XLA — one codebase
    runs on CPU and TPU — so only the color/polarization/precision axes
    remain."""
    out = []
    for mode in COLOR_MODES:
        for pol in ("", "_polarized"):
            for dbl in ("", "_double"):
                out.append(mode + pol + dbl)
    return tuple(out)


def parse_variant(name: str) -> dict:
    """Variant string -> RenderConfig.replace kwargs. Raises on unknown
    names (same vocabulary as the CLI's -m flag)."""
    mode, kw = name, {}
    if mode.endswith("_double"):
        mode, kw["dtype"] = mode[: -len("_double")], "float64"
    else:
        kw["dtype"] = "float32"
    if mode.endswith("_polarized"):
        mode, kw["polarized"] = mode[: -len("_polarized")], True
    else:
        kw["polarized"] = False
    if mode not in COLOR_MODES:
        raise ValueError(
            f"unknown variant {name!r}: expected "
            "{mono,rgb,spectral}[_polarized][_double]")
    kw["color_mode"] = mode
    return kw
