"""Command-line renderer — the `mitsuba` binary equivalent.

TPU-native rebuild of src/mitsuba/mitsuba.cpp:

    python -m mitsuba2_tpu scene.xml -o out.exr -D spp=64 -m rgb

Flags mirror the reference: `-o` output, `-D key=value` XML parameter
substitution, `-m` selects the color mode (the variant analog), `-v`
verbose. Threads (`-t`) do not apply — XLA owns the chip.
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="mitsuba2_tpu",
        description="TPU-native differentiable renderer (Mitsuba 2 rebuild)")
    ap.add_argument("scene", help="scene file (.xml)")
    ap.add_argument("-o", "--output", default=None,
                    help="output image (exr/png/pfm; default: scene name .exr)")
    ap.add_argument("-D", "--define", action="append", default=[],
                    metavar="key=value", help="XML $parameter substitution")
    ap.add_argument("-m", "--mode", default=None,
                    metavar="{mono,rgb,spectral}[_polarized][_double]",
                    help="variant string, e.g. rgb, spectral_polarized, "
                         "rgb_double (the reference's variant switcher)")
    ap.add_argument("-s", "--spp", type=int, default=None,
                    help="override samples per pixel")
    ap.add_argument("-a", "--aov", action="append", default=[],
                    help="also write AOV images (depth, sh_normal, ...)")
    ap.add_argument("--sensor", type=int, default=0,
                    help="render the Nth <sensor> of the scene (default 0)")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args(argv)

    if args.mode is not None:
        from .config import parse_variant
        try:
            parse_variant(args.mode)
        except ValueError as e:
            ap.error(str(e))

    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(levelname).1s %(message)s")
    log = logging.getLogger("mitsuba2_tpu")

    import jax

    # this environment's jaxlib ignores the JAX_PLATFORMS env var (axon
    # platform plugin); honor it explicitly so `JAX_PLATFORMS=cpu
    # python -m mitsuba2_tpu ...` works as documented
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        jax.config.update("jax_platforms", env_platforms)

    from .core import io_bitmap
    from .render.integrators import render, render_aovs
    from .scene import loader

    params = {}
    for d in args.define:
        k, _, v = d.partition("=")
        params[k] = v

    t0 = time.time()
    scene, config = loader.load_file(args.scene, sensor_index=args.sensor,
                                     **params)
    log.info("loaded %s (%d prims) in %.2fs", args.scene, scene.n_prims,
             time.time() - t0)
    if args.mode:
        from .config import parse_variant
        config = config.replace(**parse_variant(args.mode))
    if config.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    if args.spp:
        config = config.replace(spp=args.spp,
                                spp_per_pass=min(config.spp_per_pass, args.spp))

    log.info("rendering %dx%d spp=%d depth=%d mode=%s on %s",
             config.width, config.height, config.spp, config.max_depth,
             config.color_mode, jax.devices()[0].platform)
    t0 = time.time()
    import numpy as np

    from .render.integrators import render_any
    stokes_img = None
    sidecars = {}   # suffix -> array, written next to the main output
    if config.polarized and config.integrator not in ("stokes",):
        # polarized variant: full Mueller transport; the film image is S0
        # (the reference's *_polarized variants develop intensity; Stokes
        # components export as _s1.._s3 planes alongside)
        from .render.stokes import render_polarized
        stokes_img = render_polarized(scene, config)   # (H, W, C, 4)
        img = stokes_img[..., 0]
    else:
        out_any = render_any(scene, config)
        if isinstance(out_any, dict):          # aov integrator
            img = out_any.pop("image")
            sidecars.update(out_any)
        elif isinstance(out_any, tuple):       # moment: (mean, variance)
            img, sidecars["variance"] = out_any
        elif out_any.ndim == 3 and out_any.shape[-1] == 4 \
                and config.integrator == "stokes":
            img = out_any[..., 0:1]
            for i in (1, 2, 3):
                sidecars[f"s{i}"] = out_any[..., i:i + 1]
        else:
            img = out_any
    img.block_until_ready()
    dt = time.time() - t0
    n_rays = config.width * config.height * config.spp * \
        (1 + 2 * (config.max_depth - 1))
    log.info("rendered in %.2fs (%.2f Mrays/s incl. compile)", dt, n_rays / dt / 1e6)

    out = args.output or (args.scene.rsplit(".", 1)[0] + ".exr")
    io_bitmap.write(out, np.asarray(img))
    log.info("wrote %s", out)
    if stokes_img is not None:
        for i in (1, 2, 3):
            sidecars[f"s{i}"] = stokes_img[..., i]
    for suffix, arr in sidecars.items():
        path = out.rsplit(".", 1)[0] + f"_{suffix}.exr"
        io_bitmap.write_exr(path, np.asarray(arr))
        log.info("wrote %s", path)

    for aov in args.aov:
        aovs = render_aovs(scene, config, aovs=(aov,))
        path = out.rsplit(".", 1)[0] + f"_{aov}.exr"
        io_bitmap.write_exr(path, __import__("numpy").asarray(aovs[aov]))
        log.info("wrote %s", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
