"""Generate the committed sigmoid-polynomial coefficient lattice.

The TPU-native equivalent of the reference's `ext/rgb2spec` generator for
`resources/data/srgb.coeff` (SURVEY.md §2.3 srgb row): a batched
Gauss–Newton fit (core/spectrum.py::fit_srgb_model_batch) of the Jakob &
Hanika 2019 sigmoid-polynomial model at every node of a RES^3 lattice
over the linear-sRGB cube, written to mitsuba2_tpu/data/srgb_coeff_<RES>.npz
and loaded by srgb_model_fetch_lattice at import time. Committing the
table makes spectral renders stable across rounds (VERDICT round-2
missing #3) and removes the per-process fitting cost.

Also prints the quality report documented in tests/test_spectrum.py:
round-trip rgb -> trilinear coeffs -> spectrum -> rgb error on random
in-gamut colors, and the deviation of interpolated coefficients vs a
direct per-color fit.

    python benchmarks/gen_srgb_coeff.py [RES]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the fit is host numpy; the report's jnp calls must NOT touch the TPU
# (this environment's axon plugin ignores JAX_PLATFORMS, so config.update)
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

from mitsuba2_tpu.core import spectrum as sp  # noqa: E402


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    print(f"fitting 3 x {res}^3 max-channel lattice nodes...", flush=True)
    lattice = sp._build_srgb_lattice(res)

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "mitsuba2_tpu", "data")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"srgb_coeff_{res}.npz")
    np.savez_compressed(path, coeffs=lattice)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.2f} MB)")

    # ---- quality report (documented bound: tests/test_spectrum.py) --------
    rng = np.random.default_rng(0)
    test = rng.uniform(0.02, 0.98, (2048, 3))
    import jax.numpy as jnp
    interp = np.asarray(sp.srgb_model_fetch_interp(
        jnp.asarray(lattice), jnp.asarray(test, jnp.float32)))

    def coeffs_to_rgb(c):
        wl = sp._FIT_WL
        x = (c[:, 0:1] * wl + c[:, 1:2]) * wl + c[:, 2:3]
        refl = 0.5 + 0.5 * x / np.sqrt(1.0 + x * x)
        return refl @ sp._PROJ.T

    direct, _ = sp.fit_srgb_model_batch(test)
    rt_err = np.abs(coeffs_to_rgb(interp.astype(np.float64)) - test)
    lat_err = np.abs(coeffs_to_rgb(interp.astype(np.float64)) -
                     coeffs_to_rgb(direct))
    print(f"round-trip rgb error (vs target): max {rt_err.max():.4e} "
          f"p99 {np.percentile(rt_err, 99):.4e}")
    print(f"lattice-vs-direct-fit rgb error:  max {lat_err.max():.4e} "
          f"p99 {np.percentile(lat_err, 99):.4e}")


if __name__ == "__main__":
    main()
