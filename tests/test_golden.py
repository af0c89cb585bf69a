"""Golden render tests (src/librender/tests/test_renders.py analog).

References are generated once at very high spp by this build (goldens/
*.npz, committed) and compared with an MC-aware z-test: the low-spp test
render must agree with the converged reference within k sigma of its own
per-pixel MC noise. This catches regressions in any part of the forward
pipeline while tolerating Monte-Carlo variance.
"""
import os

import numpy as np
import pytest

import mitsuba2_tpu as mi
from mitsuba2_tpu.render.integrators import render, render_with_variance
from mitsuba2_tpu.scene.presets import (cornell_box, furnace, kitchen_sink,
                                        veach_mis)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

SCENES = {
    "cornell_d2": (lambda: cornell_box(),
                   mi.RenderConfig(width=32, height=32, spp=64,
                                   spp_per_pass=64, max_depth=2)),
    "cornell_d4": (lambda: cornell_box(),
                   mi.RenderConfig(width=32, height=32, spp=64,
                                   spp_per_pass=64, max_depth=4, rr_depth=99)),
    "veach_d3": (lambda: veach_mis(),
                 mi.RenderConfig(width=32, height=32, spp=64,
                                 spp_per_pass=64, max_depth=3, rr_depth=99)),
    "furnace": (lambda: furnace(albedo=0.7),
                mi.RenderConfig(width=24, height=24, spp=64,
                                spp_per_pass=64, max_depth=8, rr_depth=99)),
    # one scene, many subsystems: envmap + bitmap texture + textured
    # roughness + dielectric + medium + thinlens DoF (presets.kitchen_sink)
    "kitchen_sink": (kitchen_sink,
                     mi.RenderConfig(width=32, height=32, spp=64,
                                     spp_per_pass=64, max_depth=4,
                                     rr_depth=99)),
}

GOLDEN_SPP = 4096


def _golden_path(name):
    return os.path.join(GOLDEN_DIR, f"{name}.npz")


def generate_goldens():  # invoked manually / by conftest when missing
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, (mk, cfg) in SCENES.items():
        path = _golden_path(name)
        if os.path.exists(path):
            continue
        scene = mk()
        img = np.asarray(render(scene, cfg.replace(
            spp=GOLDEN_SPP, spp_per_pass=256), seed=7))
        np.savez_compressed(path, image=img.astype(np.float32))
        print(f"generated {path}")


@pytest.mark.parametrize("name", sorted(SCENES))
def test_matches_golden(name):
    path = _golden_path(name)
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated (run tests/test_golden.py "
                    "generate_goldens first)")
    ref = np.load(path)["image"]
    mk, cfg = SCENES[name]
    scene = mk()
    mean, var = render_with_variance(scene, cfg.replace(spp_per_pass=16),
                                     seed=3)
    mean, var = np.asarray(mean), np.asarray(var)
    # sigma floor: absolute 1e-4 plus 0.5% relative — zero-variance pixels
    # (smooth env backgrounds, where every pass sees near-identical values)
    # still differ across SEEDS at the ~0.2% level through deterministic
    # jitter-dependent lookups, and a bare sqrt(var) would call that 20+
    # sigma. A systematic error still trips the relative floor at >1%.
    sigma = np.sqrt(var + 1e-8) + 5e-3 * np.abs(mean)
    z = np.abs(mean - ref) / sigma
    # aggregate z-test: with correct rendering, |z| is ~half-normal;
    # allow heavy MC tails but catch any systematic shift
    assert np.median(z) < 2.0, f"median z {np.median(z):.2f}"
    frac_bad = (z > 6.0).mean()
    assert frac_bad < 0.02, f"{frac_bad:.1%} pixels beyond 6 sigma"
    # and the clamped means agree loosely overall (clamping tames the
    # heavy-tailed glossy highlights that dominate raw means at low spp)
    np.testing.assert_allclose(np.minimum(mean, 2.0).mean(),
                               np.minimum(ref, 2.0).mean(), rtol=0.05)


if __name__ == "__main__":
    generate_goldens()
