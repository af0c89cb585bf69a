"""K_AUX vs FD-accuracy vs cost sweep for the reparameterized integrator.

VERDICT r04 #3: the config-5 integrator ran with a hardcoded K_AUX=16
that had never been examined. This sweep measures, per K in {4, 8, 16}:

  - the reparameterized AD boundary gradient on the occluder-pose scene
    (examples/occluder_pose_grad.py) against the FD oracle — the
    ACCURACY axis: too few aux rays truncate the warp and the gradient
    systematically shrinks;
  - the Cornell-box reparam render rate (the bench's config-5 metric) —
    the COST axis: aux traces are ~all of the reparam overhead and batch
    into one traversal per warp call, so cost is ~linear in K.

The measured table lives in docs/TPU_TRAVERSAL.md ("Reparam cost
decomposition"); RenderConfig.reparam_kaux carries the resulting policy.

Usage: timeout 1800 python benchmarks/reparam_kaux_sweep.py [--cpu]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import mitsuba2_tpu as mi  # noqa: E402
from mitsuba2_tpu.render.integrators import render, _render_all_passes_jit  # noqa: E402
from mitsuba2_tpu.scene.presets import cornell_box  # noqa: E402

sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/examples")
from occluder_pose_grad import build_occluder_scene  # noqa: E402


def median_time(run, warmups=2, reps=5):
    for r in range(warmups):
        out = run(r)
        jax.block_until_ready(out)
        if r == 0:
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(warmups + r))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    # the Cornell cost axis is TPU work (a CPU run of the reparam
    # integrator at 256^2 takes tens of minutes per K); on CPU run the
    # ACCURACY axis only unless --force-cost is given
    cost_axis = (jax.devices()[0].platform != "cpu"
                 or "--force-cost" in sys.argv)
    scene, occ_rows = build_occluder_scene()
    gcfg = mi.RenderConfig(width=24, height=24, spp=16, spp_per_pass=16,
                           max_depth=2)

    def loss(theta, cfg):
        from mitsuba2_tpu.scene.scene import refresh_mxu_feat
        shift = jnp.stack([theta, jnp.zeros_like(theta),
                           jnp.zeros_like(theta)])
        s = scene.replace(prim_p0=scene.prim_p0.at[occ_rows].add(shift))
        s = refresh_mxu_feat(s)
        return jnp.mean(render(s, cfg))

    eps = 0.04
    fd = (float(loss(jnp.float32(eps), gcfg)) -
          float(loss(jnp.float32(-eps), gcfg))) / (2 * eps)
    print(f"FD oracle: {fd:+.4f}", flush=True)

    cornell = cornell_box()
    ccfg = mi.RenderConfig(width=256, height=256, spp=16, spp_per_pass=4,
                           max_depth=4, rr_depth=8, reparam=True)
    n_passes = ccfg.spp // ccfg.spp_per_pass
    rays = (ccfg.width * ccfg.height * ccfg.spp_per_pass *
            (1 + 2 * (ccfg.max_depth - 1)) * n_passes)

    print(f"\n{'K':>4s} {'AD grad':>9s} {'rel err':>8s} "
          f"{'cornell Mrays/s':>16s} {'ms':>8s}", flush=True)
    for k in (4, 8, 16):
        rcfg = gcfg.replace(reparam=True, reparam_kaux=k)
        ad = float(jax.grad(loss)(jnp.float32(0.0), rcfg))
        rel = abs(ad - fd) / max(abs(fd), 1e-9)
        if cost_axis:
            ck = ccfg.replace(reparam_kaux=k)
            dt = median_time(lambda r: _render_all_passes_jit(
                cornell, ck, r, n_passes))
            print(f"{k:4d} {ad:+9.4f} {rel:8.3f} "
                  f"{rays / dt / 1e6:16.3f} {dt * 1e3:8.1f}", flush=True)
        else:
            print(f"{k:4d} {ad:+9.4f} {rel:8.3f} {'(cpu: skipped)':>16s}",
                  flush=True)


if __name__ == "__main__":
    main()
