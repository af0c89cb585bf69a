"""Inverse rendering example — the reference's docs/examples/10_inverse_
rendering/invert_cbox.py counterpart (SURVEY.md §3.3 call stack).

Workflow: render a target image, perturb a wall albedo, then recover it by
gradient descent through the differentiable renderer (pass-level
radiative-backprop adjoint, O(one-pass) memory).

Run: python examples/invert_cbox.py [--cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=30)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import mitsuba2_tpu as mi
    from mitsuba2_tpu.diff.adjoint import render_and_grad
    from mitsuba2_tpu.diff.params import traverse, scene_with
    from mitsuba2_tpu.diff.optimizers import adam_init, adam_step
    from mitsuba2_tpu.render.integrators import render
    from mitsuba2_tpu.scene.presets import cornell_box

    config = mi.RenderConfig(width=64, height=64, spp=32, spp_per_pass=32,
                             max_depth=3, rr_depth=99)

    # ground truth
    scene_gt = cornell_box()
    params_gt = traverse(scene_gt)
    key = next(k for k in params_gt if k.endswith("left.bsdf.reflectance")
               or "red" in k or "left" in k)
    target_value = np.asarray(params_gt[key])
    target = render(scene_gt, config, seed=0)
    print(f"optimizing {key!r}; true value {target_value}")

    # perturbed start
    scene = scene_with(scene_gt, {key: jnp.asarray([0.6, 0.6, 0.6])})
    state = None
    for it in range(args.iterations):
        img, loss, grads = render_and_grad(
            scene, config, lambda im: jnp.mean((im - target) ** 2),
            seed=it + 1)
        # gradient step on the full material table, then re-freeze
        theta = {"mat_data": scene.mat_data,
                 "emitter_data": scene.emitter_data}
        g = {"mat_data": grads["mat_data"],
             "emitter_data": grads["emitter_data"]}
        if state is None:
            state = adam_init(theta)
        theta, state = adam_step(theta, g, state, lr=args.lr)
        scene = scene.replace(mat_data=theta["mat_data"],
                              emitter_data=theta["emitter_data"])
        cur = np.asarray(traverse(scene)[key])
        print(f"iter {it:3d} loss {float(loss):.6f} value {cur}")

    err = np.abs(np.asarray(traverse(scene)[key]) - target_value).max()
    print(f"final abs error {err:.4f}")
    assert err < 0.08, "optimization did not converge"


if __name__ == "__main__":
    main()
