"""Standalone traversal microbenchmark on the BVH-bound scene.

Measures raw closest-hit + any-hit Mrays/s of each intersection backend on
mesh_gallery (~31k tris), with coherent (camera-like) and incoherent
(random) wavefronts. Run it in a subprocess under `timeout` — traversal
experiments are the TPU-wedge hazard class.

    python benchmarks/traverse_bench.py [--backend jnp|pallas] [--n 262144]
        [--subdiv 4] [--rounds 3] [--incoherent-only]
"""
import argparse
import functools
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _watchdog(sig, frame):
    print(json.dumps({"error": "watchdog: dispatch hung"}), flush=True)
    os._exit(2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="jnp",
                    choices=["jnp", "pallas", "mxu", "inst", "instflat",
                             "bvh8", "bvh8mxu"])
    ap.add_argument("--inst-n", type=int, default=16,
                    help="inst backend: instance count for instanced_field")
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--subdiv", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--watchdog", type=int, default=420)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--sort", action="store_true",
                    help="route through the production Morton/octant "
                         "presort wrapper (scene._sorted_pallas_*) — the "
                         "arrangement the walk model's step counts assume")
    args = ap.parse_args()

    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(args.watchdog)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    __import__("mitsuba2_tpu.utils.jaxcache", fromlist=["x"]).configure(jax)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from mitsuba2_tpu.kernels import traverse_jnp, traverse_pallas
    from mitsuba2_tpu.scene.presets import instanced_field, mesh_gallery

    if args.backend == "inst":
        # shared-BLAS instanced Pallas kernels on the instancing stress
        # scene (hardware-validation phase 5); force shared — the auto
        # policy would flatten a scene this small (scene.py
        # _should_flatten_instances)
        os.environ["MI_FLATTEN_INSTANCES"] = "0"
        scene = instanced_field(n=args.inst_n, subdiv=args.subdiv)
    elif args.backend == "instflat":
        # the bake-off arm: same scene FLATTENED (K x prim memory), which
        # makes it eligible for the MXU cluster path — decides the auto
        # backend policy for instanced scenes (VERDICT r03 missing #4)
        scene = instanced_field(n=args.inst_n, subdiv=args.subdiv,
                                flatten=True)
    else:
        scene = mesh_gallery(subdiv=args.subdiv)
    print(f"# scene: {scene.n_prims} prims, "
          f"{scene.bvh_miss.shape[0]} bvh nodes, device="
          f"{jax.devices()[0].platform}", flush=True)

    mod = traverse_jnp if args.backend == "jnp" else traverse_pallas
    if args.backend in ("mxu", "instflat"):
        traverse_pallas.MXU_LEAVES = True
    N = args.n
    rng = np.random.default_rng(0)

    # coherent wavefront: camera-ish rays from a point toward the scene
    lo = np.asarray(scene.bvh_min)[0]
    hi = np.asarray(scene.bvh_max)[0]
    center = 0.5 * (lo + hi)
    eye = center + np.asarray([0, 0.2, -2.8], np.float32)
    targets = rng.uniform(lo, hi, (N, 3)).astype(np.float32)
    d_coh = targets - eye
    d_coh /= np.linalg.norm(d_coh, axis=1, keepdims=True)
    o_coh = np.broadcast_to(eye, (N, 3)).astype(np.float32)

    # incoherent wavefront: random origins in the box, random directions
    o_inc = rng.uniform(lo, hi, (N, 3)).astype(np.float32)
    d_inc = rng.normal(size=(N, 3)).astype(np.float32)
    d_inc /= np.linalg.norm(d_inc, axis=1, keepdims=True)

    results = {}
    for tag, o, d in (("coherent", o_coh, d_coh), ("incoherent", o_inc, d_inc)):
        o, d = jnp.asarray(o), jnp.asarray(d)

        # scene passed as a jit ARGUMENT: closing over SceneData embeds MBs
        # of constants in the HLO and stalls the remote compile service
        if args.backend == "inst":
            cfn, afn = mod.ray_intersect_instanced, mod.ray_test_instanced
        elif args.backend == "bvh8":
            cfn, afn = mod.ray_intersect_bvh8, mod.ray_test_bvh8
        elif args.backend == "bvh8mxu":
            cfn, afn = mod.ray_intersect_bvh8mxu, mod.ray_test_bvh8mxu
        else:
            cfn, afn = mod.ray_intersect_preliminary, mod.ray_test
        if args.sort:
            # production arrangement: Morton/octant presort + unsort
            from mitsuba2_tpu.core.vec import Vec3
            from mitsuba2_tpu.scene import scene as scene_mod
            _c, _a = cfn, afn

            def vec(a):
                return Vec3(a[:, 0], a[:, 1], a[:, 2])

            if args.backend == "inst":
                closest = jax.jit(lambda sc, o, d:
                                  scene_mod._sorted_pallas_intersect(
                                      sc, vec(o), vec(d), jnp.inf))
                anyhit = jax.jit(lambda sc, o, d:
                                 scene_mod._sorted_pallas_ray_test(
                                     sc, vec(o), vec(d), 2.0))
            else:
                closest = jax.jit(lambda sc, o, d:
                                  scene_mod._sorted_pallas_intersect(
                                      sc, vec(o), vec(d), jnp.inf,
                                      intersect_fn=_c))
                anyhit = jax.jit(lambda sc, o, d:
                                 scene_mod._sorted_pallas_ray_test(
                                     sc, vec(o), vec(d), 2.0, test_fn=_a))
        else:
            closest = jax.jit(lambda sc, o, d: cfn(sc, o, d, jnp.inf))
            anyhit = jax.jit(lambda sc, o, d: afn(sc, o, d, 2.0))
        closest = functools.partial(closest, scene)
        anyhit = functools.partial(anyhit, scene)

        # per-round input variation: the tunneled axon runtime memoizes
        # repeated IDENTICAL dispatches (docs/TPU_TRAVERSAL.md), so each
        # timing round gets an epsilon-perturbed copy (precomputed and
        # device-resident — not part of the timed region)
        o_rounds = [jax.device_put(o + 1e-5 * (r + 1))
                    for r in range(args.rounds)]
        jax.block_until_ready(o_rounds)
        for name, fn in (("closest", closest), ("anyhit", anyhit)):
            t0 = time.perf_counter()
            out = fn(o, d)
            jax.block_until_ready(out)
            compile_s = time.perf_counter() - t0
            # MANDATORY timing hygiene on the tunneled axon runtime
            # (2026-08-19): until the process performs one device->host
            # FETCH, block_until_ready returns immediately (~0.1 ms) no
            # matter the queued work — bur-only timing in a fetch-free
            # process measures NOTHING. One fetch flips the stream to
            # synchronous; bur is honest afterwards.
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]
            t0 = time.perf_counter()
            for r in range(args.rounds):
                out = fn(o_rounds[r], d)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.rounds
            mrays = N / dt / 1e6
            key = f"{tag}_{name}"
            results[key] = round(mrays, 2)
            print(f"# {key}: {mrays:8.2f} Mrays/s  "
                  f"({dt*1e3:7.2f} ms, compile {compile_s:.1f}s)", flush=True)
        if args.backend == "jnp":
            t, p, u, v, steps = mod.ray_intersect_preliminary(
                scene, o, d, jnp.inf, with_steps=True)
            steps = np.asarray(steps).reshape(-1, min(N, mod.CHUNK))[:, 0]
            hits = float(np.isfinite(np.asarray(t)).mean())
            print(f"#   hit rate {hits:.3f}; chunk steps: "
                  f"min {steps.min()} mean {steps.mean():.0f} "
                  f"max {steps.max()}", flush=True)

    signal.alarm(0)
    print(json.dumps({"backend": args.backend, "n": N,
                      "prims": int(scene.n_prims), **results}))


if __name__ == "__main__":
    main()
