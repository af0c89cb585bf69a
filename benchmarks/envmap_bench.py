"""Envmap importance-sampling microbenchmark: CDF inversion vs alias.

Per-lane gathers run at ~0.15 G elem/s on this runtime (the measured
design wall, docs/TPU_TRAVERSAL.md): Marginal2D CDF inversion costs ~22
gathered elements/lane, the Vose alias path 3. This times both on an
envmap-sized table over a 262k-lane wavefront — the per-NEE-bounce cost
of an envmap-lit render.

    python benchmarks/envmap_bench.py [--n 262144] [--h 256] [--w 512]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--h", type=int, default=256)
    ap.add_argument("--w", type=int, default=512)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    __import__("mitsuba2_tpu.utils.jaxcache", fromlist=["x"]).configure(jax)
    import jax.numpy as jnp
    import numpy as np

    from mitsuba2_tpu.core import distr

    rng = np.random.default_rng(0)
    data = rng.random((args.h, args.w)) ** 3 + 1e-3
    u_rounds = [jnp.asarray(rng.random((args.n, 2)).astype(np.float32))
                for _ in range(args.rounds + 1)]

    results = {}
    for tag, alias in (("cdf", False), ("alias", True)):
        M = distr.Marginal2D.build(data, alias=alias)
        fn = jax.jit(lambda u, M=M: M.sample(u))
        out = jax.block_until_ready(fn(u_rounds[-1]))
        # timing hygiene: one fetch flips the deferred stream (TPU_TRAVERSAL)
        _ = np.asarray(out[1])[:1]
        times = []
        for r in range(args.rounds):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(u_rounds[r]))
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        results[tag] = dt
        print(f"# {tag:6s}: {dt*1e3:7.3f} ms  "
              f"({args.n/dt/1e6:7.1f} M samples/s)", flush=True)
    print(f"# speedup: {results['cdf']/results['alias']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
