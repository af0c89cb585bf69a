"""Benchmark: Mrays/s on the BVH-bound mesh gallery + Cornell box + Veach.

Prints one JSON line per metric:
  {"metric", "value", "unit", "vs_baseline", "bench_version"}
and, when a metric could not be measured, a structured skip marker
  {"metric", "value": null, ..., "skipped": "<reason>"}
so the driver artifact distinguishes "chip dead" / "phase failed" from
"no data" (VERDICT r03 weak #1).

Runs on whatever accelerator jax exposes (the driver runs it on one TPU
chip). Rays counted: primary + per-bounce (shadow + bounce) wavefront rays,
i.e. lanes * (1 + 2*(max_depth-1)) per pass — every lane pays lockstep
traversal cost, so this is the honest per-chip work metric. Compilation is
excluded (warmup passes).

Protocol (uniform across metrics, BASELINE.md): 2 warmups (the tunneled
runtime's first post-compile dispatches are erratically slow), then the
MEDIAN of 5 single-run timings, each with a DIFFERENT seed so no two
dispatches are identical (the tunneled runtime memoizes identical
dispatches — docs/TPU_TRAVERSAL.md). One warmup output is FETCHED to host
before timing — without it the tunneled runtime defers work and
block_until_ready returns immediately ("Timing hygiene",
docs/TPU_TRAVERSAL.md).

bench_version history (the `bench_version` field in every line — VERDICT
r03 weak #2: the JSON must record protocol breaks):
  1  (r01/r02) mean-of-2 resp. median-of-5, NO fetch-first — Cornell
     numbers partially deferred-mode-inflated (488 reported, ~366 honest).
  2  (r03)     fetch-first median-of-5 — never captured (chip wedge).
  3  (r04+)    fetch-first median-of-5 + chip-health preflight/retry +
     structured skip markers + accel-metrics-first ordering + Veach
     spectral metric. Values are protocol-comparable with v2, and with
     v1 ONLY for the gallery metrics (measured post-fetch in v1 too).

Resilience: a subprocess chip-health probe (with backoff retries) runs
BEFORE the main process touches the device; if the chip never answers,
every metric emits a `chip_wedged` skip marker and the process exits 0 so
the driver still gets a parseable artifact. During the run, a per-metric
SIGALRM watchdog raises; one watchdog hit is treated as a wedged chip
(1200 s is far beyond any legitimate compile) and all remaining metrics
emit markers instead of hanging the driver.

MI_BENCH_BACKEND=<auto|pallas|bvh8|bvh8mxu|...> forces the intersection
backend (hardware sweeps); MI_MXU_LEAVES/MI_MXU_BLOCK/MI_CLUSTER_K knobs
pass through to the kernels.
"""
import json
import os
import signal
import subprocess
import sys
import time

BENCH_VERSION = 3

# First honestly-attested value per metric (BENCH_r02 gallery row — the
# only protocol-comparable prior capture; Cornell v1 numbers were
# deferred-mode-inflated and are NOT baselines). vs_baseline = value/this.
ATTESTED_BASELINES = {
    "mesh_gallery_fwd_mrays_per_s": 2.249,   # BENCH_r02.json
}

METRICS = [
    "mesh_gallery_fwd_mrays_per_s",
    "mesh_gallery_fwd_adjoint_mrays_per_s",
    "mesh_gallery_491k_fwd_mrays_per_s",
    "veach_spectral_fwd_mrays_per_s",
    "cornell_box_fwd_mrays_per_s",
    "cornell_box_fwd_adjoint_mrays_per_s",
    "cornell_reparam_mrays_per_s",
]


class _Wedged(Exception):
    """SIGALRM fired mid-metric: the backend is presumed dead."""


_REMAINING = list(METRICS)


def _emit(metric, value, unit="Mrays/s", skipped=None):
    if metric in _REMAINING:
        _REMAINING.remove(metric)
    base = ATTESTED_BASELINES.get(metric)
    line = {
        "metric": metric,
        "value": None if value is None else round(value, 3),
        "unit": unit,
        "vs_baseline": (None if value is None else
                        round(value / base, 3) if base else 1.0),
        "bench_version": BENCH_VERSION,
    }
    if skipped:
        line["skipped"] = skipped
    print(json.dumps(line), flush=True)


def _emit_remaining_skipped(reason):
    for m in list(_REMAINING):
        _emit(m, None, skipped=reason)


def _hard_exit(sig, frame):  # pragma: no cover - last-resort path
    # The _Wedged raise never propagated (blocked in a C call that Python
    # signal delivery can't interrupt). Emit markers and die clean.
    _emit_remaining_skipped("chip_wedged")
    os._exit(0)


def _watchdog(sig, frame):
    # Give the raise 120 s to propagate to the per-metric handler; if it
    # can't (stuck in C), the second alarm hard-exits with markers.
    signal.signal(signal.SIGALRM, _hard_exit)
    signal.alarm(120)
    raise _Wedged()


def _arm(seconds=1200):
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(seconds)


def _chip_preflight():
    """Probe the chip in a SUBPROCESS (so a wedge can't kill this process's
    device state) with backoff retries. Returns True if healthy."""
    probe = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "benchmarks", "chip_health.py")
    if not os.path.exists(probe):
        return True  # nothing to probe with; proceed optimistically
    for attempt, backoff in enumerate((0, 90, 240)):
        if backoff:
            print(f"bench.py preflight: retrying in {backoff}s "
                  f"(attempt {attempt + 1}/3)", file=sys.stderr, flush=True)
            time.sleep(backoff)
        try:
            r = subprocess.run([sys.executable, probe], timeout=300,
                               capture_output=True, text=True)
            if r.returncode == 0 and "CHIP-OK" in r.stdout:
                print(f"bench.py preflight: {r.stdout.strip().splitlines()[-1]}",
                      file=sys.stderr, flush=True)
                return True
            print(f"bench.py preflight attempt {attempt + 1}: rc={r.returncode} "
                  f"{(r.stderr or '')[-200:]}", file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"bench.py preflight attempt {attempt + 1}: probe hung 300s",
                  file=sys.stderr, flush=True)
    return False


def _median_time(jax, run, warmups=2, reps=5):
    """2 seed-varied warmups (first output fetched to host — flips the
    tunneled stream to synchronous) then the median of `reps` seed-varied
    runs."""
    import numpy as _np
    for r in range(warmups):
        out = run(r)
        jax.block_until_ready(out)
        if r == 0:
            _ = _np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(warmups + r))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def _rays_per_pass(cfg):
    lanes = cfg.width * cfg.height * cfg.spp_per_pass
    return lanes * (1 + 2 * (cfg.max_depth - 1))


def main():
    if not _chip_preflight():
        print("bench.py: chip never answered preflight — emitting skip "
              "markers for every metric", file=sys.stderr, flush=True)
        _emit_remaining_skipped("chip_wedged")
        return

    _arm(1200)
    import jax
    import jax.numpy as jnp

    import mitsuba2_tpu as mi
    from mitsuba2_tpu.diff.adjoint import render_l2_grad
    from mitsuba2_tpu.render.integrators import _render_all_passes_jit
    from mitsuba2_tpu.scene.presets import cornell_box, mesh_gallery, veach_mis

    from mitsuba2_tpu.utils import jaxcache
    jaxcache.configure(jax)

    forced = os.environ.get("MI_BENCH_BACKEND", "")
    if forced:
        from mitsuba2_tpu.scene import scene as scene_mod
        scene_mod.set_backend(forced)
    # MI_BENCH_SMOKE=1: tiny shapes, logic-only CI pass (numbers meaningless)
    smoke = os.environ.get("MI_BENCH_SMOKE", "") == "1"
    R, SPP = (32, 4) if smoke else (256, 64)

    # Accel-bound metrics FIRST (VERDICT r03 weak #1: the contested numbers
    # must emit before anything else can wedge the process).

    # ---- 1) Mesh gallery (~31k tris), forward: the BVH-bound path ---------
    # forward runs ONE 16-spp pass (1.05M-lane wavefront): bigger sorted
    # wavefronts are more block-coherent, measured +5% over 4x4-spp
    # chunking (2026-08-20 A/B; same spp, same counted rays). The adjoint
    # metric keeps 4-spp passes (pass-level adjoint memory).
    gallery = None
    gcfg = mi.RenderConfig(width=R, height=R, spp=4 if smoke else SPP // 4,
                           spp_per_pass=4,
                           max_depth=3, rr_depth=8)
    g_passes = gcfg.spp // gcfg.spp_per_pass
    try:
        gallery = mesh_gallery(subdiv=4)
        fcfg = gcfg.replace(spp_per_pass=gcfg.spp)
        dt = _median_time(jax, lambda r: _render_all_passes_jit(
            gallery, fcfg, r, 1))
        _emit("mesh_gallery_fwd_mrays_per_s",
              _rays_per_pass(fcfg) / dt / 1e6)
    except _Wedged:
        signal.alarm(0)
        _emit_remaining_skipped("chip_wedged")
        return
    except Exception as e:  # pragma: no cover - defensive for the driver
        _emit("mesh_gallery_fwd_mrays_per_s", None, skipped=repr(e)[:120])

    # ---- 2) Mesh gallery, forward + adjoint (BVH-bound adjoint) -----------
    _arm(1200)
    try:
        gtarget = jnp.zeros((gcfg.height, gcfg.width, 3), jnp.float32)
        dt = _median_time(jax, lambda r: render_l2_grad(
            gallery, gcfg, gtarget, seed=r))
        # forward pass + adjoint re-trace both traverse the full wavefront
        _emit("mesh_gallery_fwd_adjoint_mrays_per_s",
              2 * _rays_per_pass(gcfg) * g_passes / dt / 1e6)
    except _Wedged:
        signal.alarm(0)
        _emit_remaining_skipped("chip_wedged")
        return
    except Exception as e:  # pragma: no cover
        _emit("mesh_gallery_fwd_adjoint_mrays_per_s", None,
              skipped=repr(e)[:120])

    # ---- 3) ~491k-tri gallery (subdiv=6): the scale proof -----------------
    _arm(1200)
    try:
        big = mesh_gallery(subdiv=3 if smoke else 6)
        bcfg = mi.RenderConfig(width=R, height=R, spp=4, spp_per_pass=4,
                               max_depth=3, rr_depth=8)
        dt = _median_time(jax, lambda r: _render_all_passes_jit(
            big, bcfg, r, 1))
        _emit("mesh_gallery_491k_fwd_mrays_per_s",
              _rays_per_pass(bcfg) / dt / 1e6)
        del big
    except _Wedged:
        signal.alarm(0)
        _emit_remaining_skipped("chip_wedged")
        return
    except Exception as e:  # pragma: no cover
        _emit("mesh_gallery_491k_fwd_mrays_per_s", None,
              skipped=repr(e)[:120])

    # ---- 4) Veach-MIS spectral (config 3): hero wavelengths + envmap ------
    _arm(1200)
    try:
        veach = veach_mis(envmap=True)
        vcfg = mi.RenderConfig(width=R, height=R, spp=4 if smoke else 16,
                               spp_per_pass=4, max_depth=3, rr_depth=8,
                               color_mode="spectral")
        v_passes = vcfg.spp // vcfg.spp_per_pass
        dt = _median_time(jax, lambda r: _render_all_passes_jit(
            veach, vcfg, r, v_passes))
        _emit("veach_spectral_fwd_mrays_per_s",
              _rays_per_pass(vcfg) * v_passes / dt / 1e6)
    except _Wedged:
        signal.alarm(0)
        _emit_remaining_skipped("chip_wedged")
        return
    except Exception as e:  # pragma: no cover
        _emit("veach_spectral_fwd_mrays_per_s", None, skipped=repr(e)[:120])

    # ---- 5) Cornell box, forward ------------------------------------------
    _arm(1200)
    scene = cornell_box()
    config = mi.RenderConfig(width=R, height=R, spp=SPP,
                             spp_per_pass=SPP // 4,
                             max_depth=4, rr_depth=8)
    n_passes = config.spp // config.spp_per_pass
    try:
        dt = _median_time(jax, lambda r: _render_all_passes_jit(
            scene, config, r, n_passes))
        _emit("cornell_box_fwd_mrays_per_s",
              _rays_per_pass(config) * n_passes / dt / 1e6)
    except _Wedged:
        signal.alarm(0)
        _emit_remaining_skipped("chip_wedged")
        return
    except Exception as e:  # pragma: no cover
        _emit("cornell_box_fwd_mrays_per_s", None, skipped=repr(e)[:120])

    # ---- 6) Cornell box, forward + adjoint --------------------------------
    _arm(1200)
    try:
        target = jnp.zeros((config.height, config.width, 3), jnp.float32)
        dt = _median_time(jax, lambda r: render_l2_grad(
            scene, config, target, seed=r))
        _emit("cornell_box_fwd_adjoint_mrays_per_s",
              2 * _rays_per_pass(config) * n_passes / dt / 1e6)
    except _Wedged:
        signal.alarm(0)
        _emit_remaining_skipped("chip_wedged")
        return
    except Exception as e:  # pragma: no cover
        _emit("cornell_box_fwd_adjoint_mrays_per_s", None,
              skipped=repr(e)[:120])

    # ---- 7) Cornell box, reparameterized forward (config 5's transport) ---
    _arm(1200)
    try:
        rcfg = config.replace(reparam=True, spp=4 if smoke else 16,
                              spp_per_pass=4)
        r_passes = rcfg.spp // rcfg.spp_per_pass
        dt = _median_time(jax, lambda r: _render_all_passes_jit(
            scene, rcfg, r, r_passes))
        _emit("cornell_reparam_mrays_per_s",
              _rays_per_pass(rcfg) * r_passes / dt / 1e6)
    except _Wedged:
        signal.alarm(0)
        _emit_remaining_skipped("chip_wedged")
        return
    except Exception as e:  # pragma: no cover
        _emit("cornell_reparam_mrays_per_s", None, skipped=repr(e)[:120])

    signal.alarm(0)


if __name__ == "__main__":
    main()
