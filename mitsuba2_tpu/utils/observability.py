"""Render observability: structured per-pass metrics + progress reporting.

TPU-native rebuild of the reference's observability stack (SURVEY.md §5.5:
Logger/ProgressReporter in src/libcore/{logger,progress}.cpp and §5.1's
sampling profiler). Phases are exposed to XLA profilers via
jax.named_scope (integrators.py); this module adds the host side:

- `RenderMonitor`: per-pass JSONL metrics (wall time, Mrays/s, active-lane
  occupancy per bounce — the compaction-efficiency signal — and ETA) plus
  a stderr progress line, emitted on host 0 only.
- `render_instrumented`: a drop-in render() that reports through a monitor.

Use `jax.profiler.trace(logdir)` around a render for full XProf traces;
the named scopes label ray-gen / bounce-k / develop phases.
"""
from __future__ import annotations

import json
import sys
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import RenderConfig


class RenderMonitor:
    """ProgressReporter + JSONL metrics sink."""

    def __init__(self, total_passes: int, jsonl_path: Optional[str] = None,
                 stream=None, is_host0: bool = True):
        self.total = total_passes
        self.jsonl_path = jsonl_path
        self.stream = stream if stream is not None else sys.stderr
        self.is_host0 = is_host0
        self.t_start = time.perf_counter()
        self.records = []

    def update(self, pass_idx: int, wall_s: float, rays: int,
               occupancy=None, extra: dict = None):
        rec = {"pass": pass_idx, "wall_s": round(wall_s, 4),
               "mrays_s": round(rays / max(wall_s, 1e-9) / 1e6, 3)}
        if occupancy is not None:
            rec["occupancy"] = [round(float(o), 4) for o in occupancy]
        if extra:
            rec.update(extra)
        self.records.append(rec)
        if self.jsonl_path and self.is_host0:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if self.is_host0:
            done = pass_idx + 1
            elapsed = time.perf_counter() - self.t_start
            eta = elapsed / done * (self.total - done)
            self.stream.write(
                f"\rrender {done}/{self.total} passes "
                f"[{rec['mrays_s']:.1f} Mrays/s, eta {eta:.1f}s] ")
            if done == self.total:
                self.stream.write("\n")
            self.stream.flush()


@partial(jax.jit, static_argnames=("config",))
def _pass_with_stats(scene, config, seed):
    """One render pass that also reports active-lane occupancy per bounce
    (re-traces the bounce actives cheaply from the same seeds)."""
    from ..render import film as film_mod, sensors
    from ..render import integrators as integ
    from ..core import spectrum as sp
    from ..render.sampler import Sampler
    from ..scene import scene as scene_mod

    H, W = config.height, config.width
    sppc = config.spp_per_pass
    n = sppc * H * W
    lane = jnp.arange(n, dtype=jnp.uint32)
    sampler = Sampler.seed(seed, lane_idx=lane)
    pix = jnp.arange(n, dtype=jnp.int32) % (H * W)
    x = (pix % W).astype(jnp.float32)
    y = (pix // W).astype(jnp.float32)
    jitter, sampler = sampler.next_2d()
    uv = sensors.film_uv(x, y, jitter, W, H)
    with jax.named_scope("ray_gen"):
        ray = sensors.sample_ray(scene, uv, None, None)

    from ..core.spec import Spec
    si = scene_mod.ray_intersect(scene, ray)
    active = si.valid
    throughput = Spec.ones((n,), config.n_channels)
    result = Spec.zeros((n,), config.n_channels)
    from ..render import emitters
    if not config.hide_emitters:
        result = result + emitters.eval_hit(scene, si, config)
        result = result + emitters.eval_env(scene, ray.d, ray.wavelengths,
                                            config).masked(~si.valid)
    occupancy = [jnp.mean(active.astype(jnp.float32))]
    orig = jnp.arange(n, dtype=jnp.int32)
    carry = (si.replace(tex=None), active, throughput, result, sampler, orig)
    for depth in range(1, config.max_depth):
        with jax.named_scope(f"bounce_{depth}"):
            carry = integ._path_bounce(scene, config, depth, carry)
        occupancy.append(jnp.mean(carry[1].astype(jnp.float32)))
    result = carry[3]

    with jax.named_scope("develop"):
        image = jnp.zeros((H, W, config.n_image_channels), jnp.float32)
        wsum = jnp.zeros((H, W) if config.rfilter != "box" else (), jnp.float32)
        image, wsum = film_mod.accumulate_pass(image, wsum, result, jitter,
                                               config)
    return image, wsum, jnp.stack(occupancy)


def render_instrumented(scene, config: RenderConfig, seed: int = None,
                        jsonl_path: Optional[str] = None,
                        monitor: Optional[RenderMonitor] = None,
                        cancel=None):
    """render() with per-pass metrics. Returns (image, monitor).

    `cancel`: optional zero-arg callable (or threading.Event) checked
    between passes — Integrator::cancel parity (integrator.cpp): a SIGINT
    handler or GUI sets it and the render returns the passes accumulated
    so far (develop-able partial image, like Film::develop mid-render)."""
    from ..render import film as film_mod
    if seed is None:
        seed = config.seed
    sppc = min(config.spp_per_pass, config.spp)
    config = config.replace(spp_per_pass=sppc)
    n_passes = (config.spp + sppc - 1) // sppc
    if monitor is None:
        monitor = RenderMonitor(n_passes, jsonl_path=jsonl_path)
    lanes = sppc * config.width * config.height
    rays = lanes * (1 + 2 * (config.max_depth - 1))

    image = wsum = None
    for p in range(n_passes):
        if cancel is not None:
            stop = cancel.is_set() if hasattr(cancel, "is_set") else cancel()
            if stop:
                monitor.cancelled = True
                break
        t0 = time.perf_counter()
        img_p, w_p, occ = _pass_with_stats(
            scene, config, jnp.uint32((seed * 0x9E3779B1 + p) & 0xFFFFFFFF))
        jax.block_until_ready(img_p)
        monitor.update(p, time.perf_counter() - t0, rays,
                       occupancy=list(jax.device_get(occ)))
        image = img_p if image is None else image + img_p
        wsum = w_p if wsum is None else wsum + w_p
    if image is None:
        raise RuntimeError("render cancelled before the first pass")
    return film_mod.develop(image, wsum), monitor
