"""Bit-exact PCG32 RNG + TEA hash on uint32 lane pairs.

TPU-native rebuild of Enoki's PCG32 (ext/enoki/include/enoki/random.h) and
mitsuba's `sample_tea_*` (include/mitsuba/core/random.h). JAX on TPU has no
native uint64, so the 64-bit LCG state is emulated as (hi, lo) uint32 pairs.
Bit-exactness matters: the radiative-backprop adjoint replays forward
sampling decisions from seeds alone (SURVEY.md §7.3 item 4).

All functions are elementwise over arbitrary-shape uint32 arrays and are
jit/vmap-safe.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

u32 = jnp.uint32

PCG32_DEFAULT_STATE_HI = 0x853C49E6
PCG32_DEFAULT_STATE_LO = 0x748FEA9B
PCG32_DEFAULT_STREAM_HI = 0xDA3E39CB
PCG32_DEFAULT_STREAM_LO = 0x94B95BDB
PCG32_MULT_HI = 0x5851F42D
PCG32_MULT_LO = 0x4C957F2D


def _c(x):
    return jnp.asarray(x, u32)


def mulhi32(a, b):
    """High 32 bits of the 32x32->64 product, using 16-bit partials."""
    a = a.astype(u32)
    b = b.astype(u32)
    a_lo = a & _c(0xFFFF)
    a_hi = a >> 16
    b_lo = b & _c(0xFFFF)
    b_hi = b >> 16
    lo = a_lo * b_lo
    m1 = a_hi * b_lo + (lo >> 16)
    m2 = a_lo * b_hi + (m1 & _c(0xFFFF))
    return a_hi * b_hi + (m1 >> 16) + (m2 >> 16)


def add64(ah, al, bh, bl):
    """(ah:al) + (bh:bl) mod 2^64 on uint32 pairs."""
    lo = al + bl
    carry = (lo < al).astype(u32)
    hi = ah + bh + carry
    return hi, lo


def mul64(ah, al, bh, bl):
    """(ah:al) * (bh:bl) mod 2^64 on uint32 pairs."""
    lo = al * bl
    hi = mulhi32(al, bl) + ah * bl + al * bh
    return hi, lo


class PCG32State(NamedTuple):
    """SoA PCG32 state: four uint32 arrays of identical shape."""
    state_hi: jnp.ndarray
    state_lo: jnp.ndarray
    inc_hi: jnp.ndarray
    inc_lo: jnp.ndarray


def _step(s: PCG32State) -> PCG32State:
    # state = state * PCG32_MULT + inc   (mod 2^64)
    h, l = mul64(s.state_hi, s.state_lo, _c(PCG32_MULT_HI), _c(PCG32_MULT_LO))
    h, l = add64(h, l, s.inc_hi, s.inc_lo)
    return PCG32State(h, l, s.inc_hi, s.inc_lo)


def _output(state_hi, state_lo):
    # xorshifted = uint32(((state >> 18) ^ state) >> 27)
    #   bits 18..49 of state, xored, then take bits 27..58 of the 64-bit value
    # (state >> 18): hi' = hi >> 18; lo' = (lo >> 18) | (hi << 14)
    x_hi = state_hi >> 18
    x_lo = (state_lo >> 18) | (state_hi << 14)
    x_hi = x_hi ^ state_hi
    x_lo = x_lo ^ state_lo
    # (x >> 27) truncated to 32 bits: (lo >> 27) | (hi << 5)
    xorshifted = (x_lo >> 27) | (x_hi << 5)
    rot = state_hi >> 27  # state >> 59
    # rotate right by rot
    return (xorshifted >> rot) | (xorshifted << ((_c(32) - rot) & _c(31)))


def seed(initstate_hi, initstate_lo, initseq_hi, initseq_lo) -> PCG32State:
    """PCG32::seed — all inputs uint32 arrays of the same shape."""
    initstate_hi = jnp.asarray(initstate_hi, u32)
    initstate_lo = jnp.asarray(initstate_lo, u32)
    initseq_hi = jnp.asarray(initseq_hi, u32)
    initseq_lo = jnp.asarray(initseq_lo, u32)
    # inc = (initseq << 1) | 1
    inc_hi = (initseq_hi << 1) | (initseq_lo >> 31)
    inc_lo = (initseq_lo << 1) | _c(1)
    zero = jnp.zeros_like(initstate_hi)
    s = PCG32State(zero, zero, inc_hi, inc_lo)
    s = _step(s)
    h, l = add64(s.state_hi, s.state_lo, initstate_hi, initstate_lo)
    s = PCG32State(h, l, inc_hi, inc_lo)
    return _step(s)


def next_uint32(s: PCG32State) -> Tuple[jnp.ndarray, PCG32State]:
    """Advance and return the NEXT uint32 (PCG32 outputs from the OLD state)."""
    out = _output(s.state_hi, s.state_lo)
    return out, _step(s)


def next_float32(s: PCG32State) -> Tuple[jnp.ndarray, PCG32State]:
    """Uniform float in [0, 1) with 23 random mantissa bits
    (PCG32::next_float32: (u >> 9) | 0x3f800000, bitcast, minus 1)."""
    bits, s = next_uint32(s)
    f = jax.lax.bitcast_convert_type((bits >> 9) | _c(0x3F800000), jnp.float32)
    return f - 1.0, s


def next_uint32_bounded(s: PCG32State, bound: int) -> Tuple[jnp.ndarray, PCG32State]:
    """Unbiased-enough bounded draw (single-round multiply-shift)."""
    bits, s = next_uint32(s)
    return mulhi32(bits, _c(bound)), s


def advance(s: PCG32State, delta: int) -> PCG32State:
    """PCG32::advance — jump ahead `delta` steps in O(log delta) (host int)."""
    cur_mult_h, cur_mult_l = _c(PCG32_MULT_HI), _c(PCG32_MULT_LO)
    cur_plus_h, cur_plus_l = s.inc_hi, s.inc_lo
    acc_mult_h, acc_mult_l = _c(0), _c(1)
    acc_plus_h, acc_plus_l = _c(0), _c(0)
    delta = int(delta) & ((1 << 64) - 1)
    while delta > 0:
        if delta & 1:
            acc_mult_h, acc_mult_l = mul64(acc_mult_h, acc_mult_l, cur_mult_h, cur_mult_l)
            ph, plo = mul64(acc_plus_h, acc_plus_l, cur_mult_h, cur_mult_l)
            acc_plus_h, acc_plus_l = add64(ph, plo, cur_plus_h, cur_plus_l)
        mp1_h, mp1_l = add64(cur_mult_h, cur_mult_l, _c(0), _c(1))
        ph, plo = mul64(cur_plus_h, cur_plus_l, mp1_h, mp1_l)
        cur_plus_h, cur_plus_l = ph, plo
        cur_mult_h, cur_mult_l = mul64(cur_mult_h, cur_mult_l, cur_mult_h, cur_mult_l)
        delta >>= 1
    sh, sl = mul64(s.state_hi, s.state_lo, acc_mult_h, acc_mult_l)
    sh, sl = add64(sh, sl, acc_plus_h, acc_plus_l)
    return PCG32State(sh, sl, s.inc_hi, s.inc_lo)


# ---------------------------------------------------------------------------
# TEA hash (include/mitsuba/core/random.h :: sample_tea_32/64)
# ---------------------------------------------------------------------------

def sample_tea_32(v0, v1, rounds: int = 4) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """TEA block cipher as a hash; returns the mixed (v0, v1) uint32 pair."""
    v0 = jnp.asarray(v0, u32)
    v1 = jnp.asarray(v1, u32)
    s = _c(0)
    for _ in range(rounds):
        s = s + _c(0x9E3779B9)
        v0 = v0 + (((v1 << 4) + _c(0xA341316C)) ^ (v1 + s) ^ ((v1 >> 5) + _c(0xC8013EA4)))
        v1 = v1 + (((v0 << 4) + _c(0xAD90777D)) ^ (v0 + s) ^ ((v0 >> 5) + _c(0x7E95761E)))
    return v0, v1


def sample_tea_64(v0, v1, rounds: int = 4) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """64-bit TEA hash as (hi, lo) uint32 pair (v1 is hi, v0 is lo after mix)."""
    a, b = sample_tea_32(v0, v1, rounds)
    return b, a  # (hi, lo)


def seed_lanes(base_seed: int, lane_idx: jnp.ndarray) -> PCG32State:
    """Decorrelated per-lane PCG32 streams.

    Mirrors mitsuba's independent sampler seeding (src/samplers/independent.cpp):
    per-lane initstate from a TEA hash of (base_seed, lane), per-lane initseq =
    lane index, guaranteeing distinct streams.
    """
    lane_idx = jnp.asarray(lane_idx, u32)
    h, l = sample_tea_64(_c(base_seed), lane_idx)
    return seed(h, l, jnp.zeros_like(lane_idx), lane_idx)
