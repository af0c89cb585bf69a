"""PCG32 bit-exactness tests.

The jnp implementation (uint32-pair emulation of the 64-bit LCG) is compared
against a pure-Python big-int reference implementing the canonical PCG32
(O'Neill; same algorithm as ext/enoki/include/enoki/random.h)."""
import numpy as np
import jax.numpy as jnp

from mitsuba2_tpu.core import pcg32

M64 = (1 << 64) - 1
PCG32_MULT = 0x5851F42D4C957F2D


class RefPCG32:
    def __init__(self, initstate, initseq):
        self.state = 0
        self.inc = ((initseq << 1) | 1) & M64
        self.step()
        self.state = (self.state + initstate) & M64
        self.step()

    def step(self):
        self.state = (self.state * PCG32_MULT + self.inc) & M64

    def next_uint32(self):
        old = self.state
        self.step()
        xorshifted = ((old >> 18) ^ old) >> 27 & 0xFFFFFFFF
        rot = old >> 59
        return ((xorshifted >> rot) | (xorshifted << ((-rot) & 31))) & 0xFFFFFFFF

    def advance(self, delta):
        delta &= M64
        cur_mult, cur_plus = PCG32_MULT, self.inc
        acc_mult, acc_plus = 1, 0
        while delta > 0:
            if delta & 1:
                acc_mult = (acc_mult * cur_mult) & M64
                acc_plus = (acc_plus * cur_mult + cur_plus) & M64
            cur_plus = ((cur_mult + 1) * cur_plus) & M64
            cur_mult = (cur_mult * cur_mult) & M64
            delta >>= 1
        self.state = (acc_mult * self.state + acc_plus) & M64


def split64(x):
    return np.uint32(x >> 32), np.uint32(x & 0xFFFFFFFF)


def test_sequence_matches_reference():
    initstates = [0x853C49E6748FEA9B, 42, 0, 0xDEADBEEFCAFEBABE]
    initseqs = [0xDA3E39CB94B95BDB, 54, 1, 0x0123456789ABCDEF]
    sh = np.array([split64(s)[0] for s in initstates])
    sl = np.array([split64(s)[1] for s in initstates])
    qh = np.array([split64(s)[0] for s in initseqs])
    ql = np.array([split64(s)[1] for s in initseqs])
    s = pcg32.seed(jnp.asarray(sh), jnp.asarray(sl), jnp.asarray(qh), jnp.asarray(ql))
    refs = [RefPCG32(a, b) for a, b in zip(initstates, initseqs)]
    for i in range(100):
        out, s = pcg32.next_uint32(s)
        expected = np.array([r.next_uint32() for r in refs], np.uint32)
        np.testing.assert_array_equal(np.asarray(out), expected)


def test_float32_range():
    s = pcg32.seed_lanes(7, jnp.arange(1024))
    for _ in range(8):
        f, s = pcg32.next_float32(s)
        f = np.asarray(f)
        assert (f >= 0).all() and (f < 1).all()


def test_lane_decorrelation():
    s = pcg32.seed_lanes(0, jnp.arange(4096))
    f, s = pcg32.next_float32(s)
    f = np.asarray(f)
    # Mean of U[0,1) over 4096 lanes
    assert abs(f.mean() - 0.5) < 0.02
    assert abs(np.corrcoef(f[:-1], f[1:])[0, 1]) < 0.05


def test_advance_matches_reference():
    ref = RefPCG32(12345, 678)
    sh, sl = split64(12345)
    qh, ql = split64(678)
    s = pcg32.seed(jnp.asarray([sh]), jnp.asarray([sl]),
                   jnp.asarray([qh]), jnp.asarray([ql]))
    ref.advance(1000)
    s2 = pcg32.advance(s, 1000)
    out, _ = pcg32.next_uint32(s2)
    assert int(np.asarray(out)[0]) == ref.next_uint32()


def test_tea_deterministic():
    a1, b1 = pcg32.sample_tea_32(jnp.uint32(1), jnp.arange(8, dtype=jnp.uint32))
    a2, b2 = pcg32.sample_tea_32(jnp.uint32(1), jnp.arange(8, dtype=jnp.uint32))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    # distinct lanes produce distinct hashes
    assert len(set(np.asarray(a1).tolist())) == 8
