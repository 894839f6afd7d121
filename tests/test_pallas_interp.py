"""Pallas temporal-interpolation kernels (ops/pallas_interp.py) vs
the XLA device pyramid (ops/device_interp.py - itself bit-exact vs the
host C twin): per-level ME maps and the synthesized frame must match
bit-for-bit (interpret mode on small frames; hardware parity is
covered by the RA16 decode bit-exactness on TPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from thor_tpu.ops import device_interp as DI
from thor_tpu.ops import pallas_interp as PI


class _Ref:
    def __init__(self, y, u, v):
        self.y, self.u, self.v = y, u, v


def _mk_refs(rng, w, h, shift):
    """Two correlated padded frames (ref1 = shifted ref0 + noise)."""
    base = rng.integers(0, 256, (h + 64, w + 64), np.uint8)
    y0 = base[32:32 + h, 32:32 + w]
    y1 = base[32 + shift[0]:32 + shift[0] + h,
              32 + shift[1]:32 + shift[1] + w].copy()
    n = rng.integers(-4, 5, y1.shape)
    y1 = np.clip(y1.astype(np.int32) + n, 0, 255).astype(np.uint8)

    def mk(y):
        u = y[::2, ::2].copy()
        v = 255 - u
        return _Ref(np.pad(y, 96, mode="edge"),
                    np.pad(u, 48, mode="edge"),
                    np.pad(v, 48, mode="edge"))
    return mk(y0), mk(y1)


@pytest.mark.parametrize("guided", [False, True])
def test_me_level_parity(guided):
    rng = np.random.default_rng(4 + guided)
    w, h, pad = 64, 48, 32
    bw = 2 * ((w + DI.BLOCK_STEP - 1) // DI.BLOCK_STEP)
    bh = 2 * ((h + DI.BLOCK_STEP - 1) // DI.BLOCK_STEP)
    p0 = rng.integers(0, 256, (h + 2 * pad, w + 2 * pad), np.uint8)
    p1 = rng.integers(0, 256, (h + 2 * pad, w + 2 * pad), np.uint8)
    # correlate them so skip/search paths both trigger
    p1[pad:pad + h, pad:pad + w] = np.clip(
        p0[pad - 1:pad - 1 + h, pad + 1:pad + 1 + w].astype(np.int32)
        + rng.integers(-3, 4, (h, w)), 0, 255).astype(np.uint8)
    g = (rng.integers(-6, 7, (bh * bw, 2)) * 8).astype(np.int32) \
        if guided else np.zeros((bh * bw, 2), np.int32)
    wt0, wt1 = 3, 1

    fn = DI._me_level_fn(w, h, pad, guided)
    mv0_w, mv1_w, bg_w, _, _ = fn(jnp.asarray(p0), jnp.asarray(p1),
                                  jnp.asarray(g), jnp.int32(wt0),
                                  jnp.int32(wt1))
    o0x, o0y, o1x, o1y, bg = PI.me_level_pallas(
        jnp.asarray(p0), jnp.asarray(p1),
        jnp.asarray(g[:, 0].reshape(bh, bw)),
        jnp.asarray(g[:, 1].reshape(bh, bw)),
        jnp.asarray([wt0, wt1], jnp.int32),
        w=w, h=h, pad=pad, bw=bw, bh=bh, guided=guided,
        interpret=True)
    got1 = np.stack([np.asarray(o1x), np.asarray(o1y)], -1)
    got0 = np.stack([np.asarray(o0x), np.asarray(o0y)], -1)
    assert np.array_equal(got1, np.asarray(mv1_w).reshape(bh, bw, 2))
    assert np.array_equal(got0, np.asarray(mv0_w).reshape(bh, bw, 2))


def test_full_pyramid_parity():
    rng = np.random.default_rng(9)
    w, h = 64, 64
    r0, r1 = _mk_refs(rng, w, h, (1, 2))
    want = DI.interpolate_frames_device(r0, r1, 2, 1)
    got = PI.interpolate_frames_pallas(r0, r1, 2, 1, interpret=True)
    for i, name in enumerate(("y", "u", "v")):
        assert np.array_equal(np.asarray(got[i]), np.asarray(want[i])), \
            name


def test_full_pyramid_parity_asymmetric():
    rng = np.random.default_rng(13)
    w, h = 96, 64
    r0, r1 = _mk_refs(rng, w, h, (2, 0))
    want = DI.interpolate_frames_device(r0, r1, 4, 3)   # reversed path
    got = PI.interpolate_frames_pallas(r0, r1, 4, 3, interpret=True)
    for i in range(3):
        assert np.array_equal(np.asarray(got[i]), np.asarray(want[i]))
