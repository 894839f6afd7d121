"""Banded roll-doubling gather (ops/windowed.py) and the ME stages
built on it (enc/device_me.py): exactness vs direct-indexing oracles.

These are the parity gates for the round-5 ME rewrite - the gather
must reproduce vmapped-dynamic-slice window extraction bit-for-bit,
and the in-window phase interpolation of the sub-pel stage must equal
slicing the all-phase conv planes (ops/jax_kernels.mc_phase_conv).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from thor_tpu.ops.windowed import banded_windows
from thor_tpu.ops import jax_kernels as JK
from thor_tpu.enc import device_me as DM


def _np_windows(plane, oy, ox, w):
    HB, WB = oy.shape
    out = np.zeros((HB, WB, w, w), plane.dtype)
    for t in range(HB):
        for k in range(WB):
            out[t, k] = plane[oy[t, k]:oy[t, k] + w,
                              ox[t, k]:ox[t, k] + w]
    return out


@pytest.mark.parametrize("b,rr,M,HB,WB,pad", [
    (8, 2, 10, 5, 9, 32),
    (16, 2, 18, 3, 4, 48),
    (4, 1, 6, 2, 20, 16),   # WB*w wider than the block grid row
    (8, 2, 40, 4, 6, 48),   # production M_SEL-scale bound
])
def test_banded_windows_matches_direct(b, rr, M, HB, WB, pad):
    rng = np.random.default_rng(7 + b + M)
    H, W = HB * b, WB * b
    plane = rng.integers(0, 256, (H + 2 * pad, W + 2 * pad), np.uint8)
    w = b + 2 * rr
    mvy = rng.integers(-(M - rr), M - rr + 1, (HB, WB)).astype(np.int32)
    mvx = rng.integers(-(M - rr), M - rr + 1, (HB, WB)).astype(np.int32)
    ty = (np.arange(HB) * b)[:, None]
    tx = (np.arange(WB) * b)[None, :]
    oy = pad + ty + mvy - rr
    ox = pad + tx + mvx - rr
    got = np.asarray(banded_windows(
        jnp.asarray(plane), jnp.asarray(mvy - rr), jnp.asarray(mvx - rr),
        pad, pad, b, w, M))
    assert np.array_equal(got, _np_windows(plane, oy, ox, w))


@pytest.mark.parametrize("seq_bipred", [0, 1])
def test_subpel_inwindow_phases_match_conv(seq_bipred):
    """The sub-pel stage's in-window interpolation must equal slicing
    mc_phase_conv's planes for every phase and candidate offset."""
    rng = np.random.default_rng(11)
    b = 8
    HB, WB = 2, 3
    H, W = HB * b, WB * b
    PAD = DM.PAD
    refpad = rng.integers(0, 256, (H + 2 * PAD, W + 2 * PAD), np.uint8)
    lut = JK.build_luma_mc_lut(seq_bipred)
    phases = np.asarray(JK.mc_phase_conv(
        jnp.asarray(refpad)[None], jnp.asarray(lut), PAD))[0]

    mvy = rng.integers(-30, 31, (HB, WB)).astype(np.int32)
    mvx = rng.integers(-30, 31, (HB, WB)).astype(np.int32)
    ob = rng.integers(0, 256, (HB, WB, b, b)).astype(np.int32)
    py = np.zeros((HB, WB), np.int32)
    px = np.zeros((HB, WB), np.int32)
    qy, qx, qc = DM._subpel_step(
        jnp.asarray(ob), jnp.asarray(refpad), lut,
        jnp.asarray(mvy), jnp.asarray(mvx), b, jnp.float32(2.0),
        jnp.asarray(py), jnp.asarray(px))
    qy, qx, qc = np.asarray(qy), np.asarray(qx), np.asarray(qc)

    # oracle: slice the conv planes directly (round-4 semantics)
    ty = (np.arange(HB) * b)[:, None].repeat(WB, 1)
    tx = (np.arange(WB) * b)[None, :].repeat(HB, 0)
    lam = 2.0
    for t in range(HB):
        for k in range(WB):
            base_y = PAD - 2 + ty[t, k] + mvy[t, k] - 1
            base_x = PAD - 2 + tx[t, k] + mvx[t, k] - 1
            best, bqy, bqx = 1 << 30, 0, 0
            for cy in range(-3, 4):
                for cx in range(-3, 4):
                    p = (cy & 3) * 4 + (cx & 3)
                    oy = 1 + (cy >> 2)
                    ox = 1 + (cx >> 2)
                    wv = phases[p, base_y + oy:base_y + oy + b,
                                base_x + ox:base_x + ox + b].astype(
                        np.int64)
                    sad = np.abs(ob[t, k] - wv).sum()
                    rate = 0
                    for d in (4 * mvx[t, k] + cx, 4 * mvy[t, k] + cy):
                        cn = 2 * abs(int(d)) - (1 if d < 0 else 0)
                        rate += 1 + 2 * int(np.log2(cn + 1))
                    cost = int(sad) + int(np.float32(
                        np.float32(lam) * np.float32(rate)) + 0.5)
                    if cost < best:
                        best, bqy, bqx = cost, cy, cx
            assert qc[t, k] == best
            assert qy[t, k] == 4 * mvy[t, k] + bqy
            assert qx[t, k] == 4 * mvx[t, k] + bqx


def test_refine_step_matches_dynamic_slice():
    """_refine_step (banded) vs the round-4 vmapped-dynamic-slice
    formulation, including cost/tie-break parity."""
    from jax import lax
    import jax
    rng = np.random.default_rng(5)
    b, rr, M, HB, WB, pad = 8, 2, 10, 4, 5, 32
    H, W = HB * b, WB * b
    plane = rng.integers(0, 256, (H + 2 * pad, W + 2 * pad), np.uint8)
    ob = rng.integers(0, 256, (HB, WB, b, b)).astype(np.int32)
    mvy = rng.integers(-(M - rr), M - rr + 1, (HB, WB)).astype(np.int32)
    mvx = rng.integers(-(M - rr), M - rr + 1, (HB, WB)).astype(np.int32)
    lam = jnp.float32(3.25)
    ny, nx, nc = DM._refine_step(jnp.asarray(ob), jnp.asarray(plane),
                                 pad, jnp.asarray(mvy), jnp.asarray(mvx),
                                 b, rr, lam, 4, M)

    # round-4 oracle: per-block dynamic_slice windows + offset scan
    ty = (np.arange(HB) * b)[:, None].repeat(WB, 1).reshape(-1)
    tx = (np.arange(WB) * b)[None, :].repeat(HB, 0).reshape(-1)
    ys = pad + ty + mvy.reshape(-1) - rr
    xs = pad + tx + mvx.reshape(-1) - rr
    win = jax.vmap(lambda y, x: lax.dynamic_slice(
        jnp.asarray(plane), (y, x), (b + 2 * rr, b + 2 * rr)))(
        jnp.asarray(ys), jnp.asarray(xs)).astype(jnp.int32)
    obf = jnp.asarray(ob.reshape(-1, b, b))
    best = jnp.full((HB * WB,), 1 << 30, jnp.int32)
    bdy = jnp.zeros((HB * WB,), jnp.int32)
    bdx = jnp.zeros((HB * WB,), jnp.int32)
    for dy in range(2 * rr + 1):
        for dx in range(2 * rr + 1):
            wv = win[:, dy:dy + b, dx:dx + b]
            sad = jnp.abs(obf - wv).sum(axis=(1, 2))
            rate = DM._mv_bits(
                (jnp.asarray(mvx.reshape(-1)) + dx - rr) * 4,
                (jnp.asarray(mvy.reshape(-1)) + dy - rr) * 4)
            cost = sad + (lam * rate + 0.5).astype(jnp.int32)
            better = cost < best
            best = jnp.where(better, cost, best)
            bdy = jnp.where(better, dy, bdy)
            bdx = jnp.where(better, dx, bdx)
    assert np.array_equal(np.asarray(nc).reshape(-1), np.asarray(best))
    assert np.array_equal(np.asarray(ny).reshape(-1),
                          mvy.reshape(-1) + np.asarray(bdy) - rr)
    assert np.array_equal(np.asarray(nx).reshape(-1),
                          mvx.reshape(-1) + np.asarray(bdx) - rr)
