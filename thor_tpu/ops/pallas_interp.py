"""Pallas TPU kernels for temporal frame interpolation.

The device pyramid of round 4 (ops/device_interp.py) is bit-exact but
ran the per-level bidirectional ME as a ~10.8K-step XLA lax.scan
(~0.44 ms/step at 1080p - per-step dispatch plus whole-frame flat
gathers for every SAD window), ~4.8 s/frame; it shipped disabled. The
same disease in the decoder's intra scan was cured by running the
WHOLE sequential pass inside one Pallas kernel (ops/pallas_intra.py);
this module applies that design to the interpolation pyramid:

- kernel A (me_level): one pyramid level's motion_estimate_bi
  (common/temporal_interp.c:852-918) plus the merge smoothing pass
  (:901-911), with both padded pictures and the MV maps VMEM-resident.
  Blocks advance strictly in raster order inside the kernel, so the
  skip/candidate neighbour dependencies are honored by construction;
  every SAD window is an aligned VMEM read + two rolls + a pair of
  one-hot resample matmuls that reproduce the C's per-pixel coordinate
  clip (sad_cost's clipped branch, :443-523) exactly.
- kernel B (mot_comp): interpolate_frame + mot_comp_avg (:920-970,
  :387-441) - a per-cell loop writing the averaged bi-prediction into
  the VMEM output plane.

Bit-exactness vs ops/device_interp.py (itself bit-exact vs the host C
twin and the numpy oracle) is covered by tests/test_pallas_interp.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .device_interp import (BLOCK_STEP, COST_MAX, LAMBDA, LAMBDA_SHIFT,
                            SKIP_THRESHOLD, ACC_BITS, ACC_ROUND)

_BIG = COST_MAX


def _round_up(x, m):
    return -(-x // m) * m


def _rot(v, sh, axis):
    return pltpu.roll(v, v.shape[axis] - sh, axis=axis)


def _scale_val(v, numer, denom):
    """Exact _scale_val (round half away from zero) on i32 scalars."""
    prod = v * numer
    mag = (jnp.abs(prod) + denom // 2) // denom
    return jnp.where(prod >= 0, mag, -mag)



def _mget(ref, y, x):
    """Scalar read from an i32 VMEM map via a row load + lane rotate
    (Mosaic has no scalar VMEM loads/stores)."""
    row = ref[pl.ds(y, 1), :].astype(jnp.int32)
    return _rot(row, x, 1)[0, 0]


def _mset(ref, y, x0, n, val):
    """Set lanes [x0, x0+n) of map row y to the scalar val (masked
    row read-modify-write)."""
    lane = lax.broadcasted_iota(jnp.int32, (1, ref.shape[1]), 1)
    old = ref[pl.ds(y, 1), :]
    m = (lane >= x0) & (lane < x0 + n)
    ref[pl.ds(y, 1), :] = jnp.where(m, val, old)


def _win_clip(P, ys, xs, size: int, pad: int, h: int, w: int,
              base: int):
    """[size, size] i32 window at frame coords (ys, xs) with the C's
    per-pixel clip to [-pad, dim + pad - 1].

    P: plane ref with frame pixel (0,0) at (base, base) and physical
    rows/cols covering [-pad, dim + pad + margins).
    """
    hP, wP = h + pad, w + pad
    oy = jnp.clip(ys, -pad, hP - size)
    ox = jnp.clip(xs, -pad, wP - size)
    iy = oy + base
    ix = ox + base
    WH = _round_up(size + 8, 8)
    ry8 = pl.multiple_of((iy >> 3) << 3, 8)
    rx128 = pl.multiple_of((ix >> 7) << 7, 128)
    win = P[pl.ds(ry8, WH), pl.ds(rx128, 256)].astype(jnp.int32)
    win = _rot(win, iy - ry8, 0)
    win = _rot(win, ix - rx128, 1)
    win = win[0:size, 0:size]
    # per-pixel clip resample: row i of the result is row
    # clip(ys+i, -pad, hP-1) - oy of the fetched window (same for cols)
    ii = lax.broadcasted_iota(jnp.int32, (size, size), 0)
    jj = lax.broadcasted_iota(jnp.int32, (size, size), 1)
    rv = jnp.clip(ys + ii[:, 0:1], -pad, hP - 1) - oy     # [size, 1]
    cv = jnp.clip(xs + jj[0:1, :], -pad, wP - 1) - ox     # [1, size]
    R = (jj == rv).astype(jnp.float32)                    # [size, size]
    Ct = (ii == cv).astype(jnp.float32)                   # [size, size]
    mid = lax.dot_general(R, win.astype(jnp.float32),
                          (((1,), (0,)), ((), ())))
    out = lax.dot_general(mid, Ct, (((1,), (0,)), ((), ())))
    return out.astype(jnp.int32)


def _me_level_kernel(gx_ref, gy_ref, wt_ref, p0_ref, p1_ref,
                     o0x_ref, o0y_ref, o1x_ref, o1y_ref, obg_ref,
                     m0x, m0y, m1x, m1y, bgm,
                     *, w, h, pad, bw, bh, bwA, guided, base):
    wt0 = wt_ref[0]
    wt1 = wt_ref[1]
    bs = BLOCK_STEP // 2
    bbs = BLOCK_STEP
    step = 2
    BW = bw // step
    BH = bh // step
    lam = LAMBDA // 4 if guided else LAMBDA
    n_ref_iters = 2 if guided else 16
    shift0 = ACC_BITS if guided else 3 + ACC_BITS
    thr = SKIP_THRESHOLD * 8 * 8
    hP, wP = h + pad, w + pad

    def sad_pair(xstart, ystart, a0x, a0y, a1x, a1y, size):
        xs0 = xstart + ((a0x + ACC_ROUND) >> ACC_BITS)
        xs1 = xstart + ((a1x + ACC_ROUND) >> ACC_BITS)
        ys0 = ystart + ((a0y + ACC_ROUND) >> ACC_BITS)
        ys1 = ystart + ((a1y + ACC_ROUND) >> ACC_BITS)
        a = _win_clip(p0_ref, ys0, xs0, size, pad, h, w, base)
        b = _win_clip(p1_ref, ys1, xs1, size, pad, h, w, base)
        return jnp.sum(jnp.abs(a - b))

    def body(t, _):
        yp = (t // BW) * step
        xp = (t % BW) * step
        xstart = xp * bs
        ystart = yp * bs

        up_ok = yp > 0
        upr_ok = up_ok & (xp < bw - step)
        left_ok = xp > 0

        def mv1_at(y, x):
            yc = jnp.clip(y, 0, bh - 1)
            xc = jnp.clip(x, 0, bw - 1)
            return _mget(m1x, yc, xc), _mget(m1y, yc, xc)

        nux, nuy = mv1_at(yp - step, xp)            # up
        nrx, nry = mv1_at(yp - step, xp + step)     # up-right
        nlx, nly = mv1_at(yp, xp - step)            # left
        nDx, nDy = mv1_at(yp - step, xp - step)     # up-left (rate)

        # --- make_skip_vector: |.|-distance medoid (order: up-right,
        # left, up; ties keep the LAST <=) --------------------------
        cxs = (nrx, nlx, nux)
        cys = (nry, nly, nuy)
        cvs = (upr_ok, left_ok, up_ok)
        best_c = jnp.int32(_BIG)
        skx = jnp.int32(0)
        sky = jnp.int32(0)
        any_v = jnp.bool_(False)
        dists = []
        for j in range(3):
            d = jnp.int32(0)
            for i in range(3):
                d = d + jnp.where(
                    cvs[i],
                    jnp.abs(cxs[j] - cxs[i]) + jnp.abs(cys[j] - cys[i]),
                    0)
            dists.append(d)
        for j in range(3):
            take = cvs[j] & (dists[j] <= best_c)
            best_c = jnp.where(take, dists[j], best_c)
            skx = jnp.where(take, cxs[j], skx)
            sky = jnp.where(take, cys[j], sky)
            any_v = any_v | cvs[j]
        skx = jnp.where(any_v, skx, 0)
        sky = jnp.where(any_v, sky, 0)
        ssx = _scale_val(skx, -wt1, wt0)
        ssy = _scale_val(sky, -wt1, wt0)

        # --- skip test: the four 8x8 sub-SADs come from ONE 16x16
        # window pair (the sub-blocks tile the block) ----------------
        sk = jnp.bool_(True)
        xs0f = xstart + ((ssx + ACC_ROUND) >> ACC_BITS)
        xs1f = xstart + ((skx + ACC_ROUND) >> ACC_BITS)
        ys0f = ystart + ((ssy + ACC_ROUND) >> ACC_BITS)
        ys1f = ystart + ((sky + ACC_ROUND) >> ACC_BITS)
        af = _win_clip(p0_ref, ys0f, xs0f, 16, pad, h, w, base)
        bf = _win_clip(p1_ref, ys1f, xs1f, 16, pad, h, w, base)
        adf = jnp.abs(af - bf)
        for dy in (0, 8):
            for dx in (0, 8):
                inb = ((xs0f + dx >= -pad) & (xs0f + dx + 8 <= wP)
                       & (ys0f + dy >= -pad) & (ys0f + dy + 8 <= hP)
                       & (xs1f + dx >= -pad) & (xs1f + dx + 8 <= wP)
                       & (ys1f + dy >= -pad) & (ys1f + dy + 8 <= hP))
                s8 = jnp.sum(adf[dy:dy + 8, dx:dx + 8])
                sk = sk & inb & (s8 <= thr)

        # --- candidate list (zero, [guide], up-right, left, up) ----
        cand = [(jnp.int32(0), jnp.int32(0), jnp.bool_(True))]
        if guided:
            cand.append((_mget(gx_ref, yp, xp), _mget(gy_ref, yp, xp),
                         jnp.bool_(True)))
        cand.append((nrx, nry, upr_ok))
        cand.append((nlx, nly, left_ok))
        cand.append((nux, nuy, up_ok))
        K = len(cand)
        # insertion dedup
        cv = []
        for j in range(K):
            dup = jnp.bool_(False)
            for i in range(j):
                dup = dup | ((cand[j][0] == cand[i][0])
                             & (cand[j][1] == cand[i][1]) & cv[i])
            cv.append(cand[j][2] & ~dup)

        # --- get_mv_cost rate term ---------------------------------
        in4 = up_ok & left_ok & (xp < bw - step)
        row0 = (yp == 0) & left_ok
        col0 = (xp == 0) & up_ok

        def mv_cost(mx, my):
            d4 = (jnp.abs(mx - nrx) + jnp.abs(my - nry)
                  + jnp.abs(mx - nux) + jnp.abs(my - nuy)
                  + jnp.abs(mx - nDx) + jnp.abs(my - nDy)
                  + jnp.abs(mx - nlx) + jnp.abs(my - nly))
            dr = jnp.abs(mx - nlx) + jnp.abs(my - nly)
            dc = (jnp.abs(mx - nrx) + jnp.abs(my - nry)
                  + jnp.abs(mx - nux) + jnp.abs(my - nuy))
            diff = jnp.where(in4, d4,
                             jnp.where(row0, dr,
                                       jnp.where(col0, dc, 0)))
            return (diff * lam) >> (LAMBDA_SHIFT + ACC_BITS)

        def full_cost(mx, my):
            a0x = _scale_val(mx, -wt1, wt0)
            a0y = _scale_val(my, -wt1, wt0)
            return mv_cost(mx, my) + sad_pair(xstart, ystart, a0x, a0y,
                                              mx, my, bbs)

        def search(_):
            best_cost = jnp.int32(_BIG)
            best_x = cand[0][0]
            best_y = cand[0][1]
            c_eff = jnp.int32(0)
            for c in range(K):
                cost0 = full_cost(cand[c][0], cand[c][1])
                gate = cv[c] & (((4 + c_eff) * cost0) // 8 < best_cost)
                c_eff = c_eff + cv[c].astype(jnp.int32)

                # the four cross points are built from the
                # iteration-start ref_mv (tuple display semantics)
                def refine_iter(_, st):
                    cost, rx, ry, shift, active = st
                    rx0, ry0 = rx, ry
                    off = jnp.left_shift(1, jnp.maximum(shift, 0))
                    it_better = jnp.bool_(False)
                    for d in range(4):
                        ddx = (-1, 1, 0, 0)[d] * off
                        ddy = (0, 0, -1, 1)[d] * off
                        bc = full_cost(rx0 + ddx, ry0 + ddy)
                        better = active & (bc < cost)
                        cost = jnp.where(better, bc, cost)
                        rx = jnp.where(better, rx0 + ddx, rx)
                        ry = jnp.where(better, ry0 + ddy, ry)
                        it_better = it_better | better
                    shift = jnp.where(it_better, shift, shift - 1)
                    active = active & (shift >= ACC_BITS)
                    return (cost, rx, ry, shift, active)

                def run_refine(_):
                    return lax.fori_loop(
                        0, n_ref_iters, refine_iter,
                        (cost0, cand[c][0], cand[c][1],
                         jnp.int32(shift0), gate))[:3]

                cost, ref_x, ref_y = lax.cond(
                    gate, run_refine,
                    lambda _: (cost0, cand[c][0], cand[c][1]), None)
                upd = cv[c] & (cost < best_cost)
                best_cost = jnp.where(upd, cost, best_cost)
                best_x = jnp.where(upd, ref_x, best_x)
                best_y = jnp.where(upd, ref_y, best_y)
            return best_x, best_y

        best_x, best_y = lax.cond(
            sk, lambda _: (skx, sky), search, None)

        # --- write the 2x2 cells (best_* is the skip vector on
        # skip blocks - the search branch never ran) ----------------
        v1x = best_x
        v1y = best_y
        v0x = jnp.where(sk, ssx, _scale_val(best_x, -wt1, wt0))
        v0y = jnp.where(sk, ssy, _scale_val(best_y, -wt1, wt0))
        bgv = sk.astype(jnp.int32)
        for dy in range(2):
            _mset(m1x, yp + dy, xp, 2, v1x)
            _mset(m1y, yp + dy, xp, 2, v1y)
            _mset(m0x, yp + dy, xp, 2, v0x)
            _mset(m0y, yp + dy, xp, 2, v0y)
            _mset(bgm, yp + dy, xp, 2, bgv)
        return 0

    lax.fori_loop(0, BH * BW, body, 0, unroll=False)

    # --- merge smoothing pass (batched reads, per-cell loop) -------
    def merge_body(t, _):
        ii = t // bw
        jj = t % bw
        off = jnp.where((ii & 1) != 0, 2, 1)
        xs_cell = jj * bs
        ys_cell = ii * bs

        def mv_at(y, x):
            ok = (y >= 0) & (y < bh) & (x >= 0) & (x < bw)
            yc = jnp.clip(y, 0, bh - 1)
            xc = jnp.clip(x, 0, bw - 1)
            return _mget(m1x, yc, xc), _mget(m1y, yc, xc), ok

        cands = [(_mget(m1x, ii, jj), _mget(m1y, ii, jj),
                  jnp.bool_(True)),
                 mv_at(ii - off, jj), mv_at(ii + off, jj),
                 mv_at(ii, jj - off), mv_at(ii, jj + off)]
        Km = len(cands)
        oks = []
        for j in range(Km):
            dup = jnp.bool_(False)
            for i in range(j):
                dup = dup | ((cands[j][0] == cands[i][0])
                             & (cands[j][1] == cands[i][1]) & oks[i])
            oks.append(cands[j][2] & ~dup)
        nvalid = jnp.int32(0)
        for j in range(Km):
            nvalid = nvalid + oks[j].astype(jnp.int32)
        multi = nvalid > 1

        def merge_search(_):
            bcost = jnp.int32(_BIG)
            bx = jnp.int32(0)
            by = jnp.int32(0)
            for c in range(Km):
                mx, my = cands[c][0], cands[c][1]
                a0x = _scale_val(mx, -wt1, wt0)
                a0y = _scale_val(my, -wt1, wt0)
                s = sad_pair(xs_cell, ys_cell, a0x, a0y, mx, my, bs)
                take = oks[c] & (s < bcost)
                bcost = jnp.where(take, s, bcost)
                bx = jnp.where(take, mx, bx)
                by = jnp.where(take, my, by)
            return bx, by

        bx, by = lax.cond(
            multi, merge_search,
            lambda _: (cands[0][0], cands[0][1]), None)
        o1x = jnp.where(multi, bx, _mget(m1x, ii, jj))
        o1y = jnp.where(multi, by, _mget(m1y, ii, jj))
        o0x = jnp.where(multi, _scale_val(bx, -wt1, wt0),
                        _mget(m0x, ii, jj))
        o0y = jnp.where(multi, _scale_val(by, -wt1, wt0),
                        _mget(m0y, ii, jj))
        _mset(o1x_ref, ii, jj, 1, o1x)
        _mset(o1y_ref, ii, jj, 1, o1y)
        _mset(o0x_ref, ii, jj, 1, o0x)
        _mset(o0y_ref, ii, jj, 1, o0y)
        _mset(obg_ref, ii, jj, 1, _mget(bgm, ii, jj))
        return 0

    lax.fori_loop(0, bh * bw, merge_body, 0, unroll=False)


@functools.partial(
    jax.jit,
    static_argnames=("w", "h", "pad", "bw", "bh", "guided",
                     "interpret"))
def me_level_pallas(pic0p, pic1p, guide_x, guide_y, wts, *, w, h, pad,
                    bw, bh, guided, interpret=False):
    """One pyramid level's bidirectional ME + merge.

    pic0p/pic1p: [h+2pad, w+2pad] uint8 codec-padded planes.
    guide_x/guide_y: [bh, bw] int32 (zeros when unguided).
    wts: [2] int32 (wt0, wt1).
    Returns (mv0x, mv0y, mv1x, mv1y, bg) [bh, bw] int32 (post-merge).
    """
    base = pad
    Hp = _round_up(2 * pad + h + 24, 8)
    Wp = ((2 * pad + w) >> 7 << 7) + 384
    P0 = jnp.pad(pic0p, ((0, Hp - pic0p.shape[0]),
                         (0, Wp - pic0p.shape[1])))
    P1 = jnp.pad(pic1p, ((0, Hp - pic1p.shape[0]),
                         (0, Wp - pic1p.shape[1])))
    bwA = _round_up(bw, 128)
    gx = jnp.pad(guide_x, ((0, 0), (0, bwA - bw)))
    gy = jnp.pad(guide_y, ((0, 0), (0, bwA - bw)))

    kernel = functools.partial(
        _me_level_kernel, w=w, h=h, pad=pad, bw=bw, bh=bh, bwA=bwA,
        guided=guided, base=base)

    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((bh, bwA), jnp.int32)
                        for _ in range(5)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(5)),
        scratch_shapes=[pltpu.VMEM((bh, bwA), jnp.int32)
                        for _ in range(5)],
        interpret=interpret,
    )(gx, gy, wts, P0, P1)
    o0x, o0y, o1x, o1y, bg = outs
    return (o0x[:, :bw], o0y[:, :bw], o1x[:, :bw], o1y[:, :bw],
            bg[:, :bw])


def _win_clip2(P, ys, xs, size: int, clip_pad: int, base: int,
               h: int, w: int):
    """_win_clip with separate clip bound (the MC stage clips to the
    +-bs/2 halo, temporal_interp.c:387-441) and read base (the codec
    pad the plane physically carries)."""
    hP, wP = h + clip_pad, w + clip_pad
    oy = jnp.clip(ys, -clip_pad, hP - size)
    ox = jnp.clip(xs, -clip_pad, wP - size)
    iy = oy + base
    ix = ox + base
    WH = _round_up(size + 8, 8)
    ry8 = pl.multiple_of((iy >> 3) << 3, 8)
    rx128 = pl.multiple_of((ix >> 7) << 7, 128)
    win = P[pl.ds(ry8, WH), pl.ds(rx128, 256)].astype(jnp.int32)
    win = _rot(win, iy - ry8, 0)
    win = _rot(win, ix - rx128, 1)
    win = win[0:size, 0:size]
    ii = lax.broadcasted_iota(jnp.int32, (size, size), 0)
    jj = lax.broadcasted_iota(jnp.int32, (size, size), 1)
    rv = jnp.clip(ys + ii[:, 0:1], -clip_pad, hP - 1) - oy
    cv = jnp.clip(xs + jj[0:1, :], -clip_pad, wP - 1) - ox
    R = (jj == rv).astype(jnp.float32)
    Ct = (ii == cv).astype(jnp.float32)
    mid = lax.dot_general(R, win.astype(jnp.float32),
                          (((1,), (0,)), ((), ())))
    out = lax.dot_general(mid, Ct, (((1,), (0,)), ((), ())))
    return out.astype(jnp.int32)


def _mot_comp_kernel(m0x_ref, m0y_ref, m1x_ref, m1y_ref,
                     p0_ref, p1_ref, out_ref,
                     *, w, h, cs, clip_pad, base, bh, bw):
    hP, wP = h + clip_pad, w + clip_pad

    def body(t, _):
        ii = t // bw
        jj = t % bw
        ys_c = ii * cs
        xs_c = jj * cs
        m0x = _mget(m0x_ref, ii, jj)
        m0y = _mget(m0y_ref, ii, jj)
        m1x = _mget(m1x_ref, ii, jj)
        m1y = _mget(m1y_ref, ii, jj)
        xs0 = xs_c + ((m0x + ACC_ROUND) >> ACC_BITS)
        xs1 = xs_c + ((m1x + ACC_ROUND) >> ACC_BITS)
        ys0 = ys_c + ((m0y + ACC_ROUND) >> ACC_BITS)
        ys1 = ys_c + ((m1y + ACC_ROUND) >> ACC_BITS)
        in0 = ((xs0 >= -clip_pad) & (xs0 + cs <= wP)
               & (ys0 >= -clip_pad) & (ys0 + cs <= hP))
        in1 = ((xs1 >= -clip_pad) & (xs1 + cs <= wP)
               & (ys1 >= -clip_pad) & (ys1 + cs <= hP))
        a = _win_clip2(p0_ref, ys0, xs0, cs, clip_pad, base, h, w)
        b = _win_clip2(p1_ref, ys1, xs1, cs, clip_pad, base, h, w)
        avg = (a + b + 1) >> 1
        both = in0 & in1
        only1 = in1 & ~in0
        only0 = in0 & ~in1
        px = jnp.where(both, avg,
                       jnp.where(only1, b,
                                 jnp.where(only0, a, avg)))

        # masked read-modify-write placement into the output plane
        ry8 = pl.multiple_of((ys_c >> 3) << 3, 8)
        rx128 = pl.multiple_of((xs_c >> 7) << 7, 128)
        dy = ys_c - ry8
        dx = xs_c - rx128
        t128 = jnp.zeros((8, 128), jnp.int32)
        t128 = jnp.where(
            (lax.broadcasted_iota(jnp.int32, (8, 128), 0) < cs)
            & (lax.broadcasted_iota(jnp.int32, (8, 128), 1) < cs),
            jnp.pad(px, ((0, 8 - cs), (0, 128 - cs))), t128)
        t128 = pltpu.roll(pltpu.roll(t128, dy, axis=0), dx, axis=1)
        rr = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        cc = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        m = ((rr >= dy) & (rr < dy + cs) & (cc >= dx) & (cc < dx + cs))
        old = out_ref[pl.ds(ry8, 8), pl.ds(rx128, 128)] \
            .astype(jnp.int32)
        out_ref[pl.ds(ry8, 8), pl.ds(rx128, 128)] = \
            jnp.where(m, t128, old).astype(jnp.uint8)
        return 0

    lax.fori_loop(0, bh * bw, body, 0, unroll=False)


def _mot_comp_kernel_uv(m0x_ref, m0y_ref, m1x_ref, m1y_ref,
                        p0u_ref, p1u_ref, p0v_ref, p1v_ref,
                        outu_ref, outv_ref,
                        *, w, h, cs, clip_pad, base, bh, bw):
    """U and V share the (halved) luma MV field, so one pass over the
    block grid serves both planes: the MV loads, clip tests and
    placement masks are computed once per block instead of once per
    plane (ROADMAP round-6 item 2: ~30 ms/frame at 1080p)."""
    hP, wP = h + clip_pad, w + clip_pad

    def body(t, _):
        ii = t // bw
        jj = t % bw
        ys_c = ii * cs
        xs_c = jj * cs
        m0x = _mget(m0x_ref, ii, jj)
        m0y = _mget(m0y_ref, ii, jj)
        m1x = _mget(m1x_ref, ii, jj)
        m1y = _mget(m1y_ref, ii, jj)
        xs0 = xs_c + ((m0x + ACC_ROUND) >> ACC_BITS)
        xs1 = xs_c + ((m1x + ACC_ROUND) >> ACC_BITS)
        ys0 = ys_c + ((m0y + ACC_ROUND) >> ACC_BITS)
        ys1 = ys_c + ((m1y + ACC_ROUND) >> ACC_BITS)
        in0 = ((xs0 >= -clip_pad) & (xs0 + cs <= wP)
               & (ys0 >= -clip_pad) & (ys0 + cs <= hP))
        in1 = ((xs1 >= -clip_pad) & (xs1 + cs <= wP)
               & (ys1 >= -clip_pad) & (ys1 + cs <= hP))
        both = in0 & in1
        only1 = in1 & ~in0
        only0 = in0 & ~in1

        ry8 = pl.multiple_of((ys_c >> 3) << 3, 8)
        rx128 = pl.multiple_of((xs_c >> 7) << 7, 128)
        dy = ys_c - ry8
        dx = xs_c - rx128
        rr = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        cc = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        m = ((rr >= dy) & (rr < dy + cs) & (cc >= dx) & (cc < dx + cs))
        inb = (rr < cs) & (cc < cs)

        for p0_ref, p1_ref, out_ref in ((p0u_ref, p1u_ref, outu_ref),
                                        (p0v_ref, p1v_ref, outv_ref)):
            a = _win_clip2(p0_ref, ys0, xs0, cs, clip_pad, base, h, w)
            b = _win_clip2(p1_ref, ys1, xs1, cs, clip_pad, base, h, w)
            avg = (a + b + 1) >> 1
            px = jnp.where(both, avg,
                           jnp.where(only1, b,
                                     jnp.where(only0, a, avg)))
            t128 = jnp.where(inb,
                             jnp.pad(px, ((0, 8 - cs), (0, 128 - cs))),
                             jnp.zeros((8, 128), jnp.int32))
            t128 = pltpu.roll(pltpu.roll(t128, dy, axis=0), dx, axis=1)
            old = out_ref[pl.ds(ry8, 8), pl.ds(rx128, 128)] \
                .astype(jnp.int32)
            out_ref[pl.ds(ry8, 8), pl.ds(rx128, 128)] = \
                jnp.where(m, t128, old).astype(jnp.uint8)
        return 0

    lax.fori_loop(0, bh * bw, body, 0, unroll=False)


@functools.partial(
    jax.jit,
    static_argnames=("w", "h", "cs", "clip_pad", "base", "interpret"))
def mot_comp_pallas_uv(p0u, p1u, p0v, p1v, mv0, mv1, *, w, h, cs,
                       clip_pad, base, interpret=False):
    """mot_comp_pallas for the U+V pair in ONE kernel (shared MV
    field). Returns ([h, w] u, [h, w] v) uint8."""
    bh, bw = mv0.shape[:2]
    Hp = _round_up(2 * base + h + 24, 8)
    Wp = ((2 * base + w) >> 7 << 7) + 384

    def padp(p):
        return jnp.pad(p, ((0, Hp - p.shape[0]), (0, Wp - p.shape[1])))

    bwA = _round_up(bw, 128)

    def padm(a):
        return jnp.pad(a, ((0, 0), (0, bwA - bw)))

    Ho = _round_up(h + 8, 8)
    Wo = _round_up(w, 128) + 128

    kernel = functools.partial(
        _mot_comp_kernel_uv, w=w, h=h, cs=cs, clip_pad=clip_pad,
        base=base, bh=bh, bw=bw)
    ou, ov = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((Ho, Wo), jnp.uint8),
                   jax.ShapeDtypeStruct((Ho, Wo), jnp.uint8)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        interpret=interpret,
    )(padm(mv0[:, :, 0]), padm(mv0[:, :, 1]),
      padm(mv1[:, :, 0]), padm(mv1[:, :, 1]),
      padp(p0u), padp(p1u), padp(p0v), padp(p1v))
    return ou[:h, :w], ov[:h, :w]


@functools.partial(
    jax.jit,
    static_argnames=("w", "h", "cs", "clip_pad", "base", "interpret"))
def mot_comp_pallas(p0p, p1p, mv0, mv1, *, w, h, cs, clip_pad, base,
                    interpret=False):
    """interpolate_frame's per-plane averaged bi-MC (one plane).

    p0p/p1p: [h+2base, w+2base] uint8 codec-padded planes; mv0/mv1:
    [bh, bw, 2] int32 cell MVs (already in this plane's units).
    Returns [h, w] uint8."""
    bh, bw = mv0.shape[:2]
    Hp = _round_up(2 * base + h + 24, 8)
    Wp = ((2 * base + w) >> 7 << 7) + 384
    P0 = jnp.pad(p0p, ((0, Hp - p0p.shape[0]), (0, Wp - p0p.shape[1])))
    P1 = jnp.pad(p1p, ((0, Hp - p1p.shape[0]), (0, Wp - p1p.shape[1])))
    bwA = _round_up(bw, 128)

    def padm(a):
        return jnp.pad(a, ((0, 0), (0, bwA - bw)))

    Ho = _round_up(h + 8, 8)
    Wo = _round_up(w, 128) + 128

    kernel = functools.partial(
        _mot_comp_kernel, w=w, h=h, cs=cs, clip_pad=clip_pad,
        base=base, bh=bh, bw=bw)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Ho, Wo), jnp.uint8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(padm(mv0[:, :, 0]), padm(mv0[:, :, 1]),
      padm(mv1[:, :, 0]), padm(mv1[:, :, 1]), P0, P1)
    return out[:h, :w]


def interpolate_frames_pallas(ref0, ref1, ratio: int, pos: int,
                              interpret=False):
    """Pallas twin of device_interp.interpolate_frames_device: the
    full pyramid with the per-level ME and the MC synthesis running as
    whole-pass kernels. Returns (y, u, v, yp, up, vp) device arrays."""
    import math
    from . import device_interp as DI
    PAD_Y = 96
    h, w = ref0.y.shape[0] - 2 * PAD_Y, ref0.y.shape[1] - 2 * PAD_Y
    max_levels = min(DI.MAX_LEVELS,
                     int(math.log10(min(w, h)) / math.log10(2.0) - 4.0))

    reversed_ = pos > ratio // 2
    wt0 = pos if reversed_ else ratio - pos
    wt1 = ratio - wt0
    wts = jnp.asarray([wt0, wt1], jnp.int32)

    p0y = jnp.asarray(ref0.y)
    p1y = jnp.asarray(ref1.y)
    lv0 = [(p0y, PAD_Y)]
    lv1 = [(p1y, PAD_Y)]
    for l in range(max_levels - 1):
        wl, hl = w >> l, h >> l
        lv0.append((DI.downscale2x2(lv0[-1][0], lv0[-1][1], wl, hl,
                                    DI.PAD_L), DI.PAD_L))
        lv1.append((DI.downscale2x2(lv1[-1][0], lv1[-1][1], wl, hl,
                                    DI.PAD_L), DI.PAD_L))

    def grid(lvl):
        wl, hl = w >> lvl, h >> lvl
        bwg = 2 * ((wl + BLOCK_STEP - 1) // BLOCK_STEP)
        bhg = 2 * ((hl + BLOCK_STEP - 1) // BLOCK_STEP)
        return wl, hl, bwg, bhg

    guide = None
    mv0 = mv1 = None
    bw = bh = 0
    for lvl in range(max_levels - 1, -1, -1):
        wl, hl, bw, bh = grid(lvl)
        padl = lv0[lvl][1]
        a, b_ = lv0[lvl][0], lv1[lvl][0]
        pic0, pic1 = (b_, a) if reversed_ else (a, b_)
        if guide is None:
            gx = jnp.zeros((bh, bw), jnp.int32)
            gy = jnp.zeros((bh, bw), jnp.int32)
        else:
            g = guide.reshape(bh, bw, 2)
            gx, gy = g[:, :, 0], g[:, :, 1]
        o0x, o0y, o1x, o1y, _bg = me_level_pallas(
            pic0, pic1, gx, gy, wts, w=wl, h=hl, pad=padl, bw=bw,
            bh=bh, guided=guide is not None, interpret=interpret)
        mv0 = jnp.stack([o0x, o0y], -1).reshape(-1, 2)
        mv1 = jnp.stack([o1x, o1y], -1).reshape(-1, 2)
        if lvl > 0:
            _, _, bwo, bho = grid(lvl - 1)
            guide = DI._upscale_fn(bw, bh, bwo, bho)(mv1)

    a, b_ = lv0[0][0], lv1[0][0]
    pic0, pic1 = (b_, a) if reversed_ else (a, b_)
    p0u = jnp.asarray(ref1.u if reversed_ else ref0.u)
    p0v = jnp.asarray(ref1.v if reversed_ else ref0.v)
    p1u = jnp.asarray(ref0.u if reversed_ else ref1.u)
    p1v = jnp.asarray(ref0.v if reversed_ else ref1.v)

    m0 = mv0.reshape(bh, bw, 2)
    m1 = mv1.reshape(bh, bw, 2)
    y = mot_comp_pallas(pic0, pic1, m0, m1,
                        w=w, h=h, cs=BLOCK_STEP // 2,
                        clip_pad=BLOCK_STEP // 4, base=96,
                        interpret=interpret)
    c1 = m1 >> 1
    c0x = DI._scale_val_j(c1[:, :, 0], -wt1, wt0)
    c0y = DI._scale_val_j(c1[:, :, 1], -wt1, wt0)
    cm0 = jnp.stack([c0x, c0y], -1)
    u, v = mot_comp_pallas_uv(p0u, p1u, p0v, p1v, cm0, c1,
                              w=w // 2, h=h // 2,
                              cs=BLOCK_STEP // 4,
                              clip_pad=BLOCK_STEP // 8,
                              base=48, interpret=interpret)
    yp = jnp.pad(y, 96, mode="edge")
    up = jnp.pad(u, 48, mode="edge")
    vp = jnp.pad(v, 48, mode="edge")
    return y, u, v, yp, up, vp
