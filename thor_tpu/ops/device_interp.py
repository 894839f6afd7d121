"""Temporal frame interpolation as batched device programs.

TPU port of common/temporal_interp.c:972-1053 (the synthesized
reference used by interp_ref configs; both encoder and decoder run it
identically, so it must be bit-exact vs thor_interp.c / the Python
oracle in ops/temporal_interp.py).

Decomposition:
- pyramid 2x2 box downscale: dense jnp (scale_frame_down2x2,
  temporal_interp.c:151-245)
- per-level bidirectional ME (motion_estimate_bi, :852-918): the
  skip/candidate vectors read already-decided raster neighbours, so
  the per-16x16-block walk is a lax.scan in raster order; all pixel
  work inside a step (skip-test SADs, candidate SADs, the adaptive
  cross refinement) is dense masked tensor arithmetic with
  edge-clamped gathers exactly matching the C's per-pixel clipping
  (:443-523)
- merge smoothing (:901-911): reads only the pre-pass MV map - fully
  batched over all 8x8 cells
- weighted bi-MC synthesis (interpolate_frame + mot_comp_avg,
  :387-441, :946-970): fully batched gathers

The MV maps stay on device between levels; only the final planes (or
nothing, when the caller keeps the interp reference device-resident)
cross the link.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

BLOCK_STEP = 16
MAX_CANDS = 20
COST_MAX = 0x3FFFFFFF
LAMBDA = (3000 * BLOCK_STEP) // 16
LAMBDA_SHIFT = 4
SKIP_THRESHOLD = 8
ACC_BITS = 3
ACC_ROUND = 1 << (ACC_BITS - 1)
MAX_LEVELS = 4
PAD_L = 32          # upper pyramid levels' padding (thor_interp.c)


def _scale_val_j(v, numer, denom):
    """Exact _scale_val (round half away from zero); numer/denom may be
    traced scalars (denom = wt0 is always positive here, so the C's
    denom<0 normalization is dead; the general formula subsumes the
    numer==+-denom shortcut cases exactly)."""
    prod = v * numer
    mag = (jnp.abs(prod) + denom // 2) // denom
    return jnp.where(prod >= 0, mag, -mag)


def _scale_mv_j(mvx, mvy, numer, denom):
    return _scale_val_j(mvx, numer, denom), _scale_val_j(mvy, numer, denom)


def downscale2x2(yp, pad_in: int, w: int, h: int, pad_out: int):
    """Padded level plane -> next level padded plane (luma)."""
    src = yp[pad_in:pad_in + 2 * (h // 2),
             pad_in:pad_in + 2 * (w // 2)].astype(jnp.int32)
    col = (src[0::2] + src[1::2] + 1) >> 1
    out = ((col[:, 0::2] + col[:, 1::2]) >> 1).astype(jnp.uint8)
    return jnp.pad(out, pad_out, mode="edge")


def _window_gather(picp, ys, xs, size: int, pad: int, hP: int, wP: int):
    """[size, size] window at (ys, xs) frame coords with the C's
    per-pixel clip to [-pad, dim+pad-1] (sad_cost clipped branch)."""
    i = jnp.arange(size, dtype=jnp.int32)
    y = jnp.clip(i + ys, -pad, hP - 1)[:, None]
    x = jnp.clip(i + xs, -pad, wP - 1)[None, :]
    flat = (y + pad) * picp.shape[1] + (x + pad)
    return jnp.take(picp.reshape(-1), flat.reshape(-1)) \
        .reshape(size, size).astype(jnp.int32)


@lru_cache(maxsize=None)
def _me_level_fn(w: int, h: int, pad: int, guided: bool):
    """Jitted raster-scan bidirectional ME for one pyramid level
    (already pic0/pic1-swapped by the caller when reversed).

    Inputs: pic0p, pic1p padded uint8 planes; guide_mv1 [bh*bw, 2]
    int32 (zeros when unguided). Output: mv0, mv1 [bh*bw, 2] int32 and
    bgmap [bh*bw] int32 - the post-merge-pass maps.
    """
    bs, bbs = BLOCK_STEP // 2, BLOCK_STEP
    step = 2
    bw = step * ((w + bbs - 1) // bbs)
    bh = step * ((h + bbs - 1) // bbs)
    NB = (bh // step) * (bw // step)
    BW = bw // step
    hP, wP = h + pad, w + pad
    lam = LAMBDA // 4 if guided else LAMBDA
    n_ref_iters = 2 if guided else 16
    shift0 = ACC_BITS if guided else 3 + ACC_BITS
    count0 = 8 if guided else 64
    thr = SKIP_THRESHOLD * 8 * 8

    def sad(picp, ys, xs):
        return _window_gather(picp, ys, xs, bbs, pad, hP, wP)

    def sad_pair(pic0p, pic1p, xstart, ystart, m0x, m0y, m1x, m1y):
        xs0 = xstart + ((m0x + ACC_ROUND) >> ACC_BITS)
        xs1 = xstart + ((m1x + ACC_ROUND) >> ACC_BITS)
        ys0 = ystart + ((m0y + ACC_ROUND) >> ACC_BITS)
        ys1 = ystart + ((m1y + ACC_ROUND) >> ACC_BITS)
        a = sad(pic0p, ys0, xs0)
        b = sad(pic1p, ys1, xs1)
        return jnp.abs(a - b).sum()

    def f(pic0p, pic1p, guide_mv1, wt0, wt1):
        g0 = pic0p
        g1 = pic1p

        def mv_at(mv1m, pos):
            return mv1m[pos]          # [2]

        def step_fn(carry, t):
            mv0m, mv1m, bgm = carry   # [bh*bw, 2], [bh*bw, 2], [bh*bw]
            yp = (t // BW) * step
            xp = (t % BW) * step
            pos = yp * bw + xp
            xstart = xp * bs
            ystart = yp * bs

            up_ok = yp > 0
            upr_ok = up_ok & (xp < bw - step)
            left_ok = xp > 0

            n_upr = mv_at(mv1m, (yp - step) * bw + xp + step)
            n_left = mv_at(mv1m, yp * bw + xp - step)
            n_up = mv_at(mv1m, (yp - step) * bw + xp)

            # --- make_skip_vector: |.|-distance medoid of the valid
            # neighbour list (order: up-right, left, up; ties keep the
            # LAST <=) -------------------------------------------------
            nbrs = jnp.stack([n_upr, n_left, n_up])          # [3, 2]
            nval = jnp.stack([upr_ok, left_ok, up_ok])
            dist = (jnp.abs(nbrs[:, None, :] - nbrs[None, :, :])
                    .sum(-1) * nval[:, None]).sum(0)          # [3]
            best_c = jnp.full((), COST_MAX, jnp.int32)
            skip_mv = jnp.zeros((2,), jnp.int32)
            any_v = jnp.zeros((), bool)
            for j in range(3):
                take = nval[j] & (dist[j] <= best_c)
                best_c = jnp.where(take, dist[j], best_c)
                skip_mv = jnp.where(take, nbrs[j], skip_mv)
                any_v = any_v | nval[j]
            skip_mv = jnp.where(any_v, skip_mv, 0)
            ssx, ssy = _scale_mv_j(skip_mv[0], skip_mv[1], -wt1, wt0)

            # --- skip test: 4 8x8 sub-SADs all under threshold AND all
            # windows strictly inside the padded planes ---------------
            sk = jnp.ones((), bool)
            for dy in (0, 8):
                for dx in (0, 8):
                    q = xstart + dx
                    p = ystart + dy
                    xs0 = q + ((ssx + ACC_ROUND) >> ACC_BITS)
                    xs1 = q + ((skip_mv[0] + ACC_ROUND) >> ACC_BITS)
                    ys0 = p + ((ssy + ACC_ROUND) >> ACC_BITS)
                    ys1 = p + ((skip_mv[1] + ACC_ROUND) >> ACC_BITS)
                    inb = ((xs0 >= -pad) & (xs0 + 8 <= wP)
                           & (ys0 >= -pad) & (ys0 + 8 <= hP)
                           & (xs1 >= -pad) & (xs1 + 8 <= wP)
                           & (ys1 >= -pad) & (ys1 + 8 <= hP))
                    a = _window_gather(g0, ys0, xs0, 8, pad, hP, wP)
                    b = _window_gather(g1, ys1, xs1, 8, pad, hP, wP)
                    s8 = jnp.abs(a - b).sum()
                    sk = sk & inb & (s8 <= thr)

            # --- candidate list (get_cands order: zero, guide,
            # up-right, left, up; insertion dedup) --------------------
            cands = [(jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                      jnp.ones((), bool))]
            if guided:
                gmv = guide_mv1[pos]
                cands.append((gmv[0], gmv[1], jnp.ones((), bool)))
            cands.append((n_upr[0], n_upr[1], upr_ok))
            cands.append((n_left[0], n_left[1], left_ok))
            cands.append((n_up[0], n_up[1], up_ok))
            K = len(cands)
            cx = jnp.stack([c[0] for c in cands])
            cy = jnp.stack([c[1] for c in cands])
            cv = jnp.stack([c[2] for c in cands])
            # dedup: a slot equal to any EARLIER valid slot is dropped
            eq = (cx[:, None] == cx[None, :]) & (cy[:, None] == cy[None, :])
            dup = jnp.zeros((K,), bool)
            for j in range(1, K):
                e = jnp.zeros((), bool)
                for i in range(j):
                    e = e | (eq[j, i] & cv[i] & ~dup[i])
                dup = dup.at[j].set(e)
            cv = cv & ~dup

            # --- get_mv_cost rate term (boundary-class exact) --------
            in4 = (yp > 0) & (xp > 0) & (xp < bw - step)
            row0 = (yp == 0) & (xp > 0)
            col0 = (xp == 0) & (yp > 0)

            def mv_cost(mx, my):
                d4 = (jnp.abs(mx - n_upr[0]) + jnp.abs(my - n_upr[1])
                      + jnp.abs(mx - n_up[0]) + jnp.abs(my - n_up[1])
                      + jnp.abs(mx - mv_at(mv1m, (yp - step) * bw + xp
                                           - step)[0])
                      + jnp.abs(my - mv_at(mv1m, (yp - step) * bw + xp
                                           - step)[1])
                      + jnp.abs(mx - n_left[0]) + jnp.abs(my - n_left[1]))
                dr = jnp.abs(mx - n_left[0]) + jnp.abs(my - n_left[1])
                dc = (jnp.abs(mx - n_upr[0]) + jnp.abs(my - n_upr[1])
                      + jnp.abs(mx - n_up[0]) + jnp.abs(my - n_up[1]))
                diff = jnp.where(in4, d4,
                                 jnp.where(row0, dr,
                                           jnp.where(col0, dc, 0)))
                return (diff * lam) >> (LAMBDA_SHIFT + ACC_BITS)

            def full_cost_vec(mxs, mys):
                """Batched rate + bi-SAD cost for [M] MV candidates
                (one vectorized window gather instead of M unrolled
                SAD subgraphs - keeps the scan body's compiled graph
                small and the gathers wide)."""
                m0x, m0y = _scale_mv_j(mxs, mys, -wt1, wt0)
                xs0 = xstart + ((m0x + ACC_ROUND) >> ACC_BITS)
                xs1 = xstart + ((mxs + ACC_ROUND) >> ACC_BITS)
                ys0 = ystart + ((m0y + ACC_ROUND) >> ACC_BITS)
                ys1 = ystart + ((mys + ACC_ROUND) >> ACC_BITS)
                a = jax.vmap(lambda ys, xs: _window_gather(
                    g0, ys, xs, bbs, pad, hP, wP))(ys0, xs0)
                b = jax.vmap(lambda ys, xs: _window_gather(
                    g1, ys, xs, bbs, pad, hP, wP))(ys1, xs1)
                return mv_cost(mxs, mys) + jnp.abs(a - b).sum((1, 2))

            # --- adaptive search over the candidate slots ------------
            base_costs = full_cost_vec(cx, cy)
            best_cost = jnp.full((), COST_MAX, jnp.int32)
            best_x = cx[0]
            best_y = cy[0]
            # the (4+c) pruning multiplier counts COMPACTED candidates
            # (the C list holds only valid ones), not slot positions
            c_eff = jnp.zeros((), jnp.int32)
            dxs4 = jnp.asarray([-1, 1, 0, 0], jnp.int32)
            dys4 = jnp.asarray([0, 0, -1, 1], jnp.int32)
            for c in range(K):
                cost0 = base_costs[c]
                gate = cv[c] & (((4 + c_eff) * cost0) // 8 < best_cost)
                c_eff = c_eff + cv[c].astype(jnp.int32)

                def refine_body(_, st):
                    cost, rx, ry, shift, active = st
                    off = jnp.left_shift(1, jnp.maximum(shift, 0))
                    # the four cross points are built from the
                    # iteration-start ref_mv (tuple display semantics)
                    cxs = rx + dxs4 * off
                    cys = ry + dys4 * off
                    bc = full_cost_vec(cxs, cys)
                    it_better = jnp.zeros((), bool)
                    for d in range(4):
                        better = active & (bc[d] < cost)
                        cost = jnp.where(better, bc[d], cost)
                        rx = jnp.where(better, cxs[d], rx)
                        ry = jnp.where(better, cys[d], ry)
                        it_better = it_better | better
                    shift = jnp.where(it_better, shift, shift - 1)
                    active = active & (shift >= ACC_BITS)
                    return (cost, rx, ry, shift, active)

                cost, ref_x, ref_y, _, _ = lax.fori_loop(
                    0, n_ref_iters, refine_body,
                    (cost0, cx[c], cy[c],
                     jnp.full((), shift0, jnp.int32), gate))
                upd = cv[c] & (cost < best_cost)
                best_cost = jnp.where(upd, cost, best_cost)
                best_x = jnp.where(upd, ref_x, best_x)
                best_y = jnp.where(upd, ref_y, best_y)

            # --- choose skip vs searched; write the 2x2 cells --------
            mv1x = jnp.where(sk, skip_mv[0], best_x)
            mv1y = jnp.where(sk, skip_mv[1], best_y)
            bsx, bsy = _scale_mv_j(best_x, best_y, -wt1, wt0)
            mv0x = jnp.where(sk, ssx, bsx)
            mv0y = jnp.where(sk, ssy, bsy)
            bg = sk.astype(jnp.int32)

            patch1 = jnp.broadcast_to(
                jnp.stack([mv1x, mv1y])[None, None, :], (2, 2, 2))
            patch0 = jnp.broadcast_to(
                jnp.stack([mv0x, mv0y])[None, None, :], (2, 2, 2))
            m1g = mv1m.reshape(bh, bw, 2)
            m0g = mv0m.reshape(bh, bw, 2)
            bgg = bgm.reshape(bh, bw)
            m1g = lax.dynamic_update_slice(m1g, patch1, (yp, xp, 0))
            m0g = lax.dynamic_update_slice(m0g, patch0, (yp, xp, 0))
            bgg = lax.dynamic_update_slice(
                bgg, jnp.broadcast_to(bg, (2, 2)), (yp, xp))
            return (m0g.reshape(-1, 2), m1g.reshape(-1, 2),
                    bgg.reshape(-1)), None

        init = (jnp.zeros((bh * bw, 2), jnp.int32),
                jnp.zeros((bh * bw, 2), jnp.int32),
                jnp.zeros((bh * bw,), jnp.int32))
        (mv0m, mv1m, bgm), _ = lax.scan(
            step_fn, init, jnp.arange(NB, dtype=jnp.int32))

        # --- merge smoothing pass: batched over every 8x8 cell -------
        ii = jnp.arange(bh, dtype=jnp.int32)[:, None]
        jj = jnp.arange(bw, dtype=jnp.int32)[None, :]
        off = jnp.where((ii & 1) != 0, 2, 1)      # yoff == xoff keyed on yp
        m1g = mv1m.reshape(bh, bw, 2)

        def cell_at(di_sign, axis):
            """mv1 of the cell offset by +-off along axis, with its
            validity mask."""
            o = off * di_sign
            yi = ii + (o if axis == 0 else 0)
            xi = jj + (o if axis == 1 else 0)
            ok = (yi >= 0) & (yi < bh) & (xi >= 0) & (xi < bw)
            yc = jnp.clip(yi, 0, bh - 1)
            xc = jnp.clip(xi, 0, bw - 1)
            return m1g[yc, xc], jnp.broadcast_to(ok, (bh, bw))

        center = m1g
        c_up, ok_up = cell_at(-1, 0)
        c_dn, ok_dn = cell_at(1, 0)
        c_lf, ok_lf = cell_at(-1, 1)
        c_rt, ok_rt = cell_at(1, 1)
        cands_m = [(center, jnp.ones((bh, bw), bool)),
                   (c_up, ok_up), (c_dn, ok_dn),
                   (c_lf, ok_lf), (c_rt, ok_rt)]
        # insertion dedup + the len(cands) > 1 gate
        Km = len(cands_m)
        vals = jnp.stack([c[0] for c in cands_m])        # [5, bh, bw, 2]
        oks = jnp.stack([c[1] for c in cands_m])         # [5, bh, bw]
        dupm = jnp.zeros((Km, bh, bw), bool)
        for j in range(1, Km):
            e = jnp.zeros((bh, bw), bool)
            for i in range(j):
                e = e | ((vals[j] == vals[i]).all(-1) & oks[i] & ~dupm[i])
            dupm = dupm.at[j].set(e)
        oks = oks & ~dupm
        multi = oks.sum(0) > 1

        xs_cell = jj * bs
        ys_cell = ii * bs

        def cell_sad(mx, my):
            m0x, m0y = _scale_mv_j(mx, my, -wt1, wt0)
            xs0 = xs_cell + ((m0x + ACC_ROUND) >> ACC_BITS)
            xs1 = xs_cell + ((mx + ACC_ROUND) >> ACC_BITS)
            ys0 = ys_cell + ((m0y + ACC_ROUND) >> ACC_BITS)
            ys1 = ys_cell + ((my + ACC_ROUND) >> ACC_BITS)
            d = jnp.arange(bs, dtype=jnp.int32)
            y0 = jnp.clip(ys0[:, :, None, None] + d[None, None, :, None],
                          -pad, hP - 1)
            x0 = jnp.clip(xs0[:, :, None, None] + d[None, None, None, :],
                          -pad, wP - 1)
            y1 = jnp.clip(ys1[:, :, None, None] + d[None, None, :, None],
                          -pad, hP - 1)
            x1 = jnp.clip(xs1[:, :, None, None] + d[None, None, None, :],
                          -pad, wP - 1)
            W1 = g0.shape[1]
            a = jnp.take(g0.reshape(-1),
                         ((y0 + pad) * W1 + x0 + pad).reshape(-1)) \
                .reshape(bh, bw, bs, bs).astype(jnp.int32)
            b = jnp.take(g1.reshape(-1),
                         ((y1 + pad) * W1 + x1 + pad).reshape(-1)) \
                .reshape(bh, bw, bs, bs).astype(jnp.int32)
            return jnp.abs(a - b).sum((2, 3))

        bcost = jnp.full((bh, bw), COST_MAX, jnp.int32)
        bx = jnp.zeros((bh, bw), jnp.int32)
        by = jnp.zeros((bh, bw), jnp.int32)
        for c in range(Km):
            s = cell_sad(vals[c, :, :, 0], vals[c, :, :, 1])
            take = oks[c] & (s < bcost)
            bcost = jnp.where(take, s, bcost)
            bx = jnp.where(take, vals[c, :, :, 0], bx)
            by = jnp.where(take, vals[c, :, :, 1], by)
        b0x, b0y = _scale_mv_j(bx, by, -wt1, wt0)
        m1x = jnp.where(multi, bx, m1g[:, :, 0])
        m1y = jnp.where(multi, by, m1g[:, :, 1])
        m0g = mv0m.reshape(bh, bw, 2)
        m0x = jnp.where(multi, b0x, m0g[:, :, 0])
        m0y = jnp.where(multi, b0y, m0g[:, :, 1])
        mv1f = jnp.stack([m1x, m1y], -1).reshape(-1, 2)
        mv0f = jnp.stack([m0x, m0y], -1).reshape(-1, 2)
        return mv0f, mv1f, bgm, mv0m, mv1m

    return jax.jit(f)


@lru_cache(maxsize=None)
def _upscale_fn(bwi: int, bhi: int, bwo: int, bho: int):
    """upscale_mv_data (temporal_interp.c:247-271): 2x MV upscale to
    the finer grid."""
    def f(mv1):
        g = mv1.reshape(bhi, bwi, 2)
        yi = jnp.minimum(jnp.arange(bho, dtype=jnp.int32) // 2, bhi - 1)
        xi = jnp.minimum(jnp.arange(bwo, dtype=jnp.int32) // 2, bwi - 1)
        up = g[yi][:, xi] * 2
        return up.reshape(-1, 2)

    return jax.jit(f)


@lru_cache(maxsize=None)
def _mot_comp_fn(w: int, h: int, pad_y: int, pad_c: int):
    """interpolate_frame (temporal_interp.c:920-970): averaged bi-MC
    synthesis of the full YUV frame from the 8-cell MV map, batched.

    Outputs the unpadded (y, u, v) planes plus edge-padded reference
    planes so the synthesized frame can stay device-resident."""
    bs = BLOCK_STEP // 2
    mcpad = bs // 2                   # pad=bs/2=4 (":920-970")
    wP, hP = w + mcpad, h + mcpad
    wPc, hPc, padc = wP // 2, hP // 2, mcpad // 2

    def comp_plane(p0, p1, ppad, mv0, mv1, W_, H_, cs, wPl, hPl, padl):
        """One plane: per-cell mot_comp_avg with the in0/in1 window
        cases (temporal_interp.c:387-441)."""
        bh, bw = mv0.shape[:2]
        xs_c = jnp.arange(bw, dtype=jnp.int32)[None, :] * cs
        ys_c = jnp.arange(bh, dtype=jnp.int32)[:, None] * cs
        m0x, m0y = mv0[:, :, 0], mv0[:, :, 1]
        m1x, m1y = mv1[:, :, 0], mv1[:, :, 1]
        xs0 = xs_c + ((m0x + ACC_ROUND) >> ACC_BITS)
        xs1 = xs_c + ((m1x + ACC_ROUND) >> ACC_BITS)
        ys0 = ys_c + ((m0y + ACC_ROUND) >> ACC_BITS)
        ys1 = ys_c + ((m1y + ACC_ROUND) >> ACC_BITS)
        in0 = ((xs0 >= -padl) & (xs0 + cs <= wPl) & (ys0 >= -padl)
               & (ys0 + cs <= hPl))
        in1 = ((xs1 >= -padl) & (xs1 + cs <= wPl) & (ys1 >= -padl)
               & (ys1 + cs <= hPl))
        d = jnp.arange(cs, dtype=jnp.int32)
        W1 = p0.shape[1]

        def gat(p, ys, xs):
            # per-pixel clip to the +-padl MC halo (mot_comp_avg's
            # clipped branch, temporal_interp.c:387-441); the base
            # offset into the padded source plane is ppad
            y = jnp.clip(ys[:, :, None, None] + d[None, None, :, None],
                         -padl, hPl - 1)
            x = jnp.clip(xs[:, :, None, None] + d[None, None, None, :],
                         -padl, wPl - 1)
            return jnp.take(p.reshape(-1),
                            ((y + ppad) * W1 + x + ppad).reshape(-1)) \
                .reshape(bh, bw, cs, cs).astype(jnp.int32)

        a = gat(p0, ys0, xs0)
        b = gat(p1, ys1, xs1)
        avg = (a + b + 1) >> 1
        both = (in0 & in1)[:, :, None, None]
        only1 = (in1 & ~in0)[:, :, None, None]
        only0 = (in0 & ~in1)[:, :, None, None]
        px = jnp.where(both, avg,
                       jnp.where(only1, b,
                                 jnp.where(only0, a, avg)))
        # [bh, bw, cs, cs] -> [bh*cs, bw*cs], cropped to the frame
        out = px.transpose(0, 2, 1, 3).reshape(bh * cs, bw * cs)
        return out[:H_, :W_].astype(jnp.uint8)

    def f(p0y, p0u, p0v, p1y, p1u, p1v, mv0, mv1, wt0, wt1):
        m0 = mv0
        m1 = mv1
        y = comp_plane(p0y, p1y, pad_y, m0, m1, w, h, bs, wP, hP, mcpad)
        c1x, c1y = m1[:, :, 0] >> 1, m1[:, :, 1] >> 1
        c0x, c0y = _scale_mv_j(c1x, c1y, -wt1, wt0)
        cm0 = jnp.stack([c0x, c0y], -1)
        cm1 = jnp.stack([c1x, c1y], -1)
        u = comp_plane(p0u, p1u, pad_c, cm0, cm1, w // 2, h // 2,
                       bs // 2, wPc, hPc, padc)
        v = comp_plane(p0v, p1v, pad_c, cm0, cm1, w // 2, h // 2,
                       bs // 2, wPc, hPc, padc)
        yp = jnp.pad(y, pad_y, mode="edge")
        up = jnp.pad(u, pad_c, mode="edge")
        vp = jnp.pad(v, pad_c, mode="edge")
        return y, u, v, yp, up, vp

    return jax.jit(f)


def interpolate_frames_device(ref0, ref1, ratio: int, pos: int):
    """Device twin of ops.temporal_interp.interpolate_frames: takes
    two reference-frame objects whose .y/.u/.v are padded planes
    (host numpy or device arrays; pads 96/48), runs the full pyramid
    on device, and returns (y, u, v, yp, up, vp) DEVICE arrays - the
    unpadded synthesized planes plus their edge-padded reference
    versions (so callers can keep the interpolated reference
    device-resident)."""
    import math
    PAD_Y = 96
    h, w = ref0.y.shape[0] - 2 * PAD_Y, ref0.y.shape[1] - 2 * PAD_Y
    max_levels = min(MAX_LEVELS,
                     int(math.log10(min(w, h)) / math.log10(2.0) - 4.0))

    reversed_ = pos > ratio // 2
    wt0 = pos if reversed_ else ratio - pos
    wt1 = ratio - wt0

    p0y = jnp.asarray(ref0.y)
    p1y = jnp.asarray(ref1.y)
    lv0 = [(p0y, PAD_Y)]
    lv1 = [(p1y, PAD_Y)]
    for l in range(max_levels - 1):
        wl, hl = w >> l, h >> l
        lv0.append((downscale2x2(lv0[-1][0], lv0[-1][1], wl, hl, PAD_L),
                    PAD_L))
        lv1.append((downscale2x2(lv1[-1][0], lv1[-1][1], wl, hl, PAD_L),
                    PAD_L))

    def grid(lvl):
        wl, hl = w >> lvl, h >> lvl
        bw = 2 * ((wl + BLOCK_STEP - 1) // BLOCK_STEP)
        bh = 2 * ((hl + BLOCK_STEP - 1) // BLOCK_STEP)
        return wl, hl, bw, bh

    guide = None
    mv0 = mv1 = None
    for lvl in range(max_levels - 1, -1, -1):
        wl, hl, bw, bh = grid(lvl)
        padl = lv0[lvl][1]
        a, b_ = lv0[lvl][0], lv1[lvl][0]
        pic0, pic1 = (b_, a) if reversed_ else (a, b_)
        fn = _me_level_fn(wl, hl, padl, guide is not None)
        g = guide if guide is not None \
            else jnp.zeros((bh * bw, 2), jnp.int32)
        mv0, mv1, _bg, _, _ = fn(pic0, pic1, g, jnp.int32(wt0),
                                 jnp.int32(wt1))
        if lvl > 0:
            _, _, bwo, bho = grid(lvl - 1)
            guide = _upscale_fn(bw, bh, bwo, bho)(mv1)

    wl, hl, bw, bh = grid(0)
    a, b_ = lv0[0][0], lv1[0][0]
    pic0, pic1 = (b_, a) if reversed_ else (a, b_)
    p0u = jnp.asarray(ref1.u if reversed_ else ref0.u)
    p0v = jnp.asarray(ref1.v if reversed_ else ref0.v)
    p1u = jnp.asarray(ref0.u if reversed_ else ref1.u)
    p1v = jnp.asarray(ref0.v if reversed_ else ref1.v)
    return _mot_comp_fn(w, h, 96, 48)(
        pic0, p0u, p0v, pic1, p1u, p1v,
        mv0.reshape(bh, bw, 2), mv1.reshape(bh, bw, 2),
        jnp.int32(wt0), jnp.int32(wt1))
