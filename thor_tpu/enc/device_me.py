"""Batched TPU motion estimation for the device encoder.

TPU-first redesign of the reference search (telescope + gradient +
sub-pel refinement, enc/encode_block.c:830-1016, SAD kernels
enc/enc_kernels.c:32-490): instead of per-block sequential searches,
every block of the frame advances through the same coarse-to-fine
schedule simultaneously:

  1. L2 (1/4 res): exhaustive +-8 displacement search as global-shift
     SAD maps (one lax.scan step per displacement; box-sum reductions
     produce the 16/32/64-block SAD surfaces simultaneously).
  2. L1 (1/2 res) and L0 (full res): +-2 windowed refinement - one
     dynamic-slice gather of a (b+2r)^2 reference window per block,
     then dense shifted-slice SADs (VPU work, no further indirection).
  3. Quarter-pel: the full 7x7 quarter-pel neighbourhood evaluated
     exactly against the all-phase interpolation planes (the same
     planes the MC kernels consume), one [16, b+2, b+2] window gather
     per block.

Every stage adds the reference's lambda_me * mv-rate term
(quote_vlc table 10, enc/putvlc.c:133-229) with a zero predictor -
the exact per-block predictor is only known at emission time; the
final bitstream rate is always exact.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops import jax_kernels as JK

PAD = JK.PAD_Y          # 96 (PADDING_Y, common/global.h:64)
L2_RANGE = 8            # +-8 quarter-res px = +-32 full-pel


def _down2(p):
    """2x2 box downscale, (sum + 2) >> 2 (common/temporal_interp.c:151)."""
    h, w = p.shape[-2] // 2, p.shape[-1] // 2
    q = p.reshape(*p.shape[:-2], h, 2, w, 2)
    return (q.sum(axis=(-3, -1)) + 2) >> 2


def _mv_comp_bits(d):
    """Exact quote_vlc(10, 2|d|-(d<0)) code length (enc/putvlc.c:205):
    1 + 2*floor(log2(cn+1)), computed with frexp (f32-exact for the
    int range involved)."""
    cn = 2 * jnp.abs(d) - (d < 0).astype(jnp.int32)
    e = jnp.frexp((cn + 1).astype(jnp.float32))[1]
    return 1 + 2 * (e.astype(jnp.int32) - 1)


def _mv_bits(dx, dy):
    return _mv_comp_bits(dx) + _mv_comp_bits(dy)


def _blocks_of(plane, b, HB, WB):
    """[HB*b, WB*b] -> [HB*WB, b, b]."""
    return plane[:HB * b, :WB * b].reshape(HB, b, WB, b) \
        .transpose(0, 2, 1, 3).reshape(HB * WB, b, b)


def _refine_windows(refp, padL, ty, tx, mvy, mvx, b, rr):
    """Per-block (b+2rr)^2 windows at block origin + current MV - rr."""
    ys = padL + ty + mvy - rr
    xs = padL + tx + mvx - rr

    def g(y, x):
        return lax.dynamic_slice(refp, (y, x), (b + 2 * rr, b + 2 * rr))

    return jax.vmap(g)(ys, xs).astype(jnp.int32)


def _argmin_scan(win, ob, b, offsets, cost_of):
    """Scan an offset list over per-block windows: each step slices
    [N, b, b] at (dy, dx) inside the window and scores it. Keeps the
    compiled graph small (one SAD body) regardless of |offsets|."""
    N = ob.shape[0]

    def body(carry, d):
        best, bdy, bdx = carry
        dy, dx = d[0], d[1]
        w = lax.dynamic_slice(win, (0, dy, dx), (N, b, b))
        sad = jnp.abs(ob - w).sum(axis=(1, 2))
        cost = cost_of(sad, dy, dx)
        better = cost < best
        return (jnp.where(better, cost, best),
                jnp.where(better, dy, bdy),
                jnp.where(better, dx, bdx)), None

    init = (jnp.full((N,), 1 << 30, jnp.int32),
            jnp.zeros((N,), jnp.int32), jnp.zeros((N,), jnp.int32))
    (best, bdy, bdx), _ = lax.scan(body, init, jnp.asarray(offsets))
    return best, bdy, bdx


def _offs(rr):
    return np.array([(dy + rr, dx + rr)
                     for dy in range(-rr, rr + 1)
                     for dx in range(-rr, rr + 1)], np.int32)


def _refine_step(ob, refp, padL, ty, tx, mvy, mvx, b, rr, lam_me, qscale):
    """One +-rr refinement pass at integer pixels of the current level.
    mv in level pixels; qscale converts level px -> quarter-pel for the
    rate term. Returns updated (mvy, mvx)."""
    win = _refine_windows(refp, padL, ty, tx, mvy, mvx, b, rr)

    def cost_of(sad, dy, dx):
        rate = _mv_bits((mvx + dx - rr) * qscale, (mvy + dy - rr) * qscale)
        return sad + (lam_me * rate + 0.5).astype(jnp.int32)

    best, bdy, bdx = _argmin_scan(win, ob, b, _offs(rr), cost_of)
    return mvy + bdy - rr, mvx + bdx - rr, best


def _med3(a, b, c):
    return a + b + c - jnp.maximum(a, jnp.maximum(b, c)) \
        - jnp.minimum(a, jnp.minimum(b, c))


def _pred_field(mv, HB, WB):
    """Approximate per-block MV predictor: median of the left/up/
    up-right neighbours' current MVs (zero at frame edges). Stands in
    for get_mv_pred during the search; the emitted rate always uses
    the exact predictor."""
    g = mv.reshape(HB, WB)
    left = jnp.pad(g, ((0, 0), (1, 0)))[:, :WB]
    up = jnp.pad(g, ((1, 0), (0, 0)))[:HB]
    upright = jnp.pad(g, ((1, 0), (0, 1)))[:HB, 1:]
    return _med3(left, up, upright).reshape(-1)


def _refine_step_sel(ob, refstack, ty, tx, mvy, mvx, slot, b, rr,
                     lam_me, py, px):
    """Slot-selected +-rr full-pel refinement with rate measured
    against the quarter-pel predictor (py, px)."""
    ys = PAD + ty + mvy - rr
    xs = PAD + tx + mvx - rr

    def g(s_, y, x):
        return lax.dynamic_slice(refstack, (s_, y, x),
                                 (1, b + 2 * rr, b + 2 * rr))[0]

    win = jax.vmap(g)(slot, ys, xs).astype(jnp.int32)

    def cost_of(sad, dy, dx):
        rate = _mv_bits(4 * (mvx + dx - rr) - px,
                        4 * (mvy + dy - rr) - py)
        return sad + (lam_me * rate + 0.5).astype(jnp.int32)

    best, bdy, bdx = _argmin_scan(win, ob, b, _offs(rr), cost_of)
    return mvy + bdy - rr, mvx + bdx - rr, best


def _subpel_step(ob, phases_r, ty, tx, mvy, mvx, b, lam_me, py, px):
    """Exact 7x7 quarter-pel refinement against the all-phase planes.

    phases_r: [16, Hv, Wv] uint8 all-phase conv output for one
    reference (JK.mc_phase_conv semantics: value of pixel y with
    integer offset iv at phases[p, PAD + tap_lo + y + iv]).
    mv in full-pel, (py, px) predictor in quarter-pel; returns
    quarter-pel MV [N] pair.
    """
    base_y = PAD - 2 + ty + mvy - 1
    base_x = PAD - 2 + tx + mvx - 1

    def g(y, x):
        return lax.dynamic_slice(phases_r, (0, y, x), (16, b + 2, b + 2))

    win = jax.vmap(g)(base_y, base_x).astype(jnp.int32)
    N = ob.shape[0]
    cands = np.array(
        [((qy & 3) * 4 + (qx & 3), 1 + (qy >> 2), 1 + (qx >> 2), qy, qx)
         for qy in range(-3, 4) for qx in range(-3, 4)], np.int32)

    def body(carry, c):
        best, bq_y, bq_x = carry
        p, oy, ox, qy, qx = c[0], c[1], c[2], c[3], c[4]
        w = lax.dynamic_slice(win, (0, p, oy, ox), (N, 1, b, b))[:, 0]
        sad = jnp.abs(ob - w).sum(axis=(1, 2))
        rate = _mv_bits(4 * mvx + qx - px, 4 * mvy + qy - py)
        cost = sad + (lam_me * rate + 0.5).astype(jnp.int32)
        better = cost < best
        return (jnp.where(better, cost, best),
                jnp.where(better, qy, bq_y),
                jnp.where(better, qx, bq_x)), None

    init = (jnp.full((N,), 1 << 30, jnp.int32),
            jnp.zeros((N,), jnp.int32), jnp.zeros((N,), jnp.int32))
    (best, bq_y, bq_x), _ = lax.scan(body, init, jnp.asarray(cands))
    return 4 * mvy + bq_y, 4 * mvx + bq_x, best


def me_frame_body(H: int, W: int, R: int):
    """Un-jitted whole-frame ME body: per-size (8/16/32/64) per-block
    MV + best-ref selection. Returns dict of (mvy, mvx, slot, cost,
    ref_mvy, ref_mvx) per size with mv in quarter-pel units (sign
    convention: past reference, unfolded). Exposed so the fused device
    encoder can inline ME into its single measurement program."""
    HB16, WB16 = H // 16, W // 16
    HB32, WB32 = H // 32, W // 32
    HB64, WB64 = H // 64, W // 64
    HB8, WB8 = H // 8, W // 8
    H2c, W2c = HB16 * 4, WB16 * 4
    disps = np.array([(dy, dx) for dy in range(-L2_RANGE, L2_RANGE + 1)
                      for dx in range(-L2_RANGE, L2_RANGE + 1)], np.int32)

    def f(org, refpad, phases, lam_me):
        o = org.astype(jnp.int32)
        r0 = refpad.astype(jnp.int32)
        o1, r1 = _down2(o), _down2(r0)
        o2, r2 = _down2(o1), _down2(r1)
        o2c = o2[:H2c, :W2c]

        # --- L2 exhaustive global-shift search -------------------------
        def body(carry, d):
            dy, dx = d[0], d[1]
            win = lax.dynamic_slice(
                r2, (0, PAD // 4 + dy, PAD // 4 + dx), (R, H2c, W2c))
            ad = jnp.abs(o2c[None] - win)
            s16 = ad.reshape(R, HB16, 4, WB16, 4).sum(axis=(2, 4))
            s32 = s16[:, :HB32 * 2, :WB32 * 2] \
                .reshape(R, HB32, 2, WB32, 2).sum(axis=(2, 4))
            s64 = s32[:, :HB64 * 2, :WB64 * 2] \
                .reshape(R, HB64, 2, WB64, 2).sum(axis=(2, 4))
            rate = _mv_bits(16 * dx, 16 * dy)
            radd = (lam_me * rate + 0.5).astype(jnp.int32)
            out = []
            for (bests, bdy, bdx), s, sc in zip(
                    carry, (s16, s32, s64), (1, 4, 16)):
                cost = s + sc * radd
                better = cost < bests
                out.append((jnp.where(better, cost, bests),
                            jnp.where(better, dy, bdy),
                            jnp.where(better, dx, bdx)))
            return tuple(out), None

        def init(HB, WB):
            return (jnp.full((R, HB, WB), 1 << 30, jnp.int32),
                    jnp.zeros((R, HB, WB), jnp.int32),
                    jnp.zeros((R, HB, WB), jnp.int32))

        carry0 = (init(HB16, WB16), init(HB32, WB32), init(HB64, WB64))
        (c16, c32, c64), _ = lax.scan(body, carry0, jnp.asarray(disps))

        # --- L1 / L0 / quarter-pel refinement per size -----------------
        out = {}
        grids = {16: (HB16, WB16, c16), 32: (HB32, WB32, c32),
                 64: (HB64, WB64, c64)}
        # 8-blocks seed from their 16-parent.
        for s in (8, 16, 32, 64):
            if s == 8:
                HB, WB = HB8, WB8
                # parent L2 result, clipped for the bottom strip blocks
                # that have no full 16-parent
                py = jnp.minimum(jnp.arange(HB) // 2, HB16 - 1)
                px = jnp.minimum(jnp.arange(WB) // 2, WB16 - 1)
                _, bdy, bdx = c16
                mv2y = bdy[:, py][:, :, px].reshape(R, -1)
                mv2x = bdx[:, py][:, :, px].reshape(R, -1)
            else:
                HB, WB, (_, bdy, bdx) = grids[s]
                mv2y = bdy.reshape(R, -1)
                mv2x = bdx.reshape(R, -1)
            N = HB * WB
            ty = (jnp.arange(HB, dtype=jnp.int32)[:, None] * s) \
                .repeat(WB, 1).reshape(-1)
            tx = (jnp.arange(WB, dtype=jnp.int32)[None, :] * s) \
                .repeat(HB, 0).reshape(-1)
            ob0 = _blocks_of(o, s, HB, WB)
            ob1 = _blocks_of(o1, s // 2, HB, WB)

            ref_mv = []
            for r in range(R):
                # L1: mv in half-res px (L2 px * 2), refine +-2
                m1y, m1x = 2 * mv2y[r], 2 * mv2x[r]
                m1y, m1x, _ = _refine_step(
                    ob1, r1[r], PAD // 2, ty // 2, tx // 2, m1y, m1x,
                    s // 2, 2, lam_me, 8)
                # L0: full-pel, refine +-2
                m0y, m0x = 2 * m1y, 2 * m1x
                m0y, m0x, cost0 = _refine_step(
                    ob0, r0[r], PAD, ty, tx, m0y, m0x, s, 2, lam_me, 4)
                ref_mv.append((m0y, m0x, cost0))

            # best ref by full-pel cost + ~1 bit/ref-index penalty
            best = jnp.full((N,), 1 << 30, jnp.int32)
            slot = jnp.zeros((N,), jnp.int32)
            mfy = jnp.zeros((N,), jnp.int32)
            mfx = jnp.zeros((N,), jnp.int32)
            for r, (m0y, m0x, cost0) in enumerate(ref_mv):
                cost = cost0 + (lam_me * r + 0.5).astype(jnp.int32)
                better = cost < best
                best = jnp.where(better, cost, best)
                slot = jnp.where(better, r, slot)
                mfy = jnp.where(better, m0y, mfy)
                mfx = jnp.where(better, m0x, mfx)

            # predictor-aware pass: re-refine +-2 full-pel with rate
            # against the approximate median predictor, then exact
            # quarter-pel - per reference, so every ref's best MV is
            # available (the bipred variants pair per-ref MVs the way
            # the reference's iterative 2-list search does,
            # enc/encode_block.c:2047-2200). Rate-blind MVs are noisy
            # in flat regions, which both wastes MV bits and degrades
            # the chroma prediction riding on the luma MVs.
            py = 4 * _pred_field(mfy, HB, WB)
            px = 4 * _pred_field(mfx, HB, WB)

            qy_all = jnp.zeros((N,), jnp.int32)
            qx_all = jnp.zeros((N,), jnp.int32)
            qc_all = jnp.full((N,), 1 << 30, jnp.int32)
            per_ref = []
            for r, (m0y, m0x, _) in enumerate(ref_mv):
                m0y, m0x, _ = _refine_step_sel(
                    ob0, r0, ty, tx, m0y, m0x,
                    jnp.full((N,), r, jnp.int32), s, 2, lam_me, py, px)
                qy, qx, qc = _subpel_step(
                    ob0, phases[r], ty, tx, m0y, m0x, s, lam_me, py, px)
                per_ref.append((qy, qx))
                sel = slot == r
                qy_all = jnp.where(sel, qy, qy_all)
                qx_all = jnp.where(sel, qx, qx_all)
                qc_all = jnp.where(sel, qc, qc_all)
            ref_y = jnp.stack([v[0] for v in per_ref])
            ref_x = jnp.stack([v[1] for v in per_ref])
            out[s] = (qy_all, qx_all, slot, qc_all, ref_y, ref_x)
        return out

    return f


@lru_cache(maxsize=None)
def _me_frame_fn(H: int, W: int, R: int):
    """Jitted wrapper of me_frame_body."""
    return jax.jit(me_frame_body(H, W, R))


def me_frame(org_y, refpad_stack, phases, lam_me, H, W):
    """Host wrapper: run the jitted frame ME.

    org_y: [H, W] uint8; refpad_stack: [R, H+2*PAD, W+2*PAD] uint8;
    phases: [R, 16, Hv, Wv] uint8 all-phase planes (uni/bi filter set
    chosen by the caller to match the sequence).
    Returns {size: (mvy_qpel, mvx_qpel, slot, cost, ref_mvy, ref_mvx)}
    np arrays; ref_mvy/ref_mvx are the per-reference [R, N] best MVs.
    """
    R = refpad_stack.shape[0]
    fn = _me_frame_fn(H, W, R)
    out = fn(jnp.asarray(org_y), jnp.asarray(refpad_stack), phases,
             jnp.float32(lam_me))
    # one batched fetch: 24 per-map blocking fetches each pay the
    # link RTT; device_get issues them concurrently
    return jax.device_get(out)
