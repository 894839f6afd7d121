"""Batched TPU motion estimation for the device encoder.

TPU-first redesign of the reference search (telescope + gradient +
sub-pel refinement, enc/encode_block.c:830-1016, SAD kernels
enc/enc_kernels.c:32-490): instead of per-block sequential searches,
every block of the frame advances through the same coarse-to-fine
schedule simultaneously:

  1. L2 (1/4 res): exhaustive +-8 displacement search as global-shift
     SAD maps (one lax.scan step per displacement; box-sum reductions
     produce the 16/32/64-block SAD surfaces simultaneously).
  2. L1 (1/2 res) and L0 (full res): +-2 windowed refinement. The
     per-block reference windows come from the banded roll-doubling
     gather (ops/windowed.py) - fully parallel rolls+selects, replacing
     the round-4 vmapped dynamic_slice forms that lowered to ~32K-step
     sequential XLA while-loops (~0.8 s/frame at 1080p).
  3. Quarter-pel: the full 7x7 quarter-pel neighbourhood evaluated
     exactly against the all-phase interpolation values, recomputed
     in-window from the gathered full-pel windows with the same f32
     tap accumulation as ops/jax_kernels.mc_phase_conv (integer-exact:
     all partial sums < 2^24), so the SADs are bit-identical to
     slicing the phase planes without ever indexing them per block.

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
from ..ops.windowed import banded_windows

PAD = JK.PAD_Y          # 96 (PADDING_Y, common/global.h:64)
L2_RANGE = 8            # +-8 quarter-res px = +-32 full-pel

# MV magnitude bounds per stage (quarter-res L2 result +-8 doubles per
# level, +-2 per refinement pass) - they size the banded strips.
M_L1 = 2 * L2_RANGE + 2          # 18
M_L0 = 2 * (2 * L2_RANGE + 2) + 2    # 38
M_SEL = M_L0 + 2                 # 40
M_SUB = M_SEL                    # 40 (subpel searches +-3 qpel only)


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


def _blocks4(plane, b, HB, WB):
    """[HB*b, WB*b] -> [HB, WB, b, b]."""
    return plane[:HB * b, :WB * b].reshape(HB, b, WB, b) \
        .transpose(0, 2, 1, 3)


def _offs(rr):
    return [(dy, dx)
            for dy in range(-rr, rr + 1)
            for dx in range(-rr, rr + 1)]


def _gather_windows(refp, padL, mvy, mvx, b, rr, M):
    """[HB, WB, b+2rr, b+2rr] windows at block origin + mv - rr, via
    the banded roll gather. mvy/mvx: [HB, WB] level-pixel MVs bounded
    by M - rr."""
    return banded_windows(refp, mvy - rr, mvx - rr, padL, padL, b,
                          b + 2 * rr, M)


def _argmin_offsets(win, ob, b, rr, cost_of):
    """Unrolled (2rr+1)^2-offset SAD/cost argmin over banded windows.
    win: [HB, WB, b+2rr, b+2rr]; ob: [HB, WB, b, b] int32. Ties keep
    the earliest offset (scan-order parity with round-4's
    _argmin_scan)."""
    HB, WB = win.shape[:2]
    best = jnp.full((HB, WB), 1 << 30, jnp.int32)
    bdy = jnp.zeros((HB, WB), jnp.int32)
    bdx = jnp.zeros((HB, WB), jnp.int32)
    for (dy, dx) in _offs(rr):
        w = win[:, :, dy + rr:dy + rr + b, dx + rr:dx + rr + b] \
            .astype(jnp.int32)
        sad = jnp.abs(ob - w).sum(axis=(2, 3))
        cost = cost_of(sad, dy + rr, dx + rr)
        better = cost < best
        best = jnp.where(better, cost, best)
        bdy = jnp.where(better, jnp.int32(dy + rr), bdy)
        bdx = jnp.where(better, jnp.int32(dx + rr), bdx)
    return best, bdy, bdx


def _refine_step(ob, refp, padL, mvy, mvx, b, rr, lam_me, qscale, M):
    """One +-rr refinement pass at integer pixels of the current level.
    ob: [HB, WB, b, b] int32; mv in level pixels; qscale converts level
    px -> quarter-pel for the rate term. Returns updated (mvy, mvx,
    cost), all [HB, WB]."""
    win = _gather_windows(refp, padL, mvy, mvx, b, rr, M)

    def cost_of(sad, dy, dx):
        rate = _mv_bits((mvx + dx - rr) * qscale, (mvy + dy - rr) * qscale)
        return sad + (lam_me * rate + 0.5).astype(jnp.int32)

    best, bdy, bdx = _argmin_offsets(win, ob, b, rr, cost_of)
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
    return _med3(left, up, upright)


def _refine_step_pred(ob, refp, mvy, mvx, b, rr, lam_me, py, px, M):
    """+-rr full-pel refinement with rate measured against the
    quarter-pel predictor (py, px) [HB, WB]."""
    win = _gather_windows(refp, PAD, mvy, mvx, b, rr, M)

    def cost_of(sad, dy, dx):
        rate = _mv_bits(4 * (mvx + dx - rr) - px,
                        4 * (mvy + dy - rr) - py)
        return sad + (lam_me * rate + 0.5).astype(jnp.int32)

    best, bdy, bdx = _argmin_offsets(win, ob, b, rr, cost_of)
    return mvy + bdy - rr, mvx + bdx - rr, best


def _subpel_step(ob, refp, lut, mvy, mvx, b, lam_me, py, px):
    """Exact 7x7 quarter-pel refinement.

    Computes the phase-plane values in-window: gathers [b+7, b+7]
    full-pel windows and accumulates the same f32 tap products as
    JK.mc_phase_conv (bit-identical - every partial sum is an integer
    < 2^24), so per candidate (qy, qx) the b x b prediction equals
    phases[p, base+oy : , base+ox :] without a per-block plane index.
    mv in full-pel, (py, px) predictor in quarter-pel; returns
    quarter-pel (mvy, mvx, cost), all [HB, WB].
    """
    HB, WB = mvy.shape
    w = b + 7
    # phases[p, Y, X] covers refpad rows Y..Y+5; the [16, b+2, b+2]
    # phase window at base_y = PAD - 2 + ty + mv - 1 therefore needs
    # refpad rows base_y .. base_y + b + 6.
    gf = banded_windows(refp, mvy, mvx, PAD - 3, PAD - 3, b, w,
                        M_SUB).astype(jnp.float32)

    lut_np = np.asarray(lut)
    pw = []
    for p in range(16):
        acc = jnp.zeros((HB, WB, b + 2, b + 2), jnp.float32)
        for m, n in zip(*np.nonzero(lut_np[p])):
            acc = acc + float(lut_np[p, m, n]) \
                * gf[:, :, m:m + b + 2, n:n + b + 2]
        v = jnp.floor((acc + 2048.0) / 4096.0)
        pw.append(jnp.clip(v, 0.0, 255.0).astype(jnp.int16))

    best = jnp.full((HB, WB), 1 << 30, jnp.int32)
    bq_y = jnp.zeros((HB, WB), jnp.int32)
    bq_x = jnp.zeros((HB, WB), jnp.int32)
    for qy in range(-3, 4):
        for qx in range(-3, 4):
            p = (qy & 3) * 4 + (qx & 3)
            ooy = 1 + (qy >> 2)
            oox = 1 + (qx >> 2)
            wv = pw[p][:, :, ooy:ooy + b, oox:oox + b].astype(jnp.int32)
            sad = jnp.abs(ob - wv).sum(axis=(2, 3))
            rate = _mv_bits(4 * mvx + qx - px, 4 * mvy + qy - py)
            cost = sad + (lam_me * rate + 0.5).astype(jnp.int32)
            better = cost < best
            best = jnp.where(better, cost, best)
            bq_y = jnp.where(better, jnp.int32(qy), bq_y)
            bq_x = jnp.where(better, jnp.int32(qx), bq_x)
    return 4 * mvy + bq_y, 4 * mvx + bq_x, best


def me_frame_body(H: int, W: int, R: int, seq_bipred: int = 0):
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
    lutY = JK.build_luma_mc_lut(seq_bipred)

    def f(org, refpad, phases, lam_me):
        del phases  # subpel recomputes phase values in-window
        o = org.astype(jnp.int32)
        r0 = refpad
        o1 = _down2(o)
        r1 = _down2(refpad.astype(jnp.int32)).astype(jnp.uint8)
        o2, r2 = _down2(o1), _down2(r1.astype(jnp.int32))
        # r1: [R, Hp/2, Wp/2] u8; r2: [R, Hp/4, Wp/4] int32
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
                mv2y = bdy[:, py][:, :, px]
                mv2x = bdx[:, py][:, :, px]
            else:
                HB, WB, (_, bdy, bdx) = grids[s]
                mv2y, mv2x = bdy, bdx
            N = HB * WB
            ob0 = _blocks4(o, s, HB, WB)
            ob1 = _blocks4(o1, s // 2, HB, WB)

            ref_mv = []
            for r in range(R):
                # L1: mv in half-res px (L2 px * 2), refine +-2
                m1y, m1x = 2 * mv2y[r], 2 * mv2x[r]
                m1y, m1x, _ = _refine_step(
                    ob1, r1[r], PAD // 2, m1y, m1x, s // 2, 2, lam_me,
                    8, M_L1)
                # L0: full-pel, refine +-2
                m0y, m0x = 2 * m1y, 2 * m1x
                m0y, m0x, cost0 = _refine_step(
                    ob0, r0[r], PAD, m0y, m0x, s, 2, lam_me, 4, M_L0)
                ref_mv.append((m0y, m0x, cost0))

            # best ref by full-pel cost + ~1 bit/ref-index penalty
            best = jnp.full((HB, WB), 1 << 30, jnp.int32)
            slot = jnp.zeros((HB, WB), jnp.int32)
            mfy = jnp.zeros((HB, WB), jnp.int32)
            mfx = jnp.zeros((HB, WB), jnp.int32)
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

            qy_all = jnp.zeros((HB, WB), jnp.int32)
            qx_all = jnp.zeros((HB, WB), jnp.int32)
            qc_all = jnp.full((HB, WB), 1 << 30, jnp.int32)
            per_ref = []
            for r, (m0y, m0x, _) in enumerate(ref_mv):
                m0y, m0x, _ = _refine_step_pred(
                    ob0, r0[r], m0y, m0x, s, 2, lam_me, py, px, M_SEL)
                qy, qx, qc = _subpel_step(
                    ob0, r0[r], lutY, m0y, m0x, s, lam_me, py, px)
                per_ref.append((qy, qx))
                sel = slot == r
                qy_all = jnp.where(sel, qy, qy_all)
                qx_all = jnp.where(sel, qx, qx_all)
                qc_all = jnp.where(sel, qc, qc_all)
            ref_y = jnp.stack([v[0].reshape(-1) for v in per_ref])
            ref_x = jnp.stack([v[1].reshape(-1) for v in per_ref])
            out[s] = (qy_all.reshape(-1), qx_all.reshape(-1),
                      slot.reshape(-1), qc_all.reshape(-1), ref_y, ref_x)
        return out

    return f


@lru_cache(maxsize=None)
def _me_frame_fn(H: int, W: int, R: int, seq_bipred: int = 0):
    """Jitted wrapper of me_frame_body."""
    return jax.jit(me_frame_body(H, W, R, seq_bipred))


def me_frame(org_y, refpad_stack, phases, lam_me, H, W, seq_bipred=0):
    """Host wrapper: run the jitted frame ME.

    org_y: [H, W] uint8; refpad_stack: [R, H+2*PAD, W+2*PAD] uint8;
    phases: unused (kept for call compatibility - the subpel stage
    recomputes phase values in-window).
    Returns {size: (mvy_qpel, mvx_qpel, slot, cost, ref_mvy, ref_mvx)}
    np arrays; ref_mvy/ref_mvx are the per-reference [R, N] best MVs.
    """
    R = refpad_stack.shape[0]
    fn = _me_frame_fn(H, W, R, seq_bipred)
    out = fn(jnp.asarray(org_y), jnp.asarray(refpad_stack), phases,
             jnp.float32(lam_me))
    # one batched fetch: 24 per-map blocking fetches each pay the
    # link RTT; device_get issues them concurrently
    return jax.device_get(out)
