"""Batched TPU inter-frame (P) encoder.

TPU-first decomposition of the reference's per-block RDO
(enc/encode_block.c:2204-2479 and the ME at :830-1016): all
measurements run as whole-frame batched device programs, the
sequential part is reduced to a cheap host walk over precomputed cost
maps, and the final reconstruction is produced by the decoder's own
batched device program - so the encoder's reference frames are
decoder-exact by construction.

Pipeline per P-frame:
 1. all-phase interpolation planes for every reference (shared by ME,
    trial coding and final reconstruction).
 2. device ME (device_me): per-block MV + best ref for sizes 8..64,
    plus each reference's own best MV (feeding the bipred pairs).
 3. device trial coding per size at K motion variants (ME MV,
    left/up-right neighbour MVs, zero MV per ref, and - on
    bipred-enabled frames - bipred pairs from the per-ref ME, their
    neighbours and zero-zero): MC -> residual -> transform ->
    quantize -> reconstruct; exact SSD + exact coeff bits per
    (variant, block).
 4. host decision walk (raster/quadtree order, mirroring
    process_block's bottom-up recursion): derives the exact
    skip/merge candidates and MV predictors from the evolving
    side-info map and picks SKIP / MERGE / INTER / BIPRED / INTRA
    per leaf by matching candidates against the measured variants
    (bi candidates match on both lists).
 5. device final reconstruction: whole-frame MC with the decided
    per-cell MV fields (two lists + bi mask) + residual scatter of
    the chosen coefficients + exact intra scan for intra leaves.
 6. host syntax emission through the exact bitstream writers.

The toolset is restricted (PART_NONE, tb_split=0, non-RDOQ
quantization); every emitted stream is fully valid Thor syntax.
"""

from __future__ import annotations

import functools
import os
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..codec.constants import (
    CHROMA_QP, GDEQUANT_TABLE, MODE_SKIP, MODE_INTER, MODE_INTRA,
    MODE_MERGE, MODE_BIPRED, MIN_BLOCK_SIZE, MAX_BLOCK_SIZE,
    zigzag_for)
from ..codec.blockdata import (
    find_block_contexts, get_mv_pred, get_mv_skip)
from ..ops import jax_kernels as JK
from ..ops.banded_mc import mc_pred_banded, M_LUMA, M_CHROMA
from ..ops.coeff_bits import coeff_bits_batch
from ..bitstream.writer import quote_vlc
from .inter import quote_mv_bits
from .syntax import write_block, write_super_mode
from . import device_me as DM
from ..utils.tracing import StageTimer

PAD = JK.PAD_Y
PAD_C = JK.PAD_C
SIZES = (8, 16, 32, 64)

#: per-stage wall clock of the device P-frame pipeline (read/reset by
#: profiling callers; .report() prints the breakdown)
TIMER = StageTimer()


# ---------------------------------------------------------------------------
# Device programs
# ---------------------------------------------------------------------------

def _blocks_of(plane, b, HB, WB):
    return plane[:HB * b, :WB * b].reshape(HB, b, WB, b) \
        .transpose(0, 2, 1, 3).reshape(HB * WB, b, b)


def _recon_blocks(pred, q, s, qp):
    """Exact dequant + inverse transform + reconstruct for [N, s, s]
    blocks (mirrors the decoder: common/common_block.c:132-156,
    common/transform.c:432-518). qp may be a traced int32 scalar."""
    qp = jnp.asarray(qp, jnp.int32)
    rsh = int(np.log2(s)) - 1
    fac = jnp.left_shift(
        jnp.asarray(np.asarray(GDEQUANT_TABLE, np.int32))[qp % 6],
        qp // 6)
    rc = jnp.clip((q.astype(jnp.int32) * fac + (1 << (rsh - 1))) >> rsh,
                  -32768, 32767).astype(jnp.int16)
    if s == 64:
        rr = JK.idct_batch(rc[:, :32, :32], 32)
        rr = jnp.repeat(jnp.repeat(rr, 2, axis=1), 2, axis=2)
    else:
        rr = JK.idct_batch(rc, s)
    return jnp.clip(pred + rr, 0, 255)


@lru_cache(maxsize=None)
def _trial_fn(H: int, W: int, s: int, fastY: bool, fastC: bool,
              has_bi: bool = False, tb: bool = False,
              fastY2: bool = False, seq_bipred: int = 0):
    """Jitted per-size trial coding of every full block at K motion
    variants (ME MV, neighbour MVs, zero MV per ref, and - on bipred
    frames - bipred pairs; the candidate set the skip/merge derivation
    can produce plus the explicit INTER/BIPRED searches): per
    (variant, block) coded/zero SSDs (Y+U+V), exact coeff bits, cbp
    flags and the quantized coefficients (device-resident). qpY/qpC
    are traced, so one compile covers the whole GOP QP cascade.

    Variants are stream-domain 7-tuples (mvy0, mvx0, slot0, mvy1,
    mvx1, slot1, bi); bi != 0 averages the two prediction lists like
    the decoder (dec/decode_block.c:394-447).

    With tb=True (sizes > 8 on tb_split-enabled configs) each variant
    is additionally coded with the transform split into four s/2
    quadrants (enc/encode_block.c:1469-1532 tb branch): per-quadrant
    cbp masks (bit 3-k), quadrant-selective SSD and coded coeff bits,
    plus the quadrant-layout quantized banks."""
    Hc, Wc = H // 2, W // 2
    H4, W4 = H // 4, W // 4
    HB, WB = H // s, W // s
    sc = s // 2
    cpb = s // 4
    zzy = zigzag_for(min(s, 16))
    zzc = zigzag_for(min(sc, 16))
    if tb:
        zzy2 = zigzag_for(min(s // 2, 16))
        zzc2 = zigzag_for(min(sc // 2, 16))
    lutY = JK.build_luma_mc_lut(seq_bipred)
    lutC = JK.build_chroma_mc_lut()

    def f(orgY, orgU, orgV, refY, refU, refV, mvy0, mvx0, slot0,
          mvy1, mvx1, slot1, bi, qpY, qpC, sign_uni, sign_bi):
        def gather3(mvyk, mvxk, slotk):
            """Banded in-window MC (bit-exact with the round-4 phase
            conv + gather pair; ops/banded_mc.py) - returns block-form
            [N, b, b] predictions."""
            m2 = lambda a: a.reshape(HB, WB)
            sl = m2(slotk)
            pY = mc_pred_banded(refY, sl, m2(mvyk), m2(mvxk), lutY,
                                PAD, 2, s, -2, M_LUMA)
            pU = mc_pred_banded(refU, sl, m2(mvyk), m2(mvxk), lutC,
                                PAD_C, 3, sc, -1, M_CHROMA)
            pV = mc_pred_banded(refV, sl, m2(mvyk), m2(mvxk), lutC,
                                PAD_C, 3, sc, -1, M_CHROMA)
            return (pY.reshape(-1, s, s), pU.reshape(-1, sc, sc),
                    pV.reshape(-1, sc, sc))

        def one(mvy0k, mvx0k, slot0k, mvy1k, mvx1k, slot1k, bik):
            # stream-domain MVs fold toward future references exactly
            # like the decoder (native_inputs: sign0 = bi ? fnum >= cur
            # : fnum > cur; sign1 = fnum >= cur)
            bflag = bik != 0
            sg0 = jnp.where(bflag, sign_bi[slot0k],
                            sign_uni[slot0k]) != 0
            predY, predU, predV = gather3(
                jnp.where(sg0, -mvy0k, mvy0k),
                jnp.where(sg0, -mvx0k, mvx0k), slot0k)
            if has_bi:
                sg1 = sign_bi[slot1k] != 0
                pY1, pU1, pV1 = gather3(
                    jnp.where(sg1, -mvy1k, mvy1k),
                    jnp.where(sg1, -mvx1k, mvx1k), slot1k)
                bY = bflag[:, None, None]
                predY = jnp.where(bY, (predY + pY1) >> 1, predY)
                predU = jnp.where(bY, (predU + pU1) >> 1, predU)
                predV = jnp.where(bY, (predV + pV1) >> 1, predV)

            def plane_trial(org, pred, b, qp, zz, fast, chroma):
                ob = _blocks_of(org.astype(jnp.int32), b, HB, WB)
                pb = pred
                resid = ob - pb
                coeff = JK.fwd_transform_batch(resid, b, fast)
                q, cbp = JK.quantize_fwd_batch(coeff, qp, b, False, zz,
                                               chroma)
                rec = _recon_blocks(pb, q, b, qp)
                ssd_c = ((ob - rec) ** 2).sum(axis=(1, 2))
                ssd_p = (resid ** 2).sum(axis=(1, 2))
                bits = coeff_bits_batch(q, b, False, chroma)
                return q, cbp, ssd_c, ssd_p, bits

            qy, cbpy, scy, spy, by = plane_trial(orgY, predY, s, qpY,
                                                 zzy, fastY, False)
            qu, cbpu, scu, spu, bu = plane_trial(orgU, predU, sc, qpC,
                                                 zzc, fastC, True)
            qv, cbpv, scv, spv, bv = plane_trial(orgV, predV, sc, qpC,
                                                 zzc, fastC, True)
            # a coded block carries only the planes with cbp set
            ssd_c = (jnp.where(cbpy, scy, spy)
                     + jnp.where(cbpu, scu, spu)
                     + jnp.where(cbpv, scv, spv))
            out = dict(
                qy=qy, qu=qu, qv=qv,
                cbp_y=cbpy, cbp_u=cbpu, cbp_v=cbpv,
                ssd_coded=ssd_c, ssd_pred=spy + spu + spv,
                bits=(jnp.where(cbpy, by, 0) + jnp.where(cbpu, bu, 0)
                      + jnp.where(cbpv, bv, 0)))

            if tb:
                def plane_trial_tb(org, pred, b, qp, zzs, fast_sub,
                                   chroma):
                    b2 = b // 2
                    ob = _blocks_of(org.astype(jnp.int32), b, HB, WB)
                    pb = pred
                    # quadrant-major [4N, b2, b2], k = 2*qi + qj
                    oq = ob.reshape(-1, 2, b2, 2, b2) \
                        .transpose(0, 1, 3, 2, 4).reshape(-1, b2, b2)
                    pq = pb.reshape(-1, 2, b2, 2, b2) \
                        .transpose(0, 1, 3, 2, 4).reshape(-1, b2, b2)
                    resid = oq - pq
                    coeff = JK.fwd_transform_batch(resid, b2, fast_sub)
                    q, cq = JK.quantize_fwd_batch(coeff, qp, b2, False,
                                                  zzs, chroma)
                    rec = _recon_blocks(pq, q, b2, qp)
                    ssd_c = ((oq - rec) ** 2).sum(axis=(1, 2))
                    ssd_p = (resid ** 2).sum(axis=(1, 2))
                    bq = coeff_bits_batch(q, b2, False, chroma)
                    cq = cq.reshape(-1, 4)
                    ssd = jnp.where(cq, ssd_c.reshape(-1, 4),
                                    ssd_p.reshape(-1, 4)).sum(1)
                    bits = jnp.where(cq, bq.reshape(-1, 4), 0).sum(1)
                    # writer bit order: quadrant k at bit (3-k)
                    mask = (cq.astype(jnp.int32)
                            * jnp.asarray([8, 4, 2, 1],
                                          jnp.int32)[None, :]).sum(1)
                    q_sp = q.reshape(-1, 2, 2, b2, b2) \
                        .transpose(0, 1, 3, 2, 4).reshape(-1, b, b)
                    return q_sp, mask, ssd, bits

                qty, cty, sty, bty = plane_trial_tb(
                    orgY, predY, s, qpY, zzy2, fastY2, False)
                qtu, ctu, stu, btu = plane_trial_tb(
                    orgU, predU, sc, qpC, zzc2, fastC, True)
                qtv, ctv, stv, btv = plane_trial_tb(
                    orgV, predV, sc, qpC, zzc2, fastC, True)
                out.update(
                    qy_tb=qty, qu_tb=qtu, qv_tb=qtv,
                    cbp_tb_y=cty, cbp_tb_u=ctu, cbp_tb_v=ctv,
                    ssd_tb=sty + stu + stv, bits_tb=bty + btu + btv)
            return out

        # python loop, not vmap: under vmap every roll/select pass of
        # the banded gather materializes the [K, HB, Hs, WB, wX]
        # im2col tensor (~12 GB at 4K, ~3 GB at 1080p - HBM OOM /
        # bandwidth waste); sequential variants peak at one tensor
        K = mvy0.shape[0]
        outs = [one(mvy0[k], mvx0[k], slot0[k], mvy1[k], mvx1[k],
                    slot1[k], bi[k]) for k in range(K)]
        return {key: jnp.stack([o[key] for o in outs])
                for key in outs[0]}

    return jax.jit(f)


@lru_cache(maxsize=None)
def _measure_fn(H: int, W: int, R: int, has_bi: bool, bslot0: int,
                bslot1: int, seq_bipred: int):
    """ONE jitted measurement program: whole-frame ME, stream-domain
    sign folding and per-size motion variant construction (ME MV,
    left / up-right neighbour MVs, zero MV per ref, bipred pairs) -
    everything between the org/ref upload and the per-size trial
    coding, with no host round trip.

    Round 5: the all-phase interpolation planes are gone - ME's
    sub-pel stage and every MC consumer interpolate in-window from the
    reference planes (ops/banded_mc.py), killing both the ~85 MB/ref
    conv and the per-pixel phase gathers the xplane profile showed
    dominating the frame."""
    me_body = DM.me_frame_body(H, W, R, seq_bipred)

    def f(orgY, refY, refU, refV, sign, sign_bi, lam_me):
        me = me_body(orgY, refY, None, lam_me)
        variants = {}
        for s in SIZES:
            HB, WB = H // s, W // s
            qy, qx, slot, _, ry, rx = me[s]
            # ME searches the reference planes directly (visual MVs);
            # fold to the stream domain: uni MVs by their chosen
            # slot's sign, per-ref MVs by their own slot's BIPRED sign
            # (they only feed bipred variants).
            sg = sign[slot] != 0
            mvy = jnp.where(sg, -qy, qy)
            mvx = jnp.where(sg, -qx, qx)
            sgb = sign_bi[:, None] != 0
            ry = jnp.where(sgb, -ry, ry)
            rx = jnp.where(sgb, -rx, rx)

            def neigh(a, di, dj):
                """(di, dj)-offset neighbour block value (zero at
                frame edges)."""
                g = a.reshape(HB, WB)
                out = jnp.zeros_like(g)
                rs = slice(max(di, 0), HB + min(di, 0))
                cs = slice(max(dj, 0), WB + min(dj, 0))
                rsrc = slice(max(-di, 0), HB + min(-di, 0))
                csrc = slice(max(-dj, 0), WB + min(-dj, 0))
                out = out.at[rs, cs].set(g[rsrc, csrc])
                return out.reshape(-1)

            var_y = [mvy, neigh(mvy, 0, 1), neigh(mvy, 1, -1)]
            var_x = [mvx, neigh(mvx, 0, 1), neigh(mvx, 1, -1)]
            var_s = [slot, neigh(slot, 0, 1), neigh(slot, 1, -1)]
            zero = jnp.zeros_like(mvy)
            for r in range(R):
                var_y.append(zero)
                var_x.append(zero)
                var_s.append(jnp.full_like(slot, r))
            K_uni = len(var_y)
            var_y1 = [zero] * K_uni
            var_x1 = [zero] * K_uni
            var_s1 = [zero] * K_uni
            var_bi = [zero] * K_uni
            if has_bi:
                one = jnp.ones_like(mvy)
                # bi pair from the per-ref ME (approximates the
                # converged iterative 2-list search), its neighbours
                # (skip/merge candidates propagate decided bi pairs),
                # and zero-zero
                bpairs = [
                    (ry[bslot0], rx[bslot0], ry[bslot1], rx[bslot1]),
                    (neigh(ry[bslot0], 0, 1), neigh(rx[bslot0], 0, 1),
                     neigh(ry[bslot1], 0, 1), neigh(rx[bslot1], 0, 1)),
                    (neigh(ry[bslot0], 1, -1), neigh(rx[bslot0], 1, -1),
                     neigh(ry[bslot1], 1, -1), neigh(rx[bslot1], 1, -1)),
                    (zero, zero, zero, zero),
                ]
                for (y0v, x0v, y1v, x1v) in bpairs:
                    var_y.append(y0v)
                    var_x.append(x0v)
                    var_s.append(jnp.full_like(slot, bslot0))
                    var_y1.append(y1v)
                    var_x1.append(x1v)
                    var_s1.append(jnp.full_like(slot, bslot1))
                    var_bi.append(one)
            variants[s] = {
                'mvy': jnp.stack(var_y), 'mvx': jnp.stack(var_x),
                'slot': jnp.stack(var_s), 'mvy1': jnp.stack(var_y1),
                'mvx1': jnp.stack(var_x1), 'slot1': jnp.stack(var_s1),
                'bi': jnp.stack(var_bi)}
        return variants

    return jax.jit(f)


@lru_cache(maxsize=None)
def _measure_all_fn(H: int, W: int, R: int, has_bi: bool, bslot0: int,
                    bslot1: int, seq_bipred: int, tb_split: int,
                    speed: int, nmodes: int):
    """ONE jitted program for the whole measurement half: ME +
    variants + all four per-size trials + the intra mode search.

    Round-4 dispatched ~15 separate jitted calls per frame; through
    the tunnel each enqueue pays real latency, and the xplane gap
    between device time (~0.39 s) and wall (~0.62 s) was mostly this
    dispatch overhead. One program also lets XLA share subexpressions
    (org block tiling, ref slicing) across stages."""
    from .device_intra import search_intra_frame_device
    fast32 = speed > 1
    fast64 = speed > 0
    mf = _measure_fn(H, W, R, has_bi, bslot0, bslot1, seq_bipred)

    def f(org_y_d, org_u_d, org_v_d, refY_d, refU_d, refV_d, sign_d,
          sign_bi_d, lam_me, qpY, qpC, lam):
        variants = mf(org_y_d, refY_d, refU_d, refV_d, sign_d,
                      sign_bi_d, lam_me)
        trials_dev = {}
        for s in SIZES:
            v = variants[s]
            fastY = (s == 64 and fast64) or fast32
            tb_s = tb_split == 1 and s > 8
            fastY2 = s == 64 or fast32
            trials_dev[s] = _trial_fn(H, W, s, fastY, fast32, has_bi,
                                      tb_s, fastY2, seq_bipred)(
                org_y_d, org_u_d, org_v_d, refY_d, refU_d, refV_d,
                v['mvy'], v['mvx'], v['slot'], v['mvy1'], v['mvx1'],
                v['slot1'], v['bi'], qpY, qpC, sign_d, sign_bi_d)
        intra_dev = search_intra_frame_device(
            org_y_d, org_u_d, org_v_d, qpY, qpC, lam, W, H, fast32,
            nmodes, intra_quant=False)
        return variants, trials_dev, intra_dev

    return jax.jit(f)


@lru_cache(maxsize=None)
def _pack_out_fn(H: int, W: int):
    """[3H/2, W] uint8 packed recon (Y on top, U|V below) for a single
    device->host fetch."""
    def f(y, u, v):
        return jnp.concatenate(
            [y.astype(jnp.uint8),
             jnp.concatenate([u.astype(jnp.uint8),
                              v.astype(jnp.uint8)], axis=1)], axis=0)
    return jax.jit(f)


@lru_cache(maxsize=None)
def _final_mc_fn(H: int, W: int, has_bi: bool = False,
                 seq_bipred: int = 0):
    """Jitted final reconstruction stage 1: whole-frame MC with the
    decided per-cell MV field + dense per-size residual planes
    (exactly the decoder's math, dec/reconstruct_jax.py).

    Round 5: the MC half runs per LEAF-SIZE class through the banded
    in-window interpolator (ops/banded_mc.py) - the decided MV field
    is block-constant within each leaf, so each size's prediction is
    one banded pass and the four size classes combine under the
    per-cell leaf-size mask. This replaced the per-pixel whole-frame
    phase gathers (~17-35 ms each on the xplane profile).

    Every block position of every size is dequant+IDCT'd - blocks not
    chosen as coded leaves at that size carry zeroed coefficients and
    contribute nothing - so the compiled program depends only on the
    frame geometry (one compile per resolution, none of the per-frame
    coded-leaf-count buckets the previous scatter design needed), and
    the residual placement is a pure reshape instead of a scatter."""
    Hc, Wc = H // 2, W // 2
    # numpy, not jnp: this builder may first run INSIDE another
    # function's trace (_final_all), and a jnp constant created there
    # would be a tracer captured by the lru-cached closure
    dq_np = np.asarray(GDEQUANT_TABLE, np.int32)
    lutY = JK.build_luma_mc_lut(seq_bipred)
    lutC = JK.build_chroma_mc_lut()

    def dense_add(r, q, cb, s, sy, fac, HH, WW):
        """Add the [N, sy, sy] coeff blocks' residuals (masked by cb)
        into the [HH, WW] plane at their raster-grid positions."""
        HB, WB = HH // s, WW // s
        N = HB * WB
        # dequant shift follows the BLOCK size (64-blocks dequantize
        # with shift 5 although their transform is 32x32 -
        # common/common_block.c:132-146)
        sh = int(np.log2(s)) - 1
        q = jnp.where(cb[:, None, None], q, 0)
        vals = JK.residual_group(
            q, jnp.broadcast_to(fac, (N,)),
            jnp.full((N,), 1 << (sh - 1), jnp.int32),
            jnp.full((N,), sh, jnp.int32), sy)
        if sy != s:
            vals = jnp.repeat(jnp.repeat(vals, 2, axis=1), 2, axis=2)
        d = vals.reshape(HB, WB, s, s).transpose(0, 2, 1, 3) \
            .reshape(HB * s, WB * s)
        return r.at[:HB * s, :WB * s].add(d)

    def f(refY, refU, refV, size_cells, mvxc, mvyc, slc, mvx1c, mvy1c,
          sl1c, bic, trials, qpY, qpC):
        mvxc = mvxc.astype(jnp.int32)
        mvyc = mvyc.astype(jnp.int32)
        slc = slc.astype(jnp.int32)
        mvx1c = mvx1c.astype(jnp.int32)
        mvy1c = mvy1c.astype(jnp.int32)
        sl1c = sl1c.astype(jnp.int32)
        bic = bic.astype(jnp.int32)
        size_cells = size_cells.astype(jnp.int32)
        pY = jnp.zeros((H, W), jnp.int32)
        pU = jnp.zeros((Hc, Wc), jnp.int32)
        pV = jnp.zeros((Hc, Wc), jnp.int32)
        for s in SIZES:
            HB, WB = H // s, W // s
            if HB == 0 or WB == 0:
                continue
            cs = s // 4
            sc_ = s // 2

            def sub(a):
                return a[::cs, ::cs][:HB, :WB]

            mb = sub(size_cells) == s
            my, mx, sl = sub(mvyc), sub(mvxc), sub(slc)
            bY = mc_pred_banded(refY, sl, my, mx, lutY, PAD, 2, s, -2,
                                M_LUMA)
            bU = mc_pred_banded(refU, sl, my, mx, lutC, PAD_C, 3, sc_,
                                -1, M_CHROMA)
            bV = mc_pred_banded(refV, sl, my, mx, lutC, PAD_C, 3, sc_,
                                -1, M_CHROMA)
            if has_bi:
                bi_b = sub(bic) != 0
                my1, mx1, sl1 = sub(mvy1c), sub(mvx1c), sub(sl1c)
                bY1 = mc_pred_banded(refY, sl1, my1, mx1, lutY, PAD, 2,
                                     s, -2, M_LUMA)
                bU1 = mc_pred_banded(refU, sl1, my1, mx1, lutC, PAD_C,
                                     3, sc_, -1, M_CHROMA)
                bV1 = mc_pred_banded(refV, sl1, my1, mx1, lutC, PAD_C,
                                     3, sc_, -1, M_CHROMA)
                bm = bi_b[:, :, None, None]
                bY = jnp.where(bm, (bY + bY1) >> 1, bY)
                bU = jnp.where(bm, (bU + bU1) >> 1, bU)
                bV = jnp.where(bm, (bV + bV1) >> 1, bV)

            def plane_of(blocks, b):
                return blocks.transpose(0, 2, 1, 3) \
                    .reshape(HB * b, WB * b)

            mbY = jnp.repeat(jnp.repeat(mb, s, 0), s, 1)
            mbC = jnp.repeat(jnp.repeat(mb, sc_, 0), sc_, 1)
            pY = pY.at[:HB * s, :WB * s].set(
                jnp.where(mbY, plane_of(bY, s), pY[:HB * s, :WB * s]))
            pU = pU.at[:HB * sc_, :WB * sc_].set(
                jnp.where(mbC, plane_of(bU, sc_),
                          pU[:HB * sc_, :WB * sc_]))
            pV = pV.at[:HB * sc_, :WB * sc_].set(
                jnp.where(mbC, plane_of(bV, sc_),
                          pV[:HB * sc_, :WB * sc_]))
        dq = jnp.asarray(dq_np)
        facY = jnp.left_shift(dq[qpY % 6], qpY // 6)
        facC = jnp.left_shift(dq[qpC % 6], qpC // 6)
        rY = jnp.zeros((H, W), jnp.int32)
        rU = jnp.zeros((Hc, Wc), jnp.int32)
        rV = jnp.zeros((Hc, Wc), jnp.int32)
        def quads_of(q, b2):
            """[N, 2*b2, 2*b2] quadrant-layout banks -> [4N, b2, b2]
            in (block, k=2*qi+qj) order."""
            return q.reshape(-1, 2, b2, 2, b2) \
                .transpose(0, 1, 3, 2, 4).reshape(-1, b2, b2)

        def quad_cb(msk, mtb):
            """Per-block 4-bit quadrant cbp masks (bit 3-k) -> [4N]
            bool in (block, k) order, gated by mtb."""
            cb = ((msk[:, None] >> jnp.asarray([3, 2, 1, 0],
                                               jnp.int32)) & 1) != 0
            return (cb & mtb[:, None]).reshape(-1)

        def quad_rows(HB, WB, HH, WW, b2):
            """Half-size-grid row index of each (block, k) quadrant
            (the s-grid does not cover the full b2-grid at non-multiple
            frame edges, so quadrants scatter at explicit rows)."""
            WB2 = -(-WW // b2)
            by, bx = np.meshgrid(np.arange(HB), np.arange(WB),
                                 indexing='ij')
            qi, qj = np.meshgrid(np.arange(2), np.arange(2),
                                 indexing='ij')
            rows = ((by[:, :, None, None] * 2 + qi) * WB2
                    + bx[:, :, None, None] * 2 + qj)
            return jnp.asarray(rows.reshape(-1).astype(np.int32))

        def dense_add_at(r, q, cb, rows, b2, fac, HH, WW):
            """dense_add at explicit half-size-grid rows (ceil grid,
            cropped to the frame)."""
            HB2, WB2 = -(-HH // b2), -(-WW // b2)
            M = q.shape[0]
            sh = int(np.log2(b2)) - 1
            q = jnp.where(cb[:, None, None], q, 0)
            vals = JK.residual_group(
                q, jnp.broadcast_to(fac, (M,)),
                jnp.full((M,), 1 << (sh - 1), jnp.int32),
                jnp.full((M,), sh, jnp.int32), b2)
            bank = jnp.zeros((HB2 * WB2, b2 * b2), vals.dtype)
            bank = bank.at[rows].add(vals.reshape(M, -1))
            d = bank.reshape(HB2, WB2, b2, b2).transpose(0, 2, 1, 3) \
                .reshape(HB2 * b2, WB2 * b2)[:HH, :WW]
            return r + d

        for s in SIZES:
            t = trials[s]
            HB, WB = H // s, W // s
            if HB == 0 or WB == 0:
                continue
            ar = jnp.arange(HB * WB)
            k, m = t['k'], t['m']
            qy = t['qy'][k, ar]
            if s == 64:
                qy = qy[:, :32, :32]
            sc = s // 2
            rY = dense_add(rY, qy, t['cbp_y'][k, ar] & m, s,
                           32 if s == 64 else s, facY, H, W)
            rU = dense_add(rU, t['qu'][k, ar], t['cbp_u'][k, ar] & m,
                           sc, sc, facC, Hc, Wc)
            rV = dense_add(rV, t['qv'][k, ar], t['cbp_v'][k, ar] & m,
                           sc, sc, facC, Hc, Wc)
            if 'qy_tb' in t:
                # tb-split leaves: four real s/2 (chroma s/4)
                # transforms per block at the half-size grid
                s2, sc2 = s // 2, sc // 2
                mtb = t['mtb']
                rY = dense_add_at(
                    rY, quads_of(t['qy_tb'][k, ar], s2),
                    quad_cb(t['cbp_tb_y'][k, ar], mtb),
                    quad_rows(HB, WB, H, W, s2), s2, facY, H, W)
                rU = dense_add_at(
                    rU, quads_of(t['qu_tb'][k, ar], sc2),
                    quad_cb(t['cbp_tb_u'][k, ar], mtb),
                    quad_rows(HB, WB, Hc, Wc, sc2), sc2, facC, Hc, Wc)
                rV = dense_add_at(
                    rV, quads_of(t['qv_tb'][k, ar], sc2),
                    quad_cb(t['cbp_tb_v'][k, ar], mtb),
                    quad_rows(HB, WB, Hc, Wc, sc2), sc2, facC, Hc, Wc)
        y = jnp.clip(pY + rY, 0, 255)
        u = jnp.clip(pU + rU, 0, 255)
        v = jnp.clip(pV + rV, 0, 255)
        return y, u, v

    return jax.jit(f)


@lru_cache(maxsize=None)
def _filter_fn(H: int, W: int, deblocking: bool, clpf: bool):
    """Jitted in-loop filter + output stage: deblock, CLPF decision
    (the encoder's SSD rule, enc/encode_frame.c:50-61 + detect_clpf
    enc/encode_block.c:3036) and masked apply, packed-recon output and
    edge-padded reference planes - so the reconstructed reference never
    crosses the host link and the next frame's ME/MC reads it in place.

    Returns (packed [3H/2, W] uint8, bit_sb [SBH, SBW] bool,
    refY/refU/refV padded uint8 planes)."""
    Hc, Wc = H // 2, W // 2
    SBH, SBW = H // MAX_BLOCK_SIZE, W // MAX_BLOCK_SIZE
    h8, w8 = SBH * 8, SBW * 8

    def f(y, u, v, orgY, ddp, cy8, cu8, cv8, beta, tc, tcC):
        if deblocking:
            dd = JK.unpack_ddp(ddp)
            y = JK.deblock_luma(y, dd, H, W, beta, tc)
            u = JK.deblock_chroma(u, dd, H, W, tcC)
            v = JK.deblock_chroma(v, dd, H, W, tcC)
        bit_sb = jnp.zeros((max(SBH, 1), max(SBW, 1)), bool)
        if clpf and SBH > 0 and SBW > 0:
            # decision: dense filtered luma vs unfiltered SSD per
            # 8-block, cy8-masked, summed per SB (the host twin is
            # Encoder._clpf_frame; XLA CSEs the dense filter with the
            # masked apply below)
            ones = jnp.ones((H // 8, W // 8), bool)
            Fy = JK.clpf_plane(y, ones, MAX_BLOCK_SIZE, H, W)
            O = orgY.astype(jnp.int32)

            def blksum(E):
                return E[:h8 * 8, :w8 * 8] \
                    .reshape(h8, 8, w8, 8).sum(axis=(1, 3))

            cy8c = cy8[:h8, :w8]
            e0 = blksum((O - y) ** 2) * cy8c
            e1 = blksum((O - Fy) ** 2) * cy8c
            sum0 = e0.reshape(SBH, 8, SBW, 8).sum(axis=(1, 3))
            sum1 = e1.reshape(SBH, 8, SBW, 8).sum(axis=(1, 3))
            bit_sb = sum1 < sum0
            cand8 = cy8 | cu8 | cv8
            cand_sb = cand8[:h8, :w8].reshape(SBH, 8, SBW, 8) \
                .any(axis=(1, 3))
            on_sb = cand_sb & bit_sb
            on8 = jnp.zeros((H // 8, W // 8), bool)
            on8 = on8.at[:h8, :w8].set(
                jnp.repeat(jnp.repeat(on_sb, 8, 0), 8, 1))
            y = JK.clpf_plane(y, cy8 & on8, MAX_BLOCK_SIZE, H, W)
            u = JK.clpf_plane(u, cu8 & on8, MAX_BLOCK_SIZE // 2, Hc, Wc)
            v = JK.clpf_plane(v, cv8 & on8, MAX_BLOCK_SIZE // 2, Hc, Wc)
        packed = jnp.concatenate(
            [y.astype(jnp.uint8),
             jnp.concatenate([u.astype(jnp.uint8),
                              v.astype(jnp.uint8)], axis=1)], axis=0)
        refY = jnp.pad(y.astype(jnp.uint8), PAD, mode='edge')
        refU = jnp.pad(u.astype(jnp.uint8), PAD_C, mode='edge')
        refV = jnp.pad(v.astype(jnp.uint8), PAD_C, mode='edge')
        return packed, bit_sb, refY, refU, refV

    return jax.jit(f)


def _intra_scan_arrays(intra_leaves, H, W):
    """Padded TU descriptor arrays for the exact intra scan (luma +
    chroma variants), built from the decided intra leaves."""
    from ..dec.native_inputs import (_downleft_available_v,
                                     _upright_available_v)
    n = len(intra_leaves)
    # P frames usually have few intra leaves; a small floor keeps the
    # sequential exact-recon scan short (the pow2 ladder still bounds
    # the compile count)
    npad = max(32, 1 << (n - 1).bit_length())
    ty = np.array([lf.ypos for lf in intra_leaves], np.int32)
    tx = np.array([lf.xpos for lf in intra_leaves], np.int32)
    sz = np.array([lf.size for lf in intra_leaves], np.int32)
    md = np.array([lf.intra_mode for lf in intra_leaves], np.int32)
    up = _upright_available_v(ty, tx, sz, W)
    dl = _downleft_available_v(ty, tx, sz, H)

    def padn(a, fill=0):
        return np.concatenate(
            [a.astype(np.int32), np.full(npad - n, fill, np.int32)])

    arr = {
        "ty": padn(ty), "tx": padn(tx), "size": padn(sz, 8),
        "mode": padn(md), "toplen": padn(sz + up, 8),
        "leftlen": padn(sz + dl, 8),
        "cbx_nonzero": padn((tx > 0).astype(np.int32)),
        "valid": padn(np.ones(n, np.int32)),
    }
    arrc = dict(arr)
    arrc["ty"] = padn(ty // 2)
    arrc["tx"] = padn(tx // 2)
    arrc["size"] = padn(sz // 2, 4)
    arrc["toplen"] = padn(sz // 2 + up, 4)
    arrc["leftlen"] = padn(sz // 2 + dl, 4)
    arrc["cbx_nonzero"] = padn((tx // 2 > 0).astype(np.int32))
    return arr, arrc, npad



@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "has_bi", "seq_bipred", "fast",
                     "has_intra", "deblocking", "clpf", "interp"))
def _final_all(trials_sel, refY, refU, refV, cells8, recs_y, cnt_y,
               recs_c, cnt_c, own8, org_y, org_u, org_v, ddp, cm3,
               qpY, qpC, beta, tc, tcC, *, H, W, has_bi, seq_bipred,
               fast, has_intra, deblocking, clpf, interp):
    """ONE jitted program for the whole finish half: final MC +
    residuals, the Pallas intra scans, deblock + CLPF decision, packed
    output and padded reference planes. Dispatch count (and its tunnel
    latency) drops from ~5 calls to 1; the packed cell maps upload as
    a single int16 tensor."""
    c = cells8.astype(jnp.int32)
    y_d, u_d, v_d = _final_mc_fn(H, W, has_bi, seq_bipred)(
        refY, refU, refV, c[7], c[0], c[1], c[2], c[3], c[4], c[5],
        c[6], trials_sel, qpY, qpC)
    q16y = q16c = None
    if has_intra:
        from ..ops.pallas_enc_intra import (SIZES_Y, SIZES_C,
                                            encode_scan_pallas)
        planesY, q16y = encode_scan_pallas(
            y_d[None], org_y[None], recs_y, cnt_y, qpY, SIZES_Y, fast,
            False, interpret=interp)
        y_d = planesY[0]
        planesC, q16c = encode_scan_pallas(
            jnp.stack([u_d, v_d]), jnp.stack([org_u, org_v]), recs_c,
            cnt_c, qpC, SIZES_C, fast, False, interpret=interp)
        u_d, v_d = planesC[0], planesC[1]
    cm0, cm1, cm2 = cm3[0], cm3[1], cm3[2]
    if has_intra:
        # the walk-state side info prices intra cbp as (1,1,1); the
        # CLPF candidate masks must reflect the ACTUAL coded cbp the
        # decoder derives, which the in-program intra scans just
        # produced - patch the intra-owned 8-cells from the q16 banks.
        # (Deblock needs no patch: intra edges filter on mode alone.)
        nT = q16y.shape[0]
        bits = ((q16y[:, 0] != 0).any(axis=(1, 2)).astype(jnp.int32)
                + 2 * (q16c[:, 0] != 0).any(axis=(1, 2)).astype(
                    jnp.int32)
                + 4 * (q16c[:, 1] != 0).any(axis=(1, 2)).astype(
                    jnp.int32))
        ow = own8.astype(jnp.int32)
        g = bits[jnp.clip(ow - 1, 0, nT - 1)]
        has = ow > 0
        cm0 = jnp.where(has, (g & 1) != 0, cm0)
        cm1 = jnp.where(has, (g & 2) != 0, cm1)
        cm2 = jnp.where(has, (g & 4) != 0, cm2)
    packed, bit_sb, refYp, refUp, refVp = _filter_fn(
        H, W, deblocking, clpf)(
        y_d, u_d, v_d, org_y, ddp, cm0, cm1, cm2, beta, tc, tcC)
    return packed, bit_sb, refYp, refUp, refVp, q16y, q16c


def _dispatch_final_fused(enc_geom, trials_dev, refY_d, refU_d, refV_d,
                          fin, org_y_d, org_u_d, org_v_d, qpY, qpC,
                          speed, seq_bipred, deblocking, clpf, ddp,
                          cm3):
    """Build the packed args and dispatch _final_all (the fused
    pallas-scan path - used whenever the intra scan runs on Pallas or
    the frame has no intra leaves)."""
    from ..codec.constants import BETA_TABLE, TC_TABLE
    from ..ops.pallas_enc_intra import (SIZES_Y, SIZES_C,
                                        build_enc_records)
    from .device_intra import _pallas_enc_interpret
    H, W = enc_geom
    # The decided host fields are constant for a given `fin`; stage
    # them on device ONCE and cache on the dict. The live encode
    # builds a fresh fin per frame (single use), but the throughput
    # replay (tools/device_encode_fps.py) re-dispatches the same
    # record every rep - without the cache each rep re-uploads ~2-3 MB
    # of cell maps/masks per frame through the tunnel, which was most
    # of the measured wall-vs-device gap.
    st = fin.get('_staged_final')
    if st is None:
        (mvxc_v, mvyc_v, slc, mvx1c_v, mvy1c_v, sl1c, bic) = \
            fin['cells']
        cells8 = np.stack([mvxc_v, mvyc_v,
                           slc.astype(np.int16), mvx1c_v, mvy1c_v,
                           sl1c.astype(np.int16), bic.astype(np.int16),
                           fin['size_cells'].astype(np.int16)])
        has_intra = fin['intra'] is not None
        own8 = np.zeros((H // 8, W // 8), np.int16)
        if has_intra:
            arr, arrc, _ = fin['intra']
            recs_y, cnt_y = build_enc_records(arr, SIZES_Y)
            recs_c, cnt_c = build_enc_records(arrc, SIZES_C)
            valid = np.asarray(arr['valid']) != 0
            ty = np.asarray(arr['ty'])[valid]
            tx = np.asarray(arr['tx'])[valid]
            sz = np.asarray(arr['size'])[valid]
            for i in range(len(ty)):
                own8[ty[i] // 8:(ty[i] + sz[i]) // 8,
                     tx[i] // 8:(tx[i] + sz[i]) // 8] = i + 1
        else:
            z = np.zeros((1, 1, 8), np.int32)
            recs_y = recs_c = z
            cnt_y = cnt_c = np.zeros(1, np.int32)
        st = {
            'k': {s: jnp.asarray(np.asarray(fin['ksel'][s], np.int32))
                  for s in SIZES},
            'm': {s: jnp.asarray(fin['msk'][s]) for s in SIZES},
            'mtb': {s: jnp.asarray(fin['mtb'][s]) for s in SIZES},
            'cells8': jnp.asarray(cells8),
            'recs_y': jnp.asarray(recs_y), 'cnt_y': jnp.asarray(cnt_y),
            'recs_c': jnp.asarray(recs_c), 'cnt_c': jnp.asarray(cnt_c),
            'own8': jnp.asarray(own8), 'ddp': jnp.asarray(ddp),
            'cm3': jnp.asarray(cm3), 'has_intra': has_intra,
        }
        fin['_staged_final'] = st
    tsel = {}
    for s in SIZES:
        t = trials_dev[s]
        tsel[s] = {'qy': t['qy'], 'qu': t['qu'], 'qv': t['qv'],
                   'cbp_y': t['cbp_y'], 'cbp_u': t['cbp_u'],
                   'cbp_v': t['cbp_v'],
                   'k': st['k'][s], 'm': st['m'][s]}
        if 'qy_tb' in t:
            tsel[s].update({'qy_tb': t['qy_tb'], 'qu_tb': t['qu_tb'],
                            'qv_tb': t['qv_tb'],
                            'cbp_tb_y': t['cbp_tb_y'],
                            'cbp_tb_u': t['cbp_tb_u'],
                            'cbp_tb_v': t['cbp_tb_v'],
                            'mtb': st['mtb'][s]})
    return _final_all(
        tsel, refY_d, refU_d, refV_d, st['cells8'],
        st['recs_y'], st['cnt_y'], st['recs_c'],
        st['cnt_c'], st['own8'], org_y_d, org_u_d,
        org_v_d, st['ddp'], st['cm3'], jnp.int32(qpY),
        jnp.int32(qpC), jnp.int32(BETA_TABLE[qpY]),
        jnp.int32(TC_TABLE[qpY]), jnp.int32(TC_TABLE[qpC]),
        H=H, W=W, has_bi=fin['has_bi_cells'], seq_bipred=seq_bipred,
        fast=speed > 1, has_intra=st['has_intra'],
        deblocking=deblocking, clpf=clpf,
        interp=_pallas_enc_interpret())


def _dispatch_final(H, W, trials_dev, refY_d, refU_d, refV_d, fin,
                    org_y_d, org_u_d, org_v_d, qpY, qpC, speed,
                    seq_bipred):
    """Dispatch the final reconstruction + (optional) exact intra scan
    from decided host fields - pure device work, NO sync. `fin` holds
    per-size chosen-variant indices/masks, the decided per-cell MV
    fields (visual domain) and the intra TU arrays; shared between the
    live encode and the device-throughput replay
    (tools/device_encode_fps.py). Returns (y_d, u_d, v_d,
    intra_q_dev|None)."""
    from .device_intra import _encode_scan_fn
    # stage the decided host fields once per fin (see
    # _dispatch_final_fused: the replay re-dispatches the same record
    # every rep and would re-upload these each time)
    st = fin.get('_staged_plain')
    if st is None:
        (mvxc_v, mvyc_v, slc, mvx1c_v, mvy1c_v, sl1c, bic) = \
            fin['cells']
        st = {
            'k': {s: jnp.asarray(np.asarray(fin['ksel'][s], np.int32))
                  for s in SIZES},
            'm': {s: jnp.asarray(fin['msk'][s]) for s in SIZES},
            'mtb': {s: jnp.asarray(fin['mtb'][s]) for s in SIZES},
            'cells': tuple(jnp.asarray(a) for a in
                           (fin['size_cells'], mvxc_v, mvyc_v, slc,
                            mvx1c_v, mvy1c_v, sl1c, bic)),
        }
        fin['_staged_plain'] = st
    tsel = {}
    for s in SIZES:
        t = trials_dev[s]
        tsel[s] = {'qy': t['qy'], 'qu': t['qu'], 'qv': t['qv'],
                   'cbp_y': t['cbp_y'], 'cbp_u': t['cbp_u'],
                   'cbp_v': t['cbp_v'],
                   'k': st['k'][s], 'm': st['m'][s]}
        if 'qy_tb' in t:
            tsel[s].update({'qy_tb': t['qy_tb'], 'qu_tb': t['qu_tb'],
                            'qv_tb': t['qv_tb'],
                            'cbp_tb_y': t['cbp_tb_y'],
                            'cbp_tb_u': t['cbp_tb_u'],
                            'cbp_tb_v': t['cbp_tb_v'],
                            'mtb': st['mtb'][s]})
    y_d, u_d, v_d = _final_mc_fn(H, W, fin['has_bi_cells'],
                                 seq_bipred)(
        refY_d, refU_d, refV_d, *st['cells'],
        tsel, jnp.int32(qpY), jnp.int32(qpC))

    intra_q_dev = None
    if fin['intra'] is not None:
        arr, arrc, npad = fin['intra']
        from .device_intra import (use_pallas_enc, pallas_scan_luma,
                                   pallas_scan_chroma)
        if use_pallas_enc(H, W):
            y_d, q16y, cbpy = pallas_scan_luma(
                y_d, org_y_d, arr, jnp.int32(qpY), speed > 1, False)
            u_d, v_d, q16u, cbpu, q16v, cbpv = pallas_scan_chroma(
                u_d, v_d, org_u_d, org_v_d, arrc, jnp.int32(qpC),
                speed > 1, False)
        else:
            luma_fn, chroma_fn = _encode_scan_fn(speed > 1, npad,
                                                 intra_quant=False)

            def pad_for(plane):
                return jnp.pad(jnp.asarray(plane, jnp.int32),
                               ((JK.PADI, JK.PADE), (JK.PADI, JK.PADE)))

            P = pad_for(y_d)
            O = pad_for(org_y_d)
            P, q16y, cbpy = luma_fn(P, O, arr, jnp.int32(qpY))
            y_d = P[JK.PADI:JK.PADI + H, JK.PADI:JK.PADI + W]

            Pu = pad_for(u_d)
            Pv = pad_for(v_d)
            Ou = pad_for(org_u_d)
            Ov = pad_for(org_v_d)
            Pu, Pv, q16u, cbpu, q16v, cbpv = chroma_fn(
                Pu, Pv, Ou, Ov, arrc, jnp.int32(qpC))
            u_d = Pu[JK.PADI:JK.PADI + H // 2, JK.PADI:JK.PADI + W // 2]
            v_d = Pv[JK.PADI:JK.PADI + H // 2, JK.PADI:JK.PADI + W // 2]
        intra_q_dev = {'qy': q16y, 'qu': q16u, 'qv': q16v,
                       'cy': cbpy, 'cu': cbpu, 'cv': cbpv}
    return y_d, u_d, v_d, intra_q_dev


def _clpf_cand_masks(dd, H, W):
    """Per-8-cell CLPF candidate masks from the side-info map
    (Encoder._clpf_frame's cell8 rule): [H/8, W/8] bool per plane,
    populated only over the SB-covered region."""
    SBH, SBW = H // MAX_BLOCK_SIZE, W // MAX_BLOCK_SIZE
    h8, w8 = SBH * 8, SBW * 8
    cy8 = np.zeros((H // 8, W // 8), bool)
    cu8 = np.zeros_like(cy8)
    cv8 = np.zeros_like(cy8)

    def cell8(a):
        return np.asarray(a)[::2, ::2][:h8, :w8]

    notbi = cell8(dd.mode) != MODE_BIPRED
    cy8[:h8, :w8] = (cell8(dd.cbp_y) > 0) & notbi
    cu8[:h8, :w8] = (cell8(dd.cbp_u) > 0) & notbi
    cv8[:h8, :w8] = (cell8(dd.cbp_v) > 0) & notbi
    return cy8, cu8, cv8


# ---------------------------------------------------------------------------
# Host decision walk
# ---------------------------------------------------------------------------

def _quote_super_mode(ectx, binfo, mode, ref_idx0):
    """Bit count of write_super_mode for a non-split block
    (enc/write_bits.c:268-380, counting only)."""
    size = binfo.size
    num_ref = ectx.num_ref
    bipred_possible = num_ref > 1 and ectx.enable_bipred
    split_possible = size > MIN_BLOCK_SIZE
    maxbit = 2 + num_ref + int(split_possible) + int(bipred_possible)
    if ectx.interp_ref:
        if mode == MODE_SKIP:
            code = 0
        elif mode == MODE_MERGE:
            code = 2
        elif mode == MODE_BIPRED:
            code = 3
        elif mode == MODE_INTRA:
            code = 4
        elif mode == MODE_INTER and ref_idx0 > 0:
            code = 4 + ref_idx0
        else:
            code = 4 + num_ref
        if not bipred_possible and code > 3:
            code -= 1
        if not split_possible and code > 1:
            code -= 1
        bc = binfo.block_context
        if (bc.index == 2 or bc.index > 3) and size > MIN_BLOCK_SIZE:
            if code < 3:
                code = (code + 2) % 3
    else:
        if mode == MODE_SKIP:
            code = 0
        elif mode == MODE_INTER and ref_idx0 == 0:
            code = 2
        elif mode == MODE_MERGE:
            code = 3
        elif mode == MODE_BIPRED:
            code = 4
        elif mode == MODE_INTRA:
            code = 5
        else:
            code = 5 + ref_idx0
        if not bipred_possible and code > 4:
            code -= 1
        if not split_possible and code > 1:
            code -= 1
        bc = binfo.block_context
        if (bc.index == 2 or bc.index > 3) and size > MIN_BLOCK_SIZE:
            if code < 4:
                code = (code + 3) % 4
    return maxbit if code == maxbit else code + 1


def _quote_cbp(cbp_y, cbp_u, cbp_v, ctx_cbp0, merge, tb_enabled=False):
    """Bit count of the cbp code (enc/write_bits.c:287-347 counting).
    tb_enabled: this mode can code tb_split (INTER/INTRA on
    tb-enabled configs), which shifts codes > 1 up by one to make room
    for the tb_split escape (code 2)."""
    from .syntax import CBP_TABLE
    code = CBP_TABLE[cbp_y + 2 * cbp_u + 4 * cbp_v]
    if merge:
        if code == 1:
            code = 7
        elif code > 1:
            code -= 1
    else:
        if ctx_cbp0 and code < 2:
            code = 1 - code
        if tb_enabled and code > 1:
            code += 1
    return quote_vlc(0, code)


def _quote_cbp_tb(mask_y, mask_u, mask_v, ctx_cbp0):
    """Bit count of a tb_split block's payload header: the tb escape
    (code 2) plus the four per-quadrant cbp codes
    (enc/write_bits.c:287-347, size > 8 branch)."""
    from .syntax import CBP_TABLE
    bits = quote_vlc(0, 2)
    for k in range(4):
        sh = 3 - k
        code = CBP_TABLE[((mask_y >> sh) & 1) + 2 * ((mask_u >> sh) & 1)
                         + 4 * ((mask_v >> sh) & 1)]
        if ctx_cbp0 and code < 2:
            code = 1 - code
        bits += quote_vlc(0, code)
    return bits


def _skip_idx_bits(nvec, idx):
    if nvec >= 4:
        return 2
    if nvec == 3:
        return 1 if idx == 0 else 2
    if nvec == 2:
        return 1
    return 0


class _Leaf:
    __slots__ = ("ypos", "xpos", "size", "mode", "mv", "ref", "skip_idx",
                 "intra_mode", "idx", "use_cbp", "cand", "k",
                 "mv1", "ref1", "dir", "tb")

    def __init__(self, ypos, xpos, size, mode, mv=(0, 0), ref=0,
                 skip_idx=0, intra_mode=0, idx=0, use_cbp=False, k=0,
                 mv1=(0, 0), ref1=0, dir=0, tb=0):
        self.ypos, self.xpos, self.size = ypos, xpos, size
        self.mode, self.mv, self.ref = mode, mv, ref
        self.skip_idx, self.intra_mode = skip_idx, intra_mode
        self.idx, self.use_cbp = idx, use_cbp
        self.cand = None
        self.k = k
        self.mv1, self.ref1, self.dir = mv1, ref1, dir
        self.tb = tb


def _decide_frame_native(enc, meas, intra_modes, intra_costs, lam,
                         lam_me):
    """C twin of the decision walk (native/thor_decide.c, ~100x);
    bit-parity with the Python walk below is covered by
    tests/test_device_inter.py."""
    from ..native import decide_frame_native
    W, H = enc.width, enc.height
    p = enc.params
    per_size = []
    for s in SIZES:
        m = meas[s]
        d = {
            'mvx': m['mvx'], 'mvy': m['mvy'], 'slot': m['slot'],
            'mvx1': m['mvx1'], 'mvy1': m['mvy1'], 'slot1': m['slot1'],
            'K_uni': m['K_uni'],
            'ssd_coded': m['ssd_coded'], 'ssd_pred': m['ssd_pred'],
            'bits': m['bits'],
            'cbp_y': m['cbp_y'], 'cbp_u': m['cbp_u'],
            'cbp_v': m['cbp_v'],
            'intra_cost': intra_costs[s], 'intra_mode': intra_modes[s],
        }
        if 'ssd_tb' in m:
            d.update({'ssd_tb': m['ssd_tb'], 'bits_tb': m['bits_tb'],
                      'cbp_tb_y': m['cbp_tb_y'],
                      'cbp_tb_u': m['cbp_tb_u'],
                      'cbp_tb_v': m['cbp_tb_v']})
        per_size.append(d)
    recs = decide_frame_native(
        W, H, enc.num_ref, int(p.enable_bipred), int(enc.interp_ref),
        int(bool(p.use_block_contexts)), int(enc.frame_type),
        float(lam), float(lam_me), per_size)
    leaves = []
    for r in recs:
        lf = _Leaf(r.ypos, r.xpos, r.size, r.mode,
                   mv=(r.mvx, r.mvy), ref=r.ref, skip_idx=r.skip_idx,
                   intra_mode=r.intra_mode, idx=r.idx,
                   use_cbp=bool(r.use_cbp), k=r.k,
                   mv1=(r.mv1x, r.mv1y), ref1=r.ref1, dir=r.dir,
                   tb=int(r.tb))
        leaves.append(lf)
    return leaves, set()


def _decide_frame(enc, meas, intra_modes, intra_costs, lam, lam_me):
    """Bottom-up quadtree decision walk in coding order (mirrors
    process_block's recursion, enc/encode_block.c:2787-3033) over the
    device cost maps. Returns (leaves in coding order, split set).

    Dispatches to the C twin unless THOR_NATIVE_DECIDE=0; the Python
    below is the parity oracle."""
    import os
    if os.environ.get("THOR_NATIVE_DECIDE", "1") != "0":
        try:
            return _decide_frame_native(enc, meas, intra_modes,
                                        intra_costs, lam, lam_me)
        except Exception as e:
            # A broken thor_decide.c must not degrade silently into the
            # ~100x slower Python walk: fail loudly under pytest, warn
            # otherwise (round-2 verdict, weak item 5).
            if "PYTEST_CURRENT_TEST" in os.environ:
                raise
            import logging
            logging.getLogger(__name__).warning(
                "native decide failed, falling back to Python: %r", e)
    W, H = enc.width, enc.height
    dd = enc.deblock_data
    p = enc.params
    leaves, splits = [], set()

    def leaf_candidates(s, y0, x0):
        HBW = W // s
        idx = (y0 // s) * HBW + (x0 // s)
        m = meas[s]
        K = m['mvx'].shape[0]
        binfo_ctx = find_block_contexts(y0, x0, H, W, s, dd,
                                        bool(p.use_block_contexts))
        ctx_cbp0 = binfo_ctx.cbp == 0

        class _B:
            size = s
            block_context = binfo_ctx
        skip_cands = get_mv_skip(y0, x0, W, H, s, dd)
        mvp = get_mv_pred(y0, x0, W, H, s, dd)
        K_uni = m['K_uni']

        def variant_of(c):
            """Measured variant index matching candidate (mv, ref):
            uni candidates match uni variants, bi candidates match the
            bi pairs (both lists)."""
            if c.bipred_flag == 2:
                for k in range(K_uni, K):
                    if (int(m['mvx'][k, idx]) == c.mv0x
                            and int(m['mvy'][k, idx]) == c.mv0y
                            and int(m['slot'][k, idx]) == c.ref_idx0
                            and int(m['mvx1'][k, idx]) == c.mv1x
                            and int(m['mvy1'][k, idx]) == c.mv1y
                            and int(m['slot1'][k, idx]) == c.ref_idx1):
                        return k
                return -1
            if c.bipred_flag != 0:
                return -1
            for k in range(K_uni):
                if (int(m['mvx'][k, idx]) == c.mv0x
                        and int(m['mvy'][k, idx]) == c.mv0y
                        and int(m['slot'][k, idx]) == c.ref_idx0):
                    return k
            return -1

        best = None
        # --- SKIP / MERGE candidates (every candidate whose MV was
        # measured as one of the trial variants) ---
        sm_skip = _quote_super_mode(enc, _B, MODE_SKIP, 0)
        sm_merge = _quote_super_mode(enc, _B, MODE_MERGE, 0)
        for i, c in enumerate(skip_cands):
            k = variant_of(c)
            if k < 0:
                continue
            bits = sm_skip + _skip_idx_bits(len(skip_cands), i)
            cost = int(m['ssd_pred'][k, idx]) + int(lam * bits + 0.5)
            if best is None or cost < best[0]:
                lf = _Leaf(y0, x0, s, MODE_SKIP,
                           mv=(c.mv0x, c.mv0y), ref=c.ref_idx0,
                           skip_idx=i, idx=idx, k=k,
                           mv1=(c.mv1x, c.mv1y), ref1=c.ref_idx1,
                           dir=c.bipred_flag)
                lf.cand = c
                best = (cost, lf)
            # MERGE: same candidate coded with residual
            cy = int(m['cbp_y'][k, idx])
            cu = int(m['cbp_u'][k, idx])
            cv = int(m['cbp_v'][k, idx])
            if cy or cu or cv:
                bits = (sm_merge + _skip_idx_bits(len(skip_cands), i)
                        + _quote_cbp(cy, cu, cv, ctx_cbp0, True)
                        + int(m['bits'][k, idx]))
                cost = int(m['ssd_coded'][k, idx]) \
                    + int(lam * bits + 0.5)
                if cost < best[0]:
                    lf = _Leaf(y0, x0, s, MODE_MERGE,
                               mv=(c.mv0x, c.mv0y), ref=c.ref_idx0,
                               skip_idx=i, idx=idx, use_cbp=True, k=k,
                               mv1=(c.mv1x, c.mv1y), ref1=c.ref_idx1,
                               dir=c.bipred_flag)
                    lf.cand = c
                    best = (cost, lf)

        # --- INTER at the ME MV (coded, zero-residual and - on
        # tb-enabled configs for sizes > 8 - tb-split variants) ---
        tb_on = 'ssd_tb' in m
        mv = (int(m['mvx'][0, idx]), int(m['mvy'][0, idx]))
        ref = int(m['slot'][0, idx])
        mvbits = quote_mv_bits(mv[1] - mvp[1], mv[0] - mvp[0])
        smbits = _quote_super_mode(enc, _B, MODE_INTER, ref)
        cy = int(m['cbp_y'][0, idx])
        cu = int(m['cbp_u'][0, idx])
        cv = int(m['cbp_v'][0, idx])
        tbe = p.enable_tb_split == 1
        cbp0_bits = _quote_cbp(0, 0, 0, ctx_cbp0, False, tbe)
        cost_zero = int(m['ssd_pred'][0, idx]) + int(
            lam * (smbits + mvbits + cbp0_bits) + 0.5)
        cost_coded = int(m['ssd_coded'][0, idx]) + int(
            lam * (smbits + mvbits + int(m['bits'][0, idx])
                   + _quote_cbp(cy, cu, cv, ctx_cbp0, False, tbe))
            + 0.5)
        if (cy or cu or cv) and cost_coded < cost_zero:
            cost, use_cbp, tb_pick = cost_coded, True, 0
        else:
            cost, use_cbp, tb_pick = cost_zero, False, 0
        if tb_on:
            my = int(m['cbp_tb_y'][0, idx])
            mu = int(m['cbp_tb_u'][0, idx])
            mvv = int(m['cbp_tb_v'][0, idx])
            if my or mu or mvv:
                cost_tb = int(m['ssd_tb'][0, idx]) + int(
                    lam * (smbits + mvbits
                           + _quote_cbp_tb(my, mu, mvv, ctx_cbp0)
                           + int(m['bits_tb'][0, idx])) + 0.5)
                if cost_tb < cost:
                    cost, use_cbp, tb_pick = cost_tb, True, 1
        if best is None or cost < best[0]:
            best = (cost, _Leaf(y0, x0, s, MODE_INTER, mv=mv, ref=ref,
                                idx=idx, use_cbp=use_cbp, k=0,
                                tb=tb_pick))

        # --- BIPRED at every measured bi pair (ME pair, neighbour
        # pairs, zero-zero; ref enc/encode_block.c:2379-2427) ---
        if K_uni < K:
            smbits = _quote_super_mode(enc, _B, MODE_BIPRED, 0)
            for k in range(K_uni, K):
                mv0 = (int(m['mvx'][k, idx]), int(m['mvy'][k, idx]))
                mv1 = (int(m['mvx1'][k, idx]), int(m['mvy1'][k, idx]))
                r0 = int(m['slot'][k, idx])
                r1 = int(m['slot1'][k, idx])
                mvbits = quote_mv_bits(mv0[1] - mvp[1], mv0[0] - mvp[0])
                mvp2 = mv0 if enc.frame_type == 2 else mvp
                mvbits += quote_mv_bits(mv1[1] - mvp2[1],
                                        mv1[0] - mvp2[0])
                refbits = 0
                if enc.frame_type == 1:  # P_FRAME codes the ref pair
                    if enc.num_ref == 2:
                        code = 2 * r0 + r1
                        refbits = 3 if code == 3 else code + 1
                    else:
                        refbits = quote_vlc(10, 4 * r0 + r1)
                cy = int(m['cbp_y'][k, idx])
                cu = int(m['cbp_u'][k, idx])
                cv = int(m['cbp_v'][k, idx])
                hdr = smbits + mvbits + refbits
                cost_zero = int(m['ssd_pred'][k, idx]) + int(
                    lam * (hdr + cbp0_bits) + 0.5)
                cost_coded = int(m['ssd_coded'][k, idx]) + int(
                    lam * (hdr + int(m['bits'][k, idx])
                           + _quote_cbp(cy, cu, cv, ctx_cbp0, False))
                    + 0.5)
                if (cy or cu or cv) and cost_coded < cost_zero:
                    cost, use_cbp = cost_coded, True
                else:
                    cost, use_cbp = cost_zero, False
                if cost < best[0]:
                    best = (cost, _Leaf(y0, x0, s, MODE_BIPRED, mv=mv0,
                                        ref=r0, mv1=mv1, ref1=r1,
                                        dir=2, idx=idx,
                                        use_cbp=use_cbp, k=k))

        # --- INTRA ---
        smbits = _quote_super_mode(enc, _B, MODE_INTRA, 0)
        ic = int(intra_costs[s][y0 // s, x0 // s]) \
            + int(lam * smbits + 0.5)
        if ic < best[0]:
            best = (ic, _Leaf(y0, x0, s, MODE_INTRA,
                              intra_mode=int(intra_modes[s][y0 // s,
                                                            x0 // s]),
                              idx=idx))
        return best

    def store_leaf(lf):
        # Must match what emission-time store_deblock_data writes for
        # mv0/mv1/ref0/ref1/dir exactly: the skip-candidate derivation
        # (and its dedup keys) read those fields, so decision-time and
        # emission-time candidate lists must be identical.
        def plane_cbp(lf):
            if not lf.use_cbp:
                return (0, 0, 0)
            m = meas[lf.size]
            if lf.tb:
                return (int(m['cbp_tb_y'][lf.k, lf.idx] != 0),
                        int(m['cbp_tb_u'][lf.k, lf.idx] != 0),
                        int(m['cbp_tb_v'][lf.k, lf.idx] != 0))
            return (int(m['cbp_y'][lf.k, lf.idx]),
                    int(m['cbp_u'][lf.k, lf.idx]),
                    int(m['cbp_v'][lf.k, lf.idx]))

        if lf.mode in (MODE_SKIP, MODE_MERGE):
            c = lf.cand
            mv0 = ((c.mv0x, c.mv0y),) * 4
            mv1 = ((c.mv1x, c.mv1y),) * 4
            dd.store_block(lf.ypos, lf.xpos, lf.size, lf.size, lf.size,
                           lf.mode, plane_cbp(lf), 0, 0, mv0, mv1,
                           c.ref_idx0, c.ref_idx1, c.bipred_flag)
        elif lf.mode == MODE_INTER:
            mv0 = (lf.mv,) * 4
            mv1 = ((0, 0),) * 4
            dd.store_block(lf.ypos, lf.xpos, lf.size, lf.size, lf.size,
                           MODE_INTER, plane_cbp(lf), lf.tb, 0, mv0,
                           mv1, lf.ref, 0, 0)
        elif lf.mode == MODE_BIPRED:
            mv0 = (lf.mv,) * 4
            mv1 = (lf.mv1,) * 4
            dd.store_block(lf.ypos, lf.xpos, lf.size, lf.size, lf.size,
                           MODE_BIPRED, plane_cbp(lf), 0, 0, mv0, mv1,
                           lf.ref, lf.ref1, 2)
        else:
            # INTRA normalization: dir=-1, zero MVs, ref 0
            # (enc/encode_block.c:2028, dec read_block rec.dir=-1)
            mv4 = ((0, 0),) * 4
            dd.store_block(lf.ypos, lf.xpos, lf.size, lf.size, lf.size,
                           MODE_INTRA, (1, 1, 1), 0, 0, mv4, mv4, 0, 0,
                           -1)

    def rec(s, y0, x0):
        if y0 >= H or x0 >= W:
            return 0, []
        full = y0 + s <= H and x0 + s <= W
        if not full:
            # forced descent (frame dims are /8 so leaves are full)
            h = s // 2
            cost, lv = 0, []
            for (dy, dx) in ((0, 0), (h, 0), (0, h), (h, h)):
                c, l2 = rec(h, y0 + dy, x0 + dx)
                cost += c
                lv.extend(l2)
            return cost, lv
        if s > MIN_BLOCK_SIZE:
            # trial children first (bottom-up); their dd stores are
            # overwritten if this size wins, mirroring the reference.
            h = s // 2
            cost_small, lv_small = 0, []
            for (dy, dx) in ((0, 0), (h, 0), (0, h), (h, h)):
                c, l2 = rec(h, y0 + dy, x0 + dx)
                cost_small += c
                lv_small.extend(l2)
            cost_small += int(lam * 2 + 0.5)  # split signalling
            cost_here, lf = leaf_candidates(s, y0, x0)
            if cost_here <= cost_small:
                store_leaf(lf)
                return cost_here, [lf]
            splits.add((y0, x0, s))
            return cost_small, lv_small
        cost_here, lf = leaf_candidates(s, y0, x0)
        store_leaf(lf)
        return cost_here, [lf]

    for k in range(0, H, MAX_BLOCK_SIZE):
        for l in range(0, W, MAX_BLOCK_SIZE):
            _, lv = rec(MAX_BLOCK_SIZE, k, l)
            leaves.extend(lv)
    return leaves, splits


def _emit_native(enc, w, leaves, meas, coeff_host, intra_q):
    """Emit the frame's SB payload through the C writers
    (native/thor_decide.c emission half): re-derives skip candidates,
    contexts and MV predictors from its own side-info walk, writes the
    exact syntax into the BitWriter, and fills enc.deblock_data like
    store_deblock_data. Byte-parity with the Python emit loop below is
    covered by tests/test_device_inter.py."""
    from ..native import emit_frame_native
    p = enc.params
    banks = []
    for s in SIZES:
        ch = coeff_host.get(s)
        banks.append({
            'qy': ch['qy'] if ch else np.zeros((0, s, s), np.int16),
            'qu': ch['qu'] if ch else np.zeros((0, s // 2, s // 2),
                                              np.int16),
            'qv': ch['qv'] if ch else np.zeros((0, s // 2, s // 2),
                                               np.int16),
            'ydim': s, 'cdim': s // 2})
    zi = np.zeros((0, 16, 16), np.int16)
    banks.append({'qy': intra_q.get('qy', zi),
                  'qu': intra_q.get('qu', zi),
                  'qv': intra_q.get('qv', zi),
                  'ydim': 16, 'cdim': 16})
    n = len(leaves)
    bank_row = np.zeros(n, np.int32)
    cbp3 = np.zeros(n, np.int32)
    for i, lf in enumerate(leaves):
        if lf.mode == MODE_INTRA:
            j = intra_q['index'][(lf.ypos, lf.xpos)]
            bank_row[i] = j
            cbp3[i] = (int(intra_q['cy'][j])
                       | (int(intra_q['cu'][j]) << 1)
                       | (int(intra_q['cv'][j]) << 2))
        elif lf.use_cbp:
            bank_row[i] = coeff_host[lf.size]['index'][(lf.ypos,
                                                        lf.xpos)]
            m = meas[lf.size]
            if lf.tb:
                # tb leaf: the three 4-bit quadrant masks
                cbp3[i] = (int(m['cbp_tb_y'][lf.k, lf.idx])
                           | (int(m['cbp_tb_u'][lf.k, lf.idx]) << 4)
                           | (int(m['cbp_tb_v'][lf.k, lf.idx]) << 8))
            else:
                cbp3[i] = (int(m['cbp_y'][lf.k, lf.idx])
                           | (int(m['cbp_u'][lf.k, lf.idx]) << 1)
                           | (int(m['cbp_v'][lf.k, lf.idx]) << 2))
    params = {'W': enc.width, 'H': enc.height, 'num_ref': enc.num_ref,
              'enable_bipred': int(p.enable_bipred),
              'interp_ref': int(enc.interp_ref),
              'use_block_contexts': int(bool(p.use_block_contexts)),
              'num_intra_modes': enc.num_intra_modes,
              'max_num_tb_part': 2 if p.enable_tb_split == 1 else 1,
              'max_num_pb_part': 4 if p.enable_pb_split else 1,
              'max_delta_qp': int(p.max_delta_qp),
              'frame_type': int(enc.frame_type)}
    emit_frame_native(w, params, leaves, bank_row, cbp3, banks,
                      enc.deblock_data)



# ---------------------------------------------------------------------------
# Second-chance candidate measurement (round-5 RD fix)
# ---------------------------------------------------------------------------

def _fuse_dispatch() -> bool:
    """Fuse the per-frame dispatches into single programs only where
    per-call latency matters (real TPUs); the giant XLA CPU compiles
    would dominate test time otherwise. THOR_FUSE_DISPATCH=1/0
    overrides."""
    v = os.environ.get("THOR_FUSE_DISPATCH")
    if v is not None:
        return v not in ("0", "")
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _collect_missing(enc, leaves, meas):
    """Replay the decided leaves in coding order over a fresh side-info
    map and return, per size, {block_idx: [(mvx, mvy, ref), ...]} of
    skip/merge candidates that no measured uni variant matches.

    The skip candidates are DECIDED MVs propagated through skip chains
    (common/inter_prediction.c:331-348); the pre-measured pool (own/
    left/up-right ME + zero) misses chain values that originated
    elsewhere, which measured as the dominant high-QP bit gap in
    RD_r04 (+17-21% bits at qp37: blocks coded INTER where the mirror
    SKIPs). A second measurement round prices exactly the candidates
    the first walk wanted."""
    from ..codec.blockdata import DeblockData
    W, H = enc.width, enc.height
    dd = DeblockData(W, H)
    missing = {s: {} for s in SIZES}
    for lf in leaves:
        s = lf.size
        m = meas[s]
        K_uni = m['K_uni']
        idx = lf.idx
        for c in get_mv_skip(lf.ypos, lf.xpos, W, H, s, dd):
            if c.bipred_flag == 2:
                continue
            mvx = np.asarray(m['mvx'][:K_uni, idx])
            mvy = np.asarray(m['mvy'][:K_uni, idx])
            slt = np.asarray(m['slot'][:K_uni, idx])
            if ((mvx == c.mv0x) & (mvy == c.mv0y)
                    & (slt == c.ref_idx0)).any():
                continue
            lst = missing[s].setdefault(idx, [])
            if (c.mv0x, c.mv0y, c.ref_idx0) not in lst:
                lst.append((c.mv0x, c.mv0y, c.ref_idx0))
        _store_leaf_dd(dd, lf, m)
    return missing


def _store_leaf_dd(dd, lf, m):
    """Store one decided leaf into a side-info map exactly like the
    decision walk / emission does (the native walk keeps its state in
    C, so the fused finish replays the stores from the leaves)."""
    s = lf.size
    idx = lf.idx
    if lf.mode in (MODE_SKIP, MODE_MERGE, MODE_INTER, MODE_BIPRED):
        cbp = (0, 0, 0)
        if lf.use_cbp:
            if lf.tb:
                cbp = (int(m['cbp_tb_y'][lf.k, idx] != 0),
                       int(m['cbp_tb_u'][lf.k, idx] != 0),
                       int(m['cbp_tb_v'][lf.k, idx] != 0))
            else:
                cbp = (int(m['cbp_y'][lf.k, idx]),
                       int(m['cbp_u'][lf.k, idx]),
                       int(m['cbp_v'][lf.k, idx]))
        if lf.mode in (MODE_SKIP, MODE_MERGE):
            dd.store_block(lf.ypos, lf.xpos, s, s, s, lf.mode, cbp,
                           0, 0, (lf.mv,) * 4, (lf.mv1,) * 4,
                           lf.ref, lf.ref1, lf.dir)
        elif lf.mode == MODE_INTER:
            dd.store_block(lf.ypos, lf.xpos, s, s, s, MODE_INTER,
                           cbp, lf.tb, 0, (lf.mv,) * 4,
                           ((0, 0),) * 4, lf.ref, 0, 0)
        else:
            dd.store_block(lf.ypos, lf.xpos, s, s, s, MODE_BIPRED,
                           cbp, 0, 0, (lf.mv,) * 4, (lf.mv1,) * 4,
                           lf.ref, lf.ref1, 2)
    else:
        mv4 = ((0, 0),) * 4
        dd.store_block(lf.ypos, lf.xpos, s, s, s, MODE_INTRA,
                       (1, 1, 1), 0, 0, mv4, mv4, 0, 0, -1)


K_EXTRA = 4


@lru_cache(maxsize=None)
def _extra_trial_fn(H: int, W: int, tb_split: int, speed: int,
                    seq_bipred: int):
    """One jitted program measuring K_EXTRA extra uni variants for all
    four sizes (the second-chance round)."""
    fast32 = speed > 1
    fast64 = speed > 0

    def f(org_y, org_u, org_v, refY, refU, refV, evars, qpY, qpC,
          sign, sign_bi):
        out = {}
        for s in SIZES:
            ey, ex, es = evars[s]
            fastY = (s == 64 and fast64) or fast32
            tb_s = tb_split == 1 and s > 8
            fastY2 = s == 64 or fast32
            z = jnp.zeros_like(ey)
            out[s] = _trial_fn(H, W, s, fastY, fast32, False, tb_s,
                               fastY2, seq_bipred)(
                org_y, org_u, org_v, refY, refU, refV,
                ey, ex, es, z, z, z, z, qpY, qpC, sign, sign_bi)
        return out

    return jax.jit(f)


def _second_chance(enc, ctx, meas, trials_dev, leaves):
    """Measure the first walk's unmatched skip candidates and merge
    them into the uni variant block [uni | extra | bi] of both the
    host cost maps and the device coefficient banks. Returns the
    per-size extra variant arrays (for the replay record) or None."""
    missing = _collect_missing(enc, meas=meas, leaves=leaves)
    if not any(missing[s] for s in SIZES):
        return None
    W, H = enc.width, enc.height
    evars_np = {}
    for s in SIZES:
        N = (H // s) * (W // s)
        ey = np.zeros((K_EXTRA, N), np.int32)
        ex = np.zeros((K_EXTRA, N), np.int32)
        es = np.zeros((K_EXTRA, N), np.int32)
        for idx, lst in missing[s].items():
            for j, (mx, my, r0) in enumerate(lst[:K_EXTRA]):
                ex[j, idx], ey[j, idx], es[j, idx] = mx, my, r0
        evars_np[s] = (ey, ex, es)
    _apply_second_chance(enc, ctx, meas, trials_dev, evars_np)
    return evars_np


def _extra_banks(H, W, tb_split, speed, seq_bipred, org_y_d, org_u_d,
                 org_v_d, refY_d, refU_d, refV_d, evars_np, qpY, qpC,
                 sign, sign_bi):
    ev_dev = {s: tuple(jnp.asarray(a) for a in evars_np[s])
              for s in SIZES}
    return _extra_trial_fn(H, W, tb_split, speed, seq_bipred)(
        org_y_d, org_u_d, org_v_d, refY_d, refU_d, refV_d, ev_dev,
        jnp.int32(qpY), jnp.int32(qpC), jnp.asarray(sign),
        jnp.asarray(sign_bi))


def _merge_banks(trials_dev, t2, K_uni):
    """Splice the extra banks into [uni | extra | bi] order on device
    (the decision walk's merged k indexes address these banks)."""
    for s in SIZES:
        a = trials_dev[s]
        b = t2[s]
        trials_dev[s] = {
            k: jnp.concatenate([a[k][:K_uni], b[k], a[k][K_uni:]],
                               axis=0) for k in a}


def _apply_second_chance(enc, ctx, meas, trials_dev, evars_np):
    """Dispatch the extra trials, fetch their maps, and splice them
    into both the host cost maps and the device banks."""
    p = enc.params
    t2 = _extra_banks(enc.height, enc.width, int(p.enable_tb_split),
                      int(p.encoder_speed), ctx['seq_bipred'],
                      ctx['org_y_d'], ctx['org_u_d'], ctx['org_v_d'],
                      ctx['refY_d'], ctx['refU_d'], ctx['refV_d'],
                      evars_np, ctx['qpY'], ctx['qpC'], ctx['sign'],
                      ctx['sign_bi'])
    fetch_keys = ('ssd_coded', 'ssd_pred', 'bits', 'cbp_y', 'cbp_u',
                  'cbp_v', 'ssd_tb', 'bits_tb', 'cbp_tb_y',
                  'cbp_tb_u', 'cbp_tb_v')
    e_host = jax.device_get({s: {k: t2[s][k] for k in fetch_keys
                                 if k in t2[s]} for s in SIZES})
    K_uni = meas[SIZES[0]]['K_uni']
    for s in SIZES:
        m = meas[s]
        ey, ex, es = evars_np[s]
        z = np.zeros_like(ey)

        def ins(a, b):
            a = np.asarray(a)
            return np.concatenate([a[:K_uni], b.astype(a.dtype),
                                   a[K_uni:]], axis=0)

        m['mvy'] = ins(m['mvy'], ey)
        m['mvx'] = ins(m['mvx'], ex)
        m['slot'] = ins(m['slot'], es)
        m['mvy1'] = ins(m['mvy1'], z)
        m['mvx1'] = ins(m['mvx1'], z)
        m['slot1'] = ins(m['slot1'], z)
        m['bi'] = ins(m['bi'], z)
        for k in fetch_keys:
            if k in m:
                m[k] = ins(m[k], np.asarray(e_host[s][k]))
        m['K_uni'] = K_uni + K_EXTRA
    _merge_banks(trials_dev, t2, K_uni)


# ---------------------------------------------------------------------------
# Frame driver
# ---------------------------------------------------------------------------

def _ref_stacks(enc, refs):
    """Device-resident padded reference stacks [R, Hp, Wp].

    Planes are uploaded at most once per reference frame and cached on
    device (keyed by frame number; interpolated references separately,
    they share the current frame's number). Frames the device pipeline
    itself reconstructed are inserted straight from the device filter
    stage without ever crossing the link (see encode_inter_frame_device
    end) - in steady state a P-frame uploads only its org planes."""
    cache = getattr(enc, '_dev_ref_cache', None)
    if cache is None:
        cache = enc._dev_ref_cache = {}
    rec = getattr(enc, '_current_rec', None)
    # per-device slots: under the GOP-parallel encoder a reference
    # produced on one mesh device is copied device-to-device (the ICI
    # analog of the reference-plane all-gather) instead of re-uploaded
    dev = jax.config.jax_default_device
    planes = []
    keys = []
    for i, r in enumerate(refs):
        kind = 'i' if enc.ref_array[i] < 0 else 'r'
        key = (kind, r.frame_num)
        slot = cache.get(key)
        if slot is None:
            slot = cache[key] = {}
            # bounded: active refs live in a 33-deep sliding window;
            # an evicted-but-still-referenced frame just re-uploads
            while len(cache) > 40:
                cache.pop(next(iter(cache)))
        ent = slot.get(dev)
        if ent is None and slot:
            src = next(iter(slot.values()))
            ent = tuple(jax.device_put(a, dev) for a in src)
            slot[dev] = ent
        if ent is None:
            ent = (jnp.asarray(r.y), jnp.asarray(r.u), jnp.asarray(r.v))
            slot[dev] = ent
            if rec is not None:
                rec.setdefault('uploads', {})[key] = (r.y, r.u, r.v)
        planes.append(ent)
        keys.append(key)
    if rec is not None:
        rec['ref_keys'] = keys
    return (jnp.stack([e[0] for e in planes]),
            jnp.stack([e[1] for e in planes]),
            jnp.stack([e[2] for e in planes]))


def encode_inter_frame_device(enc, w, org_y, org_u, org_v):
    """Device-searched P-frame encode; returns (y, u, v) recon and
    writes the frame syntax through the exact host writers."""
    ctx = measure_inter_frame_device(enc, org_y, org_u, org_v)
    return finish_inter_frame_device(enc, w, ctx)


def measure_inter_frame_device(enc, org_y, org_u, org_v):
    """Stage 1 of the device P-frame encode: dispatch every
    measurement program (phases + ME + variants + per-size trials +
    intra search) and return a context WITHOUT any host sync - the
    GOP-parallel encoder dispatches one frame per mesh device
    back-to-back so the level's frames measure concurrently, then
    drains finish_inter_frame_device in coding order."""
    import math
    from .device_intra import search_intra_frame_device

    W, H = enc.width, enc.height
    p = enc.params
    qpY = enc.frame_qp
    qpC = int(CHROMA_QP[qpY])
    lam = enc.lambda_
    lam_me = math.sqrt(lam)
    R = enc.num_ref
    fast32 = p.encoder_speed > 1
    fast64 = p.encoder_speed > 0

    refs = [enc.get_ref(i) for i in range(R)]
    # MV sign per reference slot: stream MVs fold toward future
    # references (B frames); matches the decoder's reconstruct_np
    # sign = frame_num > current for uni-prediction and
    # frame_num >= current for either bipred list (the interp ref has
    # frame_num == current, so the two differ there).
    sign = np.array([1 if r.frame_num > enc.frame_num else 0
                     for r in refs], np.int32)
    sign_bi = np.array([1 if r.frame_num >= enc.frame_num else 0
                        for r in refs], np.int32)

    # bipred trials ride along on B frames / bipred-enabled sequences:
    # the two prediction lists the reference's iterative search uses
    # (enc/encode_block.c:2115-2170): B frames list0/list1 = refs
    # (1, 2) with interp-ref else (0, 1); P frames (0, 1).
    has_bi = bool(p.enable_bipred) and R > 1
    bslot0, bslot1 = 0, 1
    if has_bi and enc.frame_type == 2 and enc.interp_ref:  # B + interp
        bslot0, bslot1 = 1, 2
    K_uni = 3 + R

    # optional device-program record (tools/device_encode_fps.py
    # replays the pure device pipeline from these)
    enc._current_rec = rec = (
        {} if getattr(enc, '_device_record', None) is not None else None)
    if rec is not None:
        rec.update(H=H, W=W, R=R, has_bi=has_bi, bslot0=bslot0,
                   bslot1=bslot1, seq_bipred=int(p.enable_bipred),
                   qpY=qpY, qpC=qpC, lam=lam, lam_me=lam_me,
                   sign=sign, sign_bi=sign_bi,
                   org_y=org_y, org_u=org_u, org_v=org_v,
                   speed=p.encoder_speed, tb_split=p.enable_tb_split,
                   nmodes=enc.num_intra_modes)
    refY_d, refU_d, refV_d = _ref_stacks(enc, refs)

    # --- device measurements: everything from the org/ref planes to
    # the per-(variant, block) cost maps runs as back-to-back device
    # programs with NO intermediate host sync; one batched fetch at
    # the end returns every map the decision walk reads. ---
    _t = TIMER
    org_y_d = jnp.asarray(org_y)
    org_u_d = jnp.asarray(org_u)
    org_v_d = jnp.asarray(org_v)
    sign_d = jnp.asarray(sign)
    sign_bi_d = jnp.asarray(sign_bi)
    with _t.stage('measure_dispatch'):
        if _fuse_dispatch():
            variants, trials_dev, intra_dev = _measure_all_fn(
                H, W, R, has_bi, bslot0, bslot1, int(p.enable_bipred),
                int(p.enable_tb_split), int(p.encoder_speed),
                int(enc.num_intra_modes))(
                org_y_d, org_u_d, org_v_d, refY_d, refU_d, refV_d,
                sign_d, sign_bi_d, jnp.float32(lam_me), jnp.int32(qpY),
                jnp.int32(qpC), jnp.float32(lam))
        else:
            # off-TPU: dispatch the parts separately - fusing only
            # saves per-call link latency, and one giant XLA CPU
            # compile is far slower than the sum of the parts
            variants = _measure_fn(
                H, W, R, has_bi, bslot0, bslot1, int(p.enable_bipred))(
                org_y_d, refY_d, refU_d, refV_d, sign_d, sign_bi_d,
                jnp.float32(lam_me))
            fast32 = p.encoder_speed > 1
            fast64 = p.encoder_speed > 0
            trials_dev = {}
            for s in SIZES:
                v = variants[s]
                fastY = (s == 64 and fast64) or fast32
                tb_s = p.enable_tb_split == 1 and s > 8
                fastY2 = s == 64 or fast32
                trials_dev[s] = _trial_fn(H, W, s, fastY, fast32,
                                          has_bi, tb_s, fastY2,
                                          int(p.enable_bipred))(
                    org_y_d, org_u_d, org_v_d, refY_d, refU_d, refV_d,
                    v['mvy'], v['mvx'], v['slot'], v['mvy1'],
                    v['mvx1'], v['slot1'], v['bi'], jnp.int32(qpY),
                    jnp.int32(qpC), sign_d, sign_bi_d)
            intra_dev = search_intra_frame_device(
                org_y_d, org_u_d, org_v_d, qpY, qpC, lam, W, H,
                p.encoder_speed > 1, enc.num_intra_modes,
                intra_quant=False)

    return dict(org_y=org_y, org_u=org_u, org_v=org_v,
                org_y_d=org_y_d, org_u_d=org_u_d, org_v_d=org_v_d,
                refY_d=refY_d, refU_d=refU_d, refV_d=refV_d,
                variants=variants,
                trials_dev=trials_dev, intra_dev=intra_dev,
                sign=sign, sign_bi=sign_bi, qpY=qpY, qpC=qpC, lam=lam,
                lam_me=lam_me, K_uni=K_uni, rec=rec,
                seq_bipred=int(p.enable_bipred))


def finish_inter_frame_device(enc, w, ctx):
    """Stage 2: one batched fetch of the measurement maps, host
    decision walk, final reconstruction + filters, syntax emission."""
    from .block import BlockInfo, BlockParam
    from .device_intra import intra_split_decisions
    W, H = enc.width, enc.height
    p = enc.params
    _t = TIMER
    (org_y, org_u, org_v) = (ctx['org_y'], ctx['org_u'], ctx['org_v'])
    (org_y_d, org_u_d, org_v_d) = (ctx['org_y_d'], ctx['org_u_d'],
                                   ctx['org_v_d'])
    refY_d, refU_d, refV_d = (ctx['refY_d'], ctx['refU_d'],
                              ctx['refV_d'])
    variants, trials_dev = ctx['variants'], ctx['trials_dev']
    intra_dev = ctx['intra_dev']
    sign, sign_bi = ctx['sign'], ctx['sign_bi']
    qpY, qpC = ctx['qpY'], ctx['qpC']
    lam, lam_me = ctx['lam'], ctx['lam_me']
    K_uni = ctx['K_uni']
    rec = ctx['rec']
    enc._current_rec = rec

    with _t.stage('measure_fetch'):
        fetch_keys = ('ssd_coded', 'ssd_pred', 'bits', 'cbp_y', 'cbp_u',
                      'cbp_v', 'ssd_tb', 'bits_tb', 'cbp_tb_y',
                      'cbp_tb_u', 'cbp_tb_v')
        var_keys = ('mvy', 'mvx', 'slot', 'mvy1', 'mvx1', 'slot1', 'bi')
        host = jax.device_get({
            'meas': {s: {k: trials_dev[s][k] for k in fetch_keys
                         if k in trials_dev[s]} for s in SIZES},
            'vars': {s: {k: variants[s][k] for k in var_keys}
                     for s in SIZES},
            'intra': intra_dev})
    meas = {}
    for s in SIZES:
        meas[s] = dict(host['vars'][s])
        meas[s]['K_uni'] = K_uni
        meas[s].update(host['meas'][s])
    intra_modes, intra_split, intra_costs = intra_split_decisions(
        host['intra'], W, H, return_costs=True)

    # --- decision walk ---
    enc.deblock_data.reset()
    with _t.stage('decide'):
        leaves, splits = _decide_frame(enc, meas, intra_modes,
                                       intra_costs, lam, lam_me)

    # second-chance round (speed <= 1): price the skip candidates the
    # first walk could not match, then decide again
    extra_vars = None
    if p.encoder_speed <= 1:
        with _t.stage('second_chance'):
            extra_vars = _second_chance(enc, ctx, meas, trials_dev,
                                        leaves)
            if extra_vars is not None:
                enc.deblock_data.reset()
                leaves, splits = _decide_frame(
                    enc, meas, intra_modes, intra_costs, lam, lam_me)
    if rec is not None:
        rec['extra_vars'] = extra_vars

    # --- final reconstruction (decoder's program) ---
    # narrow dtypes: these cell maps cross the host->device link every
    # frame (~3.6 MB/frame as int32 at 1080p through a ~32 MB/s
    # tunnel); int16/uint8 carry the same information at 1/3 the bytes
    H4, W4 = H // 4, W // 4
    mvxc = np.zeros((H4, W4), np.int16)
    mvyc = np.zeros((H4, W4), np.int16)
    slc = np.zeros((H4, W4), np.uint8)
    mvx1c = np.zeros((H4, W4), np.int16)
    mvy1c = np.zeros((H4, W4), np.int16)
    sl1c = np.zeros((H4, W4), np.uint8)
    bic = np.zeros((H4, W4), np.uint8)
    size_cells = np.zeros((H4, W4), np.uint8)
    coded = {s: [] for s in SIZES}
    intra_leaves = []
    for lf in leaves:
        cy, cx, cs = lf.ypos // 4, lf.xpos // 4, lf.size // 4
        if lf.mode == MODE_INTRA:
            intra_leaves.append(lf)
            continue
        size_cells[cy:cy + cs, cx:cx + cs] = lf.size
        mvxc[cy:cy + cs, cx:cx + cs] = lf.mv[0]
        mvyc[cy:cy + cs, cx:cx + cs] = lf.mv[1]
        slc[cy:cy + cs, cx:cx + cs] = lf.ref
        if lf.dir == 2:
            mvx1c[cy:cy + cs, cx:cx + cs] = lf.mv1[0]
            mvy1c[cy:cy + cs, cx:cx + cs] = lf.mv1[1]
            sl1c[cy:cy + cs, cx:cx + cs] = lf.ref1
            bic[cy:cy + cs, cx:cx + cs] = 1
        if lf.use_cbp:
            coded[lf.size].append(lf)

    # per-size chosen-variant index + coded mask over the full raster
    # block grid (static shapes: the jitted final stage is keyed on the
    # frame geometry alone)
    ksel = {}
    msk = {}
    mtb = {}
    for s in SIZES:
        N = (H // s) * (W // s)
        ksel[s] = np.zeros(N, np.int16)
        msk[s] = np.zeros(N, bool)
        mtb[s] = np.zeros(N, bool)
        for lf in coded[s]:
            ksel[s][lf.idx] = lf.k
            if lf.tb:
                mtb[s][lf.idx] = True
            else:
                msk[s][lf.idx] = True

    # per-cell stream MVs -> visual MVs (future-ref sign fold; bipred
    # cells fold both lists by the bipred sign)
    sg0 = np.where(bic != 0, sign_bi[slc], sign[slc]) != 0
    mvxc_v = np.where(sg0, -mvxc, mvxc).astype(np.int16)
    mvyc_v = np.where(sg0, -mvyc, mvyc).astype(np.int16)
    sg1 = sign_bi[sl1c] != 0
    mvx1c_v = np.where(sg1, -mvx1c, mvx1c).astype(np.int16)
    mvy1c_v = np.where(sg1, -mvy1c, mvy1c).astype(np.int16)

    intra_arr = None
    if intra_leaves:
        intra_arr = _intra_scan_arrays(intra_leaves, H, W)

    fin = {'ksel': ksel, 'msk': msk, 'mtb': mtb,
           'cells': (mvxc_v, mvyc_v, slc, mvx1c_v, mvy1c_v, sl1c, bic),
           'size_cells': size_cells,
           'has_bi_cells': bool(bic.any()), 'intra': intra_arr}
    if rec is not None:
        rec['fin'] = fin

    from .device_intra import use_pallas_enc
    fused = _fuse_dispatch() and (use_pallas_enc(H, W)
                                  or fin['intra'] is None)
    filt = None
    if fused:
        deblocking = bool(p.deblocking)
        clpf = bool(p.clpf)
        # the native decision walk keeps its side info in C; replay
        # the leaf stores (identical to emission-time
        # store_deblock_data for every packed field except intra cbp,
        # which the in-program CLPF patch corrects from the scans)
        enc.deblock_data.reset()
        for lf in leaves:
            _store_leaf_dd(enc.deblock_data, lf, meas[lf.size])
        ddp = JK.pack_ddp({k: getattr(enc.deblock_data, k) for k in
                           ("mode", "cbp_y", "mv0x", "mv0y", "mv1x",
                            "mv1y", "tb_split", "size", "pb_part")})
        cy8, cu8, cv8 = _clpf_cand_masks(enc.deblock_data, H, W)
        cm3 = np.stack([cy8, cu8, cv8])
        with _t.stage('final_mc'):
            (packed_d, bit_sb_d, refYp, refUp, refVp, q16y_d,
             q16c_d) = _dispatch_final_fused(
                (H, W), trials_dev, refY_d, refU_d, refV_d, fin,
                org_y_d, org_u_d, org_v_d, qpY, qpC, p.encoder_speed,
                ctx['seq_bipred'], deblocking, clpf, ddp, cm3)
        intra_q_dev = None
        if fin['intra'] is not None:
            nI = len(intra_leaves)
            intra_q_dev = {'qy': q16y_d[:nI, 0], 'qu': q16c_d[:nI, 0],
                           'qv': q16c_d[:nI, 1]}
        filt = (packed_d, bit_sb_d, cy8, cu8, cv8, deblocking, clpf,
                ddp, refYp, refUp, refVp)
    else:
        with _t.stage('final_mc'):
            y_d, u_d, v_d, intra_q_dev = _dispatch_final(
                H, W, trials_dev, refY_d, refU_d, refV_d, fin, org_y_d,
                org_u_d, org_v_d, qpY, qpC, p.encoder_speed,
                ctx['seq_bipred'])

    # --- chosen-coefficient gather (async index ops; fetched together
    # with the intra banks in ONE device_get below) ---
    gather_dev = {}
    tbms = {}
    for s in SIZES:
        lst = coded[s]
        if lst:
            ks = jnp.asarray(np.array([lf.k for lf in lst], np.int32))
            sel = jnp.asarray(np.array([lf.idx for lf in lst], np.int32))
            g = {'qy': trials_dev[s]['qy'][ks, sel],
                 'qu': trials_dev[s]['qu'][ks, sel],
                 'qv': trials_dev[s]['qv'][ks, sel]}
            tbm = np.array([bool(lf.tb) for lf in lst])
            tbms[s] = tbm
            if tbm.any():
                g['qy_tb'] = trials_dev[s]['qy_tb'][ks, sel]
                g['qu_tb'] = trials_dev[s]['qu_tb'][ks, sel]
                g['qv_tb'] = trials_dev[s]['qv_tb'][ks, sel]
            gather_dev[s] = g
    with _t.stage('fetch_coeffs'):
        got = jax.device_get({'intra': intra_q_dev, 'g': gather_dev})
    intra_q = got['intra'] or {}
    if intra_leaves:
        if 'cy' not in intra_q:
            # fused path ships q16 banks only; cbp == any nonzero
            intra_q['cy'] = (intra_q['qy'] != 0).any(axis=(1, 2))
            intra_q['cu'] = (intra_q['qu'] != 0).any(axis=(1, 2))
            intra_q['cv'] = (intra_q['qv'] != 0).any(axis=(1, 2))
        intra_q['index'] = {(lf.ypos, lf.xpos): i
                            for i, lf in enumerate(intra_leaves)}
    coeff_host = {}
    for s, g in got['g'].items():
        lst = coded[s]
        qy, qu, qv = g['qy'], g['qu'], g['qv']
        tbm = tbms[s]
        if tbm.any():
            # tb leaves carry the quadrant-layout banks instead
            qy = np.where(tbm[:, None, None], g['qy_tb'], qy)
            qu = np.where(tbm[:, None, None], g['qu_tb'], qu)
            qv = np.where(tbm[:, None, None], g['qv_tb'], qv)
        coeff_host[s] = {
            'qy': qy, 'qu': qu, 'qv': qv,
            'index': {(lf.ypos, lf.xpos): i
                      for i, lf in enumerate(lst)}}

    enc.deblock_data.reset()

    if os.environ.get("THOR_NATIVE_EMIT", "1") != "0":
        try:
            with _t.stage('emit'):
                _emit_native(enc, w, leaves, meas, coeff_host, intra_q)
            if filt is not None:
                return _finish_frame_fused(enc, w, *filt)
            return _finish_frame_device(enc, w, y_d, u_d, v_d, org_y_d,
                                        qpY, qpC)
        except Exception as e:
            # See _decide_frame: native-path failures must be loud.
            if "PYTEST_CURRENT_TEST" in os.environ:
                raise
            import logging
            logging.getLogger(__name__).warning(
                "native emit failed, falling back to Python: %r", e)
            enc.deblock_data.reset()

    by_pos = {(lf.ypos, lf.xpos, lf.size): lf for lf in leaves}

    def emit(s, y0, x0):
        if y0 >= H or x0 >= W:
            return
        full = y0 + s <= H and x0 + s <= W
        binfo = BlockInfo(
            size=s, ypos=y0, xpos=x0,
            bwidth=min(s, W - x0), bheight=min(s, H - y0),
            max_num_tb_part=2 if p.enable_tb_split == 1 else 1,
            max_num_pb_part=4 if p.enable_pb_split else 1)
        binfo.block_context = find_block_contexts(
            y0, x0, H, W, s, enc.deblock_data,
            bool(p.use_block_contexts))
        key = (y0, x0, s)
        if key not in by_pos:
            h = s // 2
            if full:
                write_super_mode(w, enc, binfo, MODE_SKIP, 0, 1)
            else:
                w.putbits(1, 0)
            if s == MAX_BLOCK_SIZE and p.max_delta_qp:
                # split 64-SB: the decoder reads a delta-QP right
                # after the split signal; always code dqp = 0
                from .syntax import write_delta_qp
                write_delta_qp(w, 0)
            emit(h, y0, x0)
            emit(h, y0 + h, x0)
            emit(h, y0, x0 + h)
            emit(h, y0 + h, x0 + h)
            return
        lf = by_pos[key]
        skip_cands = get_mv_skip(y0, x0, W, H, s, enc.deblock_data)
        binfo.skip_candidates = skip_cands
        binfo.num_skip_vec = len(skip_cands)
        binfo.mvp = get_mv_pred(y0, x0, W, H, s, enc.deblock_data)

        def attach_coeffs(bp, lf):
            ch = coeff_host[s]
            i = ch['index'][(y0, x0)]
            bp.coeff_y = ch['qy'][i]
            bp.coeff_u = ch['qu'][i]
            bp.coeff_v = ch['qv'][i]
            if lf.tb:
                # quadrant cbp masks (bit 3-k), tb_split payload
                bp.cbp = (int(meas[s]['cbp_tb_y'][lf.k, lf.idx]),
                          int(meas[s]['cbp_tb_u'][lf.k, lf.idx]),
                          int(meas[s]['cbp_tb_v'][lf.k, lf.idx]))
            else:
                bp.cbp = (int(meas[s]['cbp_y'][lf.k, lf.idx]),
                          int(meas[s]['cbp_u'][lf.k, lf.idx]),
                          int(meas[s]['cbp_v'][lf.k, lf.idx]))

        bp = BlockParam(mode=lf.mode)
        if lf.mode in (MODE_SKIP, MODE_MERGE):
            bp.skip_idx = lf.skip_idx
            c = skip_cands[lf.skip_idx]
            binfo.num_merge_vec = len(skip_cands)
            bp.ref_idx0, bp.ref_idx1 = c.ref_idx0, c.ref_idx1
            bp.mv_arr0 = ((c.mv0x, c.mv0y),) * 4
            bp.mv_arr1 = ((c.mv1x, c.mv1y),) * 4
            bp.dir = c.bipred_flag
            if lf.mode == MODE_MERGE:
                bp.tb_param = 0
                attach_coeffs(bp, lf)
            else:
                bp.cbp = (0, 0, 0)
        elif lf.mode == MODE_INTER:
            bp.ref_idx0 = lf.ref
            bp.mv_arr0 = (lf.mv,) * 4
            bp.pb_part = 0
            bp.tb_param = lf.tb
            bp.tb_split = lf.tb
            if lf.use_cbp:
                attach_coeffs(bp, lf)
            else:
                bp.cbp = (0, 0, 0)
        elif lf.mode == MODE_BIPRED:
            bp.ref_idx0, bp.ref_idx1 = lf.ref, lf.ref1
            bp.mv_arr0 = (lf.mv,) * 4
            bp.mv_arr1 = (lf.mv1,) * 4
            bp.dir = 2
            bp.pb_part = 0
            bp.tb_param = 0
            if lf.use_cbp:
                attach_coeffs(bp, lf)
            else:
                bp.cbp = (0, 0, 0)
        else:  # INTRA
            bp.intra_mode = lf.intra_mode
            bp.dir = -1
            i = intra_q['index'][(y0, x0)]
            sc = s // 2
            qs, qsc = min(s, 16), min(sc, 16)
            cy = np.zeros((s, s), np.int16)
            cy[:qs, :qs] = intra_q['qy'][i][:qs, :qs]
            cu = np.zeros((sc, sc), np.int16)
            cu[:qsc, :qsc] = intra_q['qu'][i][:qsc, :qsc]
            cv = np.zeros((sc, sc), np.int16)
            cv[:qsc, :qsc] = intra_q['qv'][i][:qsc, :qsc]
            bp.coeff_y, bp.coeff_u, bp.coeff_v = cy, cu, cv
            bp.cbp = (int(intra_q['cy'][i]), int(intra_q['cu'][i]),
                      int(intra_q['cv'][i]))
            bp.tb_param = 0
        write_block(w, enc, binfo, bp)
        binfo.block_param = bp
        enc.store_deblock_data(binfo)

    with _t.stage('emit'):
        for k in range(0, H, MAX_BLOCK_SIZE):
            for l in range(0, W, MAX_BLOCK_SIZE):
                emit(MAX_BLOCK_SIZE, k, l)

    if filt is not None:
        return _finish_frame_fused(enc, w, *filt)
    return _finish_frame_device(enc, w, y_d, u_d, v_d, org_y_d, qpY,
                                qpC)


def _finish_frame_device(enc, w, y_d, u_d, v_d, org_y_d, qpY, qpC):
    """Post-emission device stages: in-loop filters + CLPF decision on
    device, per-SB CLPF bit emission, ONE packed recon fetch, and the
    padded reference planes cached device-side for the next frame
    (no host round trip of the reference chain)."""
    from ..codec.constants import BETA_TABLE, TC_TABLE
    W_, H = enc.width, enc.height
    p = enc.params
    _t = TIMER
    deblocking = bool(p.deblocking)
    clpf = bool(p.clpf)
    SBH, SBW = H // MAX_BLOCK_SIZE, W_ // MAX_BLOCK_SIZE

    with _t.stage('filters'):
        ddp = JK.pack_ddp({k: getattr(enc.deblock_data, k) for k in
                           ("mode", "cbp_y", "mv0x", "mv0y", "mv1x",
                            "mv1y", "tb_split", "size", "pb_part")})
        cy8, cu8, cv8 = _clpf_cand_masks(enc.deblock_data, H, W_)
        packed, bit_sb_d, refY, refU, refV = _filter_fn(
            H, W_, deblocking, clpf)(
            y_d, u_d, v_d, org_y_d, jnp.asarray(ddp),
            jnp.asarray(cy8), jnp.asarray(cu8), jnp.asarray(cv8),
            jnp.int32(BETA_TABLE[qpY]), jnp.int32(TC_TABLE[qpY]),
            jnp.int32(TC_TABLE[qpC]))

    # cache the device-resident padded reference planes for the next
    # frame's ME/MC (sliding-window twin of encode_frame's RefFrame)
    cache = getattr(enc, '_dev_ref_cache', None)
    if cache is None:
        cache = enc._dev_ref_cache = {}
    cache[('r', enc.frame_num)] = {
        jax.config.jax_default_device: (refY, refU, refV)}
    while len(cache) > 40:
        cache.pop(next(iter(cache)))

    rec = getattr(enc, '_current_rec', None)
    if rec is not None:
        rec.update(ddp=ddp, cy8=cy8, cu8=cu8, cv8=cv8,
                   deblocking=deblocking, clpf=clpf,
                   own_key=('r', enc.frame_num))
        enc._device_record.append(rec)
        enc._current_rec = None

    with _t.stage('fetch_recon'):
        # one packed device->host fetch (the tunnel pays ~80 ms RTT
        # per blocking transfer)
        got = jax.device_get({'p': packed, 'b': bit_sb_d})
    ph = got['p']
    y = ph[:H]
    u = ph[H:, :W_ // 2]
    v = ph[H:, W_ // 2:]

    if clpf:
        # frame-level CLPF signalling + per-SB decision bits
        # (encode_frame.c:61 + Encoder._clpf_frame bit loop)
        w.putbits(1, 1)
        w.putbits(1, 0)
        if SBH > 0 and SBW > 0:
            cand_sb = (cy8 | cu8 | cv8)[:SBH * 8, :SBW * 8] \
                .reshape(SBH, 8, SBW, 8).any(axis=(1, 3))
            if cand_sb.any():
                bit_sb = got['b']
                for k in range(SBH):
                    for l in range(SBW):
                        if cand_sb[k, l]:
                            w.putbits(1, 1 if bit_sb[k, l] else 0)
    enc._filters_done_on_device = True
    return y, u, v


def _finish_frame_fused(enc, w, packed_d, bit_sb_d, cy8, cu8, cv8,
                        deblocking, clpf, ddp, refYp, refUp, refVp):
    """Tail of the fused finish path: cache the device-resident padded
    references, record the replay fields, ONE packed fetch, per-SB
    CLPF bit emission (filters already ran inside _final_all)."""
    W_, H = enc.width, enc.height
    _t = TIMER
    SBH, SBW = H // MAX_BLOCK_SIZE, W_ // MAX_BLOCK_SIZE
    cache = getattr(enc, '_dev_ref_cache', None)
    if cache is None:
        cache = enc._dev_ref_cache = {}
    cache[('r', enc.frame_num)] = {
        jax.config.jax_default_device: (refYp, refUp, refVp)}
    while len(cache) > 40:
        cache.pop(next(iter(cache)))

    rec = getattr(enc, '_current_rec', None)
    if rec is not None:
        rec.update(ddp=ddp, cy8=cy8, cu8=cu8, cv8=cv8,
                   deblocking=deblocking, clpf=clpf,
                   own_key=('r', enc.frame_num))
        enc._device_record.append(rec)
        enc._current_rec = None

    with _t.stage('fetch_recon'):
        got = jax.device_get({'p': packed_d, 'b': bit_sb_d})
    ph = got['p']
    y = ph[:H]
    u = ph[H:, :W_ // 2]
    v = ph[H:, W_ // 2:]

    if clpf:
        w.putbits(1, 1)
        w.putbits(1, 0)
        if SBH > 0 and SBW > 0:
            cand_sb = (cy8 | cu8 | cv8)[:SBH * 8, :SBW * 8] \
                .reshape(SBH, 8, SBW, 8).any(axis=(1, 3))
            if cand_sb.any():
                bit_sb = got['b']
                for k in range(SBH):
                    for l in range(SBW):
                        if cand_sb[k, l]:
                            w.putbits(1, 1 if bit_sb[k, l] else 0)
    enc._filters_done_on_device = True
    return y, u, v


# ---------------------------------------------------------------------------
# Device-throughput replay (tools/device_encode_fps.py)
# ---------------------------------------------------------------------------

def replay_device_frame(rec, refstate):
    """Re-dispatch one recorded frame's device programs - measurement
    (phases + ME + variants + trials + intra search), final
    reconstruction + intra scan, in-loop filters - against the
    device-resident reference chain, with NO host sync. Inserts this
    frame's padded reference planes into `refstate` and returns the
    packed recon device array (sync only when the caller materializes
    it).

    The recorded host decisions stand in for the decide walk: the
    device programs are deterministic, so the replayed streams' inputs
    equal the live run's. This is the encode twin of
    tools/device_decode_fps.py: the throughput a locally-attached chip
    sustains when the (native, ~ms) host walk overlaps device compute
    instead of waiting on an 80 ms tunnel round trip per fetch."""
    H, W, R = rec['H'], rec['W'], rec['R']
    for key, (py, pu, pv) in rec.get('uploads', {}).items():
        if key not in refstate:
            refstate[key] = (jnp.asarray(py), jnp.asarray(pu),
                             jnp.asarray(pv))
    refY = jnp.stack([refstate[k][0] for k in rec['ref_keys']])
    refU = jnp.stack([refstate[k][1] for k in rec['ref_keys']])
    refV = jnp.stack([refstate[k][2] for k in rec['ref_keys']])
    org_y_d = jnp.asarray(rec['org_y'])
    org_u_d = jnp.asarray(rec['org_u'])
    org_v_d = jnp.asarray(rec['org_v'])
    sign_d = jnp.asarray(rec['sign'])
    sign_bi_d = jnp.asarray(rec['sign_bi'])
    qpY, qpC = rec['qpY'], rec['qpC']
    speed = rec['speed']
    fast32 = speed > 1
    fast64 = speed > 0

    variants, trials_dev, _intra = _measure_all_fn(
        H, W, R, rec['has_bi'], rec['bslot0'], rec['bslot1'],
        rec['seq_bipred'], rec['tb_split'], speed, rec['nmodes'])(
        org_y_d, org_u_d, org_v_d, refY, refU, refV, sign_d,
        sign_bi_d, jnp.float32(rec['lam_me']), jnp.int32(qpY),
        jnp.int32(qpC), jnp.float32(rec['lam']))
    if rec.get('extra_vars') is not None:
        t2 = _extra_banks(H, W, rec['tb_split'], speed,
                          rec['seq_bipred'], org_y_d, org_u_d,
                          org_v_d, refY, refU, refV,
                          rec['extra_vars'], qpY, qpC, rec['sign'],
                          rec['sign_bi'])
        _merge_banks(trials_dev, t2, 3 + R)

    from .device_intra import use_pallas_enc
    if _fuse_dispatch() and (use_pallas_enc(H, W)
                             or rec['fin']['intra'] is None):
        cm3 = np.stack([rec['cy8'], rec['cu8'], rec['cv8']])
        packed, _bit, refYp, refUp, refVp, _qy, _qc = \
            _dispatch_final_fused(
                (H, W), trials_dev, refY, refU, refV, rec['fin'],
                org_y_d, org_u_d, org_v_d, qpY, qpC, speed,
                rec['seq_bipred'], rec['deblocking'], rec['clpf'],
                rec['ddp'], cm3)
        refstate[rec['own_key']] = (refYp, refUp, refVp)
        return packed

    y_d, u_d, v_d, _ = _dispatch_final(
        H, W, trials_dev, refY, refU, refV, rec['fin'], org_y_d,
        org_u_d, org_v_d, qpY, qpC, speed, rec['seq_bipred'])

    from ..codec.constants import BETA_TABLE, TC_TABLE
    packed, _, refYp, refUp, refVp = _filter_fn(
        H, W, rec['deblocking'], rec['clpf'])(
        y_d, u_d, v_d, org_y_d, jnp.asarray(rec['ddp']),
        jnp.asarray(rec['cy8']), jnp.asarray(rec['cu8']),
        jnp.asarray(rec['cv8']), jnp.int32(BETA_TABLE[qpY]),
        jnp.int32(TC_TABLE[qpY]), jnp.int32(TC_TABLE[qpC]))
    refstate[rec['own_key']] = (refYp, refUp, refVp)
    return packed
