"""Pallas TPU kernel for the ENCODER's exact intra-recon scan.

The encoder's final intra pass is the same raster dependency the
decoder's intra scan has (each TU's prediction context reads the
reconstruction of earlier TUs) plus the coding half: forward
transform, quantization (with the reference's unconditional zero-run
"RDOQ light" pass, enc/encode_block.c:134-168), dequantization and
inverse transform. Round 4 ran it as a lax.scan over TUs (~1 ms/TU:
the nested 254-step zero-run scan per TU dominates) - ~0.5 s/frame at
1080p on intra-heavy content, the second-largest wall of the device
encoder after ME.

This kernel runs the WHOLE scan as one pallas_call, following the
decoder's ops/pallas_intra.py design (VMEM-resident plane + transpose,
sequential in-kernel TU loop, matmul-based context shuffles) and
adding the encode math with exact integer arithmetic:

- 10-mode prediction reuses pallas_intra._predict verbatim;
- transforms run on the MXU in f32 with int16 operands split into
  high/low bytes (two matmuls per stage), so every partial sum is an
  integer < 2^24 and the accumulation is bit-exact;
- quantization runs on the zigzag scan vector, produced from the
  block-layout coefficients by a pair of one-hot selection matmuls
  (Mosaic has no arbitrary permute);
- the zero-run adjustment - inherently sequential per block - runs as
  a while_loop over TRIGGERS instead of a scan over positions: the
  trigger condition is a vector expression over the scan vector, the
  first trigger at/after the cursor is located with a masked min, the
  (at most one-lane) modification is applied, and the cursor advances.
  This is exactly the sequential semantics (a modification at p only
  affects conditions at p+1..p+4, all >= the new cursor) at ~triggers
  instead of ~256 steps per TU.

Arithmetic parity with the XLA scan (enc/device_intra._encode_scan_fn)
is covered by tests/test_pallas_enc_intra.py in interpret mode;
end-to-end stream validity by the device-encoder round trips.

Reference behavior: enc/encode_block.c:75-472 (quantize + zero-run),
common/transform.c:249-518, common/intra_prediction.c:57-388.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_intra import (PADI, _predict, _rot, _dot, _f32, _round_up)
from ..codec.constants import zigzag_for
from ..codec.dct_tables import TMAT_4, TMAT_8, TMAT_16, TMAT_32

# Record fields
F_TY = 0
F_TX = 1
F_SIZE = 2    # index into the plane class's SIZES tuple
F_MODE = 3
F_TOPLEN = 4
F_LEFTLEN = 5
F_CBX = 6
F_VALID = 7
NF = 8

SIZES_Y = (8, 16, 32, 64)
SIZES_C = (4, 8, 16, 32)

_TMAT = {4: np.array(TMAT_4, np.int64), 8: np.array(TMAT_8, np.int64),
         16: np.array(TMAT_16, np.int64), 32: np.array(TMAT_32, np.int64)}


def _dotx(a, b, ca=1, cb=0):
    """f32 matmul at HIGHEST precision: the MXU's default single-pass
    bf16 truncates operands to 8 mantissa bits, which is fine for the
    context shuffles of pallas_intra (<= 10-bit pixel values) but NOT
    for transform/coefficient operands (up to 16 bits). HIGHEST runs
    the multi-pass f32 decomposition - exact for the integer ranges
    here (all partial sums < 2^24)."""
    return lax.dot_general(_f32(a), _f32(b),
                           (((ca,), (cb,)), ((), ())),
                           precision=lax.Precision.HIGHEST)


def _scan_consts(qs: int):
    """One-hot flatten/unflatten matrices for the zigzag scan order.

    zigzag_for maps row-major block index -> scan position, i.e. for
    scan position p the block coords are (r(p), c(p)) with
    zz[r*qs + c] = p. Returns (J [qs, Nc], Imask [qs, Nc], JT [Nc, qs])
    f32 with  svec = ones(1,qs) @ ((blk @ J) * Imask)  and
    blk = (ones(qs,1) @ svec * Imask) @ JT.
    """
    zz = np.asarray(zigzag_for(qs))
    Nc = qs * qs
    r = np.zeros(Nc, np.int64)
    c = np.zeros(Nc, np.int64)
    for ij in range(Nc):
        p = zz[ij]
        r[p], c[p] = ij // qs, ij % qs
    J = (np.arange(qs)[:, None] == c[None, :]).astype(np.float32)
    Im = (np.arange(qs)[:, None] == r[None, :]).astype(np.float32)
    return J, Im, J.T.copy()


def _wrap16(x):
    """int32 -> int16 value range with wraparound (C int16_t store)."""
    return ((x + 32768) & 65535) - 32768


def _split_matmul(M_f32, x_i32, n_take=None):
    """Exact  out[i,j] = sum_k M[i,k] * x[j,k]  for int16-valued x via
    high/low byte split (all partial sums integers < 2^24)."""
    lo = x_i32 & 255
    hi = (x_i32 - lo) >> 8
    a = _dotx(M_f32, _f32(hi), ca=1, cb=1)
    b = _dotx(M_f32, _f32(lo), ca=1, cb=1)
    return a.astype(jnp.int32) * 256 + b.astype(jnp.int32)


def _fold(x, s: int, f: int):
    """f x f box-sum fold of an (s, s) i32 block to (s/f, s/f) via
    one-hot matmuls (sums < 2^24 stay exact in f32)."""
    n = s // f
    r_ = lax.broadcasted_iota(jnp.int32, (n, s), 0)
    k_ = lax.broadcasted_iota(jnp.int32, (n, s), 1)
    F = (k_ // f == r_)
    mid = _dotx(F, _f32(x), ca=1, cb=0)           # [n, s]
    out = _dotx(mid, F, ca=1, cb=1)               # [n, n]
    return out.astype(jnp.int32)


def _embed(x, n_out: int):
    """Zero-extend an (n, n) i32 block to (n_out, n_out) top-left via
    one-hot placement matmuls (Mosaic has no sublane concat/pad)."""
    n = x.shape[0]
    if n == n_out:
        return x
    i_ = lax.broadcasted_iota(jnp.int32, (n_out, n), 0)
    k_ = lax.broadcasted_iota(jnp.int32, (n_out, n), 1)
    E = (i_ == k_)                                # [n_out, n]
    k2 = lax.broadcasted_iota(jnp.int32, (n, n_out), 0)
    j2 = lax.broadcasted_iota(jnp.int32, (n, n_out), 1)
    E2 = (k2 == j2)                               # [n, n_out]
    mid = _dotx(E, _f32(x), ca=1, cb=0)            # [n_out, n]
    return _dotx(mid, E2, ca=1, cb=0).astype(jnp.int32)


def _fwd_transform(resid, s: int, fast: bool, mats):
    """Block-layout forward transform (ops/jax_kernels.
    fwd_transform_batch semantics for one block). Returns [qs, qs] i32
    (int16-valued)."""
    qs = min(s, 16)
    shift_1 = int(np.log2(s))
    shift_2 = shift_1 + 5
    inb = resid
    n = s
    if s > 16 and fast:
        shift_1 += 1 + (1 if s == 64 else 0)
        shift_2 = 9
        inb = _fold(resid, s, s // 16)
        n = 16
    elif s == 64:
        shift_1, shift_2 = 7, 10
        inb = _fold(resid, s, 2)
        n = 32
    M = mats[n][:qs]                              # f32 [qs, n]
    add_1, add_2 = 1 << (shift_1 - 1), 1 << (shift_2 - 1)
    # stage 1: 9-bit residual operand - a single f32 matmul is exact
    tmp = _dotx(M, _f32(inb), ca=1, cb=1).astype(jnp.int32)
    tmp = _wrap16((tmp + add_1) >> shift_1)       # [qs, n]
    coeff = _split_matmul(M, tmp)                 # [qs, qs]
    return _wrap16((coeff + add_2) >> shift_2)


def _idct(rc, n: int, mats):
    """[n, n] int16-valued i32 coeff -> [n, n] i32 residual
    (jax_kernels.idct_batch semantics for one block)."""
    M = mats[n]
    # stage 1: tmp[i,j] = sum_k M[k,i] * rc[k,j]
    lo = rc & 255
    hi = (rc - lo) >> 8
    a = _dotx(_f32(hi), M, ca=0, cb=0)
    b = _dotx(_f32(lo), M, ca=0, cb=0)
    tmp = a.astype(jnp.int32) * 256 + b.astype(jnp.int32)
    # dot with contraction (0, 0) gives out[j, i]; realign by swapping
    # the roles: tmp_T[i, j] desired = sum_k M[k,i] rc[k,j] ->
    # computed[ j?, i?]: dot_general(hi [n,n], M [n,n], contract k=0,0)
    # yields out[j_free_of_hi, i_free_of_M] = sum_k hi[k, j] M[k, i]
    # which is tmp[i, j] TRANSPOSED; keep consistently transposed
    # through stage 2 to avoid any in-kernel transpose:
    # tmpT[j, i] = tmp[i, j]
    tmpT = jnp.clip((tmp + 64) >> 7, -32768, 32767)   # [j, i]
    # stage 2: out[i,j] = sum_k tmp[i,k] M[k,j]
    #        = sum_k tmpT[k, i] M[k, j] -> dot contract (0, 0) gives
    # out2[i_free_of_tmpT, j_free_of_M] = out[i, j]
    lo2 = tmpT & 255
    hi2 = (tmpT - lo2) >> 8
    a2 = _dotx(_f32(hi2), M, ca=0, cb=0)
    b2 = _dotx(_f32(lo2), M, ca=0, cb=0)
    out = a2.astype(jnp.int32) * 256 + b2.astype(jnp.int32)
    return jnp.clip((out + 2048) >> 12, -32768, 32767)


def _quantize_rdoq(svec, pos, Nc: int, intra: bool, scale, shift2,
                   thr):
    """Scan-order quantization + the zero-run pass on a (1, Nc) i32
    scan vector. Returns (1, Nc) i32 levels.

    Mirrors jax_kernels.quantize_fwd_batch + _rdoq_light with
    chroma=False (the encoder scan's shipped semantics for both
    planes)."""
    off_last = jnp.left_shift(jnp.int32(38 if intra else -26),
                              shift2 - 8)
    off0 = jnp.left_shift(jnp.int32(102 if intra else 51), shift2 - 8)
    off1 = jnp.left_shift(jnp.int32(115 if intra else 90), shift2 - 8)

    absv = jnp.abs(svec)
    absc = scale * absv
    lvl_l = jnp.abs(absc + off_last) >> shift2
    last_pos = jnp.max(jnp.where(lvl_l != 0, pos, -1))
    level0 = absc >> shift2
    off = jnp.where(level0 == 0, off0, off1)
    level = (absc + off) >> shift2
    sgn = jnp.where(svec < 0, -1, 1)
    q0 = jnp.where(pos <= last_pos, sgn * level, 0)

    # zero-run pass: fixed per-position vectors. NOTE: the zero-run
    # comparisons use the RAW |scoeff| magnitudes (enc/encode_block.c
    # :134-168 / jax_kernels._rdoq_light), not the scaled ones.
    def sh1(v):
        return jnp.concatenate([jnp.zeros((1, 1), v.dtype), v[:, :-1]],
                               axis=1)
    c0 = absv
    c1 = sh1(absv)
    c2 = sh1(sh1(absv))
    BIG = jnp.int32(Nc + 9)

    def mask_of(q, cursor):
        qm1 = sh1(q)
        qm2 = sh1(qm1)
        qm3 = sh1(qm2)
        qm4 = sh1(qm3)
        flag = jnp.ones_like(q, dtype=bool)
        flag &= ~((pos > 2) & (jnp.abs(qm3) > 1))
        flag &= ~((pos > 3) & (jnp.abs(qm4) > 1) & (jnp.abs(qm3) > 0))
        flag &= ~(pos == 2)
        act = (flag & (qm2 == 0) & (qm1 == 0) & (jnp.abs(q) > 1)
               & (pos < Nc) & (pos >= cursor))
        return act

    def cond(carry):
        return carry[2]

    def body(carry):
        q, cursor, _ = carry
        act = mask_of(q, cursor)
        exists = jnp.any(act)
        p = jnp.min(jnp.where(act, pos, BIG))

        def at(v):
            return jnp.sum(jnp.where(pos == p, v, 0))
        k4 = jnp.maximum(at(c1), at(c2))
        move_cur = at(c0) + k4 < thr
        m1_over_m2 = at(c1) > at(c2)
        tgt = jnp.where(move_cur, p,
                        jnp.where(m1_over_m2, p - 1, p - 2))
        q = jnp.where(exists & (pos == tgt), sgn, q)
        return (q, p + 1, exists)

    q, _, _ = lax.while_loop(cond, body,
                             (q0, jnp.int32(2), jnp.bool_(True)))
    return q


def _enc_scan_kernel(nv_ref, recs_ref, qp_ref, plane_ref, planeT_ref,
                     org_ref, mats_refs, scans_refs, outP_ref, outT_ref,
                     outQ_ref, sem_ref, *, SIZES, C, K, fast, intra):
    """One chunk of K coding-order TUs."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        cp0 = pltpu.make_async_copy(plane_ref, outP_ref, sem_ref.at[0])
        cp1 = pltpu.make_async_copy(planeT_ref, outT_ref, sem_ref.at[1])
        cp0.start()
        cp1.start()
        cp0.wait()
        cp1.wait()

    nv = nv_ref[pl.program_id(0)]
    scale = qp_ref[0]
    qp6 = qp_ref[1]
    fac = qp_ref[2]
    dq73 = qp_ref[3]
    mats = {m.shape[0]: m[:] for m in mats_refs}

    def ctx_row(P, c, ry, rx):
        ry8 = pl.multiple_of((ry >> 3) << 3, 8)
        rx128 = pl.multiple_of((rx >> 7) << 7, 128)
        win = P[c, pl.ds(ry8, 8), pl.ds(rx128, 384)].astype(jnp.int32)
        win = _rot(win, ry - ry8, 0)
        win = _rot(win, rx - rx128, 1)
        return win[0:1, 0:256]

    def org_win(c, iy, ix, s):
        WH = _round_up(s + 8, 8)
        ry8 = pl.multiple_of((iy >> 3) << 3, 8)
        rx128 = pl.multiple_of((ix >> 7) << 7, 128)
        win = org_ref[c, pl.ds(ry8, WH),
                      pl.ds(rx128, 256)].astype(jnp.int32)
        win = _rot(win, iy - ry8, 0)
        win = _rot(win, ix - rx128, 1)
        return win[0:s, 0:s]

    def body(kk, _):
        valid = recs_ref[0, kk, F_VALID]

        @pl.when(valid != 0)
        def _():
            ty = recs_ref[0, kk, F_TY]
            tx = recs_ref[0, kk, F_TX]
            sidx = recs_ref[0, kk, F_SIZE]
            mode = recs_ref[0, kk, F_MODE]
            toplen = recs_ref[0, kk, F_TOPLEN]
            leftlen = recs_ref[0, kk, F_LEFTLEN]
            cbx = recs_ref[0, kk, F_CBX]
            iy = ty + PADI
            ix = tx + PADI

            def for_size(si, s):
                qs = min(s, 16)
                Nc = qs * qs
                log2s = int(np.log2(s))
                shift2q = (21 - log2s) + qp6
                thr = (dq73 << qp6) >> (4 + log2s)
                rsh = log2s - 1
                J, Im, JT = (r[:] for r in scans_refs[qs])

                def br(_):
                    for c in range(C):
                        trow = ctx_row(outP_ref, c, iy - 1, ix - 1)
                        lcol = ctx_row(outT_ref, c, ix - 1, iy)
                        kv = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                        trow_sh = trow[:, 1:129]
                        top_last = _rot(trow_sh, toplen - 1, 1)[:, 0:1]
                        top = jnp.where(kv < toplen, trow_sh, top_last)
                        top = jnp.where(ty == 0, 128, top)
                        left_last = _rot(lcol[:, 0:128],
                                         leftlen - 1, 1)[:, 0:1]
                        left = jnp.where(kv < leftlen, lcol[:, 0:128],
                                         left_last)
                        left = jnp.where(tx == 0, 128, left)
                        tl = jnp.where(
                            ty == 0, left[:, 0:1],
                            jnp.where(cbx != 0, trow[:, 0:1],
                                      top[:, 0:1]))
                        pred = _predict(s, mode, left, top, tl, ty, tx,
                                        cbx)

                        resid = org_win(c, iy, ix, s) - pred
                        coeff = _fwd_transform(resid, s, fast, mats)

                        # block -> scan order (one-hot matmuls)
                        X = _dotx(coeff, J, ca=1, cb=0)
                        svec = _dotx(jnp.ones((1, qs), jnp.float32),
                                    X * Im, ca=1, cb=0) \
                            .astype(jnp.int32)          # [1, Nc]
                        pos = lax.broadcasted_iota(
                            jnp.int32, (1, Nc), 1)
                        q = _quantize_rdoq(svec, pos, Nc, intra, scale,
                                           shift2q, thr)

                        # scan -> block
                        B = jnp.broadcast_to(_f32(q), (qs, Nc)) * Im
                        qb = _dotx(B, JT, ca=1, cb=0).astype(jnp.int32)

                        # dequant + inverse transform + reconstruct
                        rc = jnp.clip(
                            (qb * fac + (1 << (rsh - 1))) >> rsh,
                            -32768, 32767)
                        if s == 64:
                            rr32 = _idct(_embed(rc, 32), 32, mats)
                            i64 = lax.broadcasted_iota(
                                jnp.int32, (64, 32), 0)
                            k64 = lax.broadcasted_iota(
                                jnp.int32, (64, 32), 1)
                            R2 = (k64 == (i64 >> 1))
                            mid = _dotx(R2, rr32, ca=1, cb=0)
                            rr = _dotx(mid, R2, ca=1, cb=1) \
                                .astype(jnp.int32)
                        else:
                            rr = _idct(_embed(rc, s), s, mats)
                        rec = jnp.clip(pred + rr, 0, 255)

                        def blend(P, ry, rx, tile, transposed):
                            BH = _round_up(s + 8, 8)
                            by = pl.multiple_of((ry >> 3) << 3, 8)
                            bx = pl.multiple_of((rx >> 7) << 7, 128)
                            dy = ry - by
                            dx = rx - bx
                            r_ = lax.broadcasted_iota(
                                jnp.int32, (BH, s), 0)
                            i_ = lax.broadcasted_iota(
                                jnp.int32, (BH, s), 1)
                            j_ = lax.broadcasted_iota(
                                jnp.int32, (s, 256), 0)
                            c_ = lax.broadcasted_iota(
                                jnp.int32, (s, 256), 1)
                            mid = _dot(r_ == i_ + dy, tile,
                                       ca=1, cb=1 if transposed else 0)
                            pat = _dot(mid, c_ == j_ + dx)
                            rr_ = lax.broadcasted_iota(
                                jnp.int32, (BH, 256), 0)
                            cc = lax.broadcasted_iota(
                                jnp.int32, (BH, 256), 1)
                            m = ((rr_ >= dy) & (rr_ < dy + s)
                                 & (cc >= dx) & (cc < dx + s))
                            old = P[c, pl.ds(by, BH),
                                    pl.ds(bx, 256)].astype(jnp.int32)
                            P[c, pl.ds(by, BH), pl.ds(bx, 256)] = \
                                jnp.where(m, pat.astype(jnp.int32),
                                          old).astype(jnp.uint8)

                        blend(outP_ref, iy, ix, rec, False)
                        blend(outT_ref, ix, iy, rec, True)

                        # emit quantized coefficients (16x16 bank)
                        q16 = _embed(qb, 16)
                        outQ_ref[0, kk * C + c] = q16.astype(jnp.int16)
                return br

            branches = [for_size(si, s) for si, s in enumerate(SIZES)]
            lax.switch(jnp.clip(sidx, 0, len(SIZES) - 1), branches,
                       None)
        return 0

    lax.fori_loop(0, nv, body, 0, unroll=False)


@functools.partial(
    jax.jit,
    static_argnames=("SIZES", "C", "K", "fast", "intra", "interpret"))
def _enc_call(recs, nvalid, qparams, plane, planeT, orgp, mats, scans,
              *, SIZES, C, K, fast, intra, interpret):
    nchunks = recs.shape[0]
    n_mats = len(mats)
    n_scans = len(scans)
    scans_flat = [a for trip in scans for a in trip]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nchunks,),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.SMEM),
             pl.BlockSpec((1, K, NF), lambda i: (i, 0, 0),
                          memory_space=pltpu.SMEM),
             pl.BlockSpec(memory_space=pltpu.SMEM),
             pl.BlockSpec(memory_space=pl.ANY),
             pl.BlockSpec(memory_space=pl.ANY),
             pl.BlockSpec(memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_mats
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(scans_flat)
        ),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K * C, 16, 16), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
    )

    def kernel(nv_r, recs_r, qp_r, plane_r, planeT_r, org_r, *rest):
        mats_refs = rest[:n_mats]
        srefs = rest[n_mats:n_mats + len(scans_flat)]
        outP_r, outT_r, outQ_r, sem_r = rest[n_mats + len(scans_flat):]
        scans_refs = {}
        for t in range(n_scans):
            qs = scans[t][0].shape[0]
            scans_refs[qs] = srefs[3 * t:3 * t + 3]
        _enc_scan_kernel(nv_r, recs_r, qp_r, plane_r, planeT_r, org_r,
                         mats_refs, scans_refs, outP_r, outT_r, outQ_r,
                         sem_r, SIZES=SIZES, C=C, K=K, fast=fast,
                         intra=intra)

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(plane.shape, jnp.uint8),
                   jax.ShapeDtypeStruct(planeT.shape, jnp.uint8),
                   jax.ShapeDtypeStruct((nchunks, K * C, 16, 16),
                                        jnp.int16)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(nvalid, recs, qparams, plane, planeT, orgp, *mats, *scans_flat)


def encode_scan_pallas(planes, org, recs, nvalid, qpY, SIZES,
                       fast: bool, intra: bool, interpret=False):
    """planes/org: [C, H, W] integer arrays; recs/nvalid from
    build_enc_records; qpY: traced/int scalar QP for this plane class.
    Returns (planes [C, H, W] int32, q16 [NT, C, 16, 16] int16) with
    NT = nchunks * K."""
    from ..codec.constants import GQUANT_TABLE, GDEQUANT_TABLE
    C, H, W = planes.shape
    K = recs.shape[1]
    nchunks = recs.shape[0]
    Hp = ((PADI + H) >> 7 << 7) + 384
    Wp = ((PADI + W) >> 7 << 7) + 384
    P = jnp.pad(jnp.asarray(planes).astype(jnp.uint8),
                ((0, 0), (PADI, Hp - PADI - H), (PADI, Wp - PADI - W)))
    PT = jnp.transpose(P, (0, 2, 1))
    Ho = _round_up(PADI + H + 72, 8)
    Wo = ((PADI + W) >> 7 << 7) + 256
    O = jnp.pad(jnp.asarray(org).astype(jnp.uint8),
                ((0, 0), (PADI, Ho - PADI - H), (PADI, Wo - PADI - W)))

    qp = jnp.asarray(qpY, jnp.int32)
    gq = jnp.asarray(np.asarray(GQUANT_TABLE, np.int32))
    gdq = jnp.asarray(np.asarray(GDEQUANT_TABLE, np.int32))
    qparams = jnp.stack([
        gq[qp % 6],
        qp // 6,
        jnp.left_shift(gdq[qp % 6], qp // 6),
        73 * gdq[qp % 6],
    ]).astype(jnp.int32)

    # every transform dimension the plane class can touch (stage-n of
    # fwd fast paths, the 64->32 fold, and the idct sizes)
    mats = tuple(jnp.asarray(_TMAT[n].astype(np.float32))
                 for n in sorted({min(s, 16) for s in SIZES}
                                 | {32 if s == 64 else s
                                    for s in SIZES if s > 16}
                                 | {s for s in SIZES if s <= 16}))
    scans = tuple(tuple(jnp.asarray(a) for a in _scan_consts(qs))
                  for qs in sorted({min(s, 16) for s in SIZES}))

    outP, outT, outQ = _enc_call(
        jnp.asarray(recs), jnp.asarray(nvalid), qparams, P, PT, O,
        mats, scans, SIZES=tuple(SIZES), C=C, K=K, fast=fast,
        intra=intra, interpret=interpret)
    planes_out = outP[:, PADI:PADI + H, PADI:PADI + W].astype(jnp.int32)
    q16 = outQ.reshape(nchunks * K, C, 16, 16)
    return planes_out, q16


def build_enc_records(tus, SIZES, K=128, pad_chunks=True):
    """Coding-order TU dict (ty, tx, size, mode, toplen, leftlen,
    cbx_nonzero, valid) -> ([nchunks, K, NF] int32, [nchunks] int32
    per-chunk valid counts). Valid TUs are compacted to the front so
    row i of the q16 output is the i-th valid TU."""
    valid = np.asarray(tus["valid"]).astype(bool)
    idx = np.nonzero(valid)[0]
    nv = len(idx)
    nchunks = max(1, -(-max(nv, 1) // K))
    if pad_chunks:
        nchunks = 1 << (nchunks - 1).bit_length()
    recs = np.zeros((nchunks * K, NF), np.int32)
    sizes = np.asarray(SIZES)
    recs[:nv, F_TY] = np.asarray(tus["ty"])[idx]
    recs[:nv, F_TX] = np.asarray(tus["tx"])[idx]
    recs[:nv, F_SIZE] = np.searchsorted(
        sizes, np.asarray(tus["size"])[idx])
    recs[:nv, F_MODE] = np.asarray(tus["mode"])[idx]
    recs[:nv, F_TOPLEN] = np.asarray(tus["toplen"])[idx]
    recs[:nv, F_LEFTLEN] = np.asarray(tus["leftlen"])[idx]
    recs[:nv, F_CBX] = np.asarray(tus["cbx_nonzero"])[idx]
    recs[:nv, F_VALID] = 1
    cnt = np.clip(nv - K * np.arange(nchunks), 0, K).astype(np.int32)
    return recs.reshape(nchunks, K, NF), cnt
