"""Batched JAX/XLA device kernels for Thor frame reconstruction.

TPU-first decomposition of the reference's per-block scalar code
(cited per function) into whole-frame tensor programs:

- Motion compensation: one uniform 36-tap weighted-gather kernel over the
  whole frame. The reference's special cases (integer position copy,
  (1/2,1/2) "funny position" 4x4 low-pass, uni- vs bi-pred 6-tap sets,
  common/inter_prediction.c:120-180) all fold into a single per-pixel
  phase-indexed weight LUT with one final rounding shift - no control
  flow, no per-block loops, fully vectorizable on the VPU.
- Dequant + inverse DCT: batched int32 einsums per transform size
  (common/transform.c:432-518) - MXU-shaped matmuls.
- Deblocking: the reference applies each pass raster-scan, but a filtered
  edge only touches +/-2 pixels while edges are 8 apart, so every edge in
  a pass is independent: both passes vectorize exactly as masked
  whole-plane updates (common/common_frame.c:46-321).
- CLPF: block-local by construction (neighbor reads clamp at the
  64-aligned block, common/common_block.c:180-197) -> pure elementwise.
- Intra prediction: the only true raster dependency; runs as a
  lax.scan over transform units in decode order with the 10 modes under
  lax.switch (common/intra_prediction.c:57-388).

All arithmetic is exact integer (int32), matching the NumPy oracle
kernels in ops/np_kernels.py bit for bit.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..codec.constants import (
    FILTER_C, FILTER_Y_BI, FILTER_Y_CENTER, FILTER_Y_UNI)
from ..codec.dct_tables import TMAT_4, TMAT_8, TMAT_16, TMAT_32

TMAT = {4: np.array(TMAT_4, np.int32), 8: np.array(TMAT_8, np.int32),
        16: np.array(TMAT_16, np.int32), 32: np.array(TMAT_32, np.int32)}

PAD_Y = 96   # luma reference padding (PADDING_Y, common/global.h:64)
PAD_C = 48

# Intra scan plane padding: 8 top/left, 136 bottom/right (reads span up to
# tx+129 and writes a fixed 64x64 window).
PADI = 8
PADE = 136


def clip255(x):
    return jnp.clip(x, 0, 255)


# ---------------------------------------------------------------------------
# Motion compensation weight LUTs
# ---------------------------------------------------------------------------

def build_luma_mc_lut(seq_bipred: int) -> np.ndarray:
    """[16, 6, 6] int32: combined 2-D weights per (vfrac, hfrac) phase.

    Folds the integer-position copy (weight 4096 at the center tap), the
    general separable 6-tap product (no intermediate rounding in the
    reference: vertical accumulates raw, then horizontal, then one
    (acc+2048)>>12), and the funny-position 4x4 low-pass whose (s+8)>>4
    equals (256*s+2048)>>12.
    """
    fset = np.array(FILTER_Y_BI if seq_bipred else FILTER_Y_UNI, np.int64)
    lut = np.zeros((16, 6, 6), np.int64)
    for vf in range(4):
        for hf in range(4):
            p = vf * 4 + hf
            if vf == 0 and hf == 0:
                lut[p, 2, 2] = 4096
            elif vf == 2 and hf == 2:
                lut[p, 1:5, 1:5] = np.array(FILTER_Y_CENTER, np.int64) * 256
            else:
                lut[p] = np.outer(fset[vf], fset[hf])
    return lut.astype(np.int32)


def build_chroma_mc_lut() -> np.ndarray:
    """[64, 4, 4] int32 for the 1/8-pel 4-tap chroma filter."""
    fc = np.array(FILTER_C, np.int64)
    lut = np.zeros((64, 4, 4), np.int64)
    for vf in range(8):
        for hf in range(8):
            p = vf * 8 + hf
            if vf == 0 and hf == 0:
                lut[p, 1, 1] = 4096
            else:
                lut[p] = np.outer(fc[vf], fc[hf])
    return lut.astype(np.int32)


def mc_plane(refstack, mvx_cell, mvy_cell, slot_cell, lut, pad, frac_bits,
             cell_rep, H, W, tap_lo):
    """Whole-plane motion compensation via one windowed gather per cell.

    MV parameters are constant over each cell (the 4x4 side-information
    granularity), so instead of T*T whole-plane gathers we gather one
    (cell_rep + T - 1)^2 reference window per cell (a single XLA gather)
    and run the T*T-tap phase-weighted accumulation as dense shifted
    slices of the windows - VPU work with no further memory indirection.

    refstack: [R, H+2*pad, W+2*pad] uint8 reference planes.
    mvx_cell/mvy_cell/slot_cell: [H/cs, W/cs] int32 per-cell params, sign
      already folded into the MV on the host.
    lut: [P, T, T] combined weights; frac_bits: 2 (luma 1/4-pel) or
      3 (chroma 1/8-pel); cell_rep: pixels per cell side; tap_lo: first tap
      offset (-2 luma, -1 chroma).
    Returns [H, W] int32 in 0..255.
    """
    T = lut.shape[-1]
    cs = cell_rep
    HC, WC = H // cs, W // cs
    WS = cs + T - 1

    fmask = (1 << frac_bits) - 1
    hf = (mvx_cell & fmask).reshape(-1)
    vf = (mvy_cell & fmask).reshape(-1)
    phase = vf * (fmask + 1) + hf
    ivy = (mvy_cell >> frac_bits).reshape(-1)
    ivx = (mvx_cell >> frac_bits).reshape(-1)
    cy = jnp.arange(HC, dtype=jnp.int32) * cs
    cx = jnp.arange(WC, dtype=jnp.int32) * cs
    y0 = (ivy + pad + tap_lo
          + jnp.broadcast_to(cy[:, None], (HC, WC)).reshape(-1))
    x0 = (ivx + pad + tap_lo
          + jnp.broadcast_to(cx[None, :], (HC, WC)).reshape(-1))
    slot = slot_cell.reshape(-1)

    def window(s, yy, xx):
        return lax.dynamic_slice(refstack, (s, yy, xx), (1, WS, WS))[0]

    win = jax.vmap(window)(slot, y0, x0).astype(jnp.int32)  # [N, WS, WS]

    lut_flat = jnp.asarray(lut.reshape(lut.shape[0], T * T))
    wsel = lut_flat[phase]                                  # [N, T*T]
    acc = jnp.zeros((HC * WC, cs, cs), jnp.int32)
    for t in range(T * T):
        m, n = t // T, t % T
        acc = acc + (wsel[:, t][:, None, None]
                     * win[:, m:m + cs, n:n + cs])
    out = clip255((acc + 2048) >> 12)
    return out.reshape(HC, WC, cs, cs).transpose(0, 2, 1, 3).reshape(H, W)


def _cell_expand(a, rep):
    """Expand per-cell values to pixels densely (broadcast+reshape;
    jnp.repeat can lower to a gather on TPU)."""
    hc, wc = a.shape
    return jnp.broadcast_to(a[:, None, :, None], (hc, rep, wc, rep)) \
        .reshape(hc * rep, wc * rep)


def mc_phase_conv(refstack, lut, pad):
    """All-phase motion-compensation interpolation as one convolution.

    Computes every fractional-phase interpolation of every reference
    plane in a single f32 conv (exact: weights |sum| bounds keep all
    partial sums < 2^24, so float32 accumulation is integer-exact), so
    per-pixel MC reduces to ONE gather from [R, P, Hv, Wv] uint8 planes.
    MXU does the arithmetic; the memory-indirection cost drops from
    T*T gathers (or per-cell windowed gathers) to a single one.
    """
    T = lut.shape[-1]
    R = refstack.shape[0]
    x = refstack.astype(jnp.float32)[:, None, :, :]          # [R,1,Hp,Wp]
    w = jnp.asarray(lut).astype(jnp.float32)[:, None, :, :]  # [P,1,T,T]
    out = lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding='VALID',
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)                  # [R,P,Hv,Wv]
    out = jnp.floor((out + 2048.0) / 4096.0)
    return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)


def mc_gather_from_phases(phases, mvx_cell, mvy_cell, slot_cell, pad,
                          frac_bits, cell_rep, H, W, tap_lo):
    """Per-pixel selection from the all-phase conv planes: one gather."""
    mvx = _cell_expand(mvx_cell, cell_rep)
    mvy = _cell_expand(mvy_cell, cell_rep)
    slot = _cell_expand(slot_cell, cell_rep)
    fmask = (1 << frac_bits) - 1
    phase = (mvy & fmask) * (fmask + 1) + (mvx & fmask)
    iy = ((mvy >> frac_bits) + pad + tap_lo
          + jnp.arange(H, dtype=jnp.int32)[:, None])
    ix = ((mvx >> frac_bits) + pad + tap_lo
          + jnp.arange(W, dtype=jnp.int32)[None, :])
    # single flat 1-D gather (measurably faster than the equivalent 4-D
    # fancy-index on TPU: XLA keeps the address arithmetic on the VPU)
    _, P, Hv, Wv = phases.shape
    flat = ((slot * P + phase) * Hv + iy) * Wv + ix
    return jnp.take(phases.reshape(-1), flat.reshape(-1)) \
        .reshape(H, W).astype(jnp.int32)


def mc_frame(refstack, mv0x, mv0y, mv1x, mv1y, slot0, slot1, use_bi, lut,
             pad, frac_bits, cell_rep, H, W, tap_lo, has_bi):
    """Uni + optional bi prediction with (p0+p1)>>1 averaging.

    The all-phase conv planes are computed once and shared between the
    two prediction lists."""
    phases = mc_phase_conv(refstack, lut, pad)
    p0 = mc_gather_from_phases(phases, mv0x, mv0y, slot0, pad, frac_bits,
                               cell_rep, H, W, tap_lo)
    if not has_bi:
        return p0
    p1 = mc_gather_from_phases(phases, mv1x, mv1y, slot1, pad, frac_bits,
                               cell_rep, H, W, tap_lo)
    bi = _cell_expand(use_bi.astype(jnp.int32), cell_rep) != 0
    return jnp.where(bi, (p0 + p1) >> 1, p0)


# ---------------------------------------------------------------------------
# Residual: batched dequant + inverse transform + scatter
# ---------------------------------------------------------------------------

def idct_batch(coeff, size: int):
    """[N, size, size] int16 coeff -> [N, size, size] int32 residual.

    Two int32 matmuls with the exact intermediate clamp of the reference
    (common/transform.c:432-486): stage 1 (M^T @ C + 64) >> 7 clamped to
    int16, stage 2 (tmp @ M + 2048) >> 12 clamped to int16.
    """
    M = jnp.asarray(TMAT[size])
    c = coeff.astype(jnp.int32)
    tmp = jnp.einsum('ki,nkj->nij', M, c,
                     preferred_element_type=jnp.int32)
    tmp = jnp.clip((tmp + 64) >> 7, -32768, 32767)
    out = jnp.einsum('nik,kj->nij', tmp, M,
                     preferred_element_type=jnp.int32)
    return jnp.clip((out + 2048) >> 12, -32768, 32767)


def residual_group(coeff, dq_factor, dq_add, dq_shift, size: int):
    """Dequantize (common/common_block.c:132-146) + inverse transform.

    coeff: [N, s, s] int16; dq_factor/add/shift: [N] int32 host-computed
    (factor = gdequant_table[qp%6] << (qp/6); shift = log2(tr_size)-1).
    """
    c = coeff.astype(jnp.int32) * dq_factor[:, None, None]
    c = (c + dq_add[:, None, None]) >> dq_shift[:, None, None]
    c = jnp.clip(c, -32768, 32767).astype(jnp.int16)
    return idct_batch(c, size)


def scatter_tu(resid_plane, vals, ys, xs):
    """Scatter-add [N, s, s] residuals at per-TU (ys, xs) origins.

    TU origins are always s-aligned (quadtree + TB-split geometry), so
    the windowed 2-D scatter (slow generic scatter on TPU, ~7 ms at
    1080p) reduces to a row-granular scatter-add into a dense
    [ceil(H/s)*ceil(W/s), s*s] bank followed by a reshape-transpose
    add (~0.07 ms). Group padding entries carry zero coefficients, so
    colliding at row 0 is harmless under add."""
    H, W = resid_plane.shape
    s = vals.shape[-1]
    N = vals.shape[0]
    HB, WB = -(-H // s), -(-W // s)
    row = (ys // s) * WB + (xs // s)
    bank = jnp.zeros((HB * WB, s * s), vals.dtype)
    bank = bank.at[row].add(vals.reshape(N, s * s))
    d = bank.reshape(HB, WB, s, s).transpose(0, 2, 1, 3) \
        .reshape(HB * s, WB * s)[:H, :W]
    return resid_plane + d


def scatter_tu_c(rc, vals, ys, xs, pl):
    """Chroma twin of scatter_tu over the [2, Hc, Wc] plane pair; pl
    selects u (0) or v (1)."""
    _, Hc, Wc = rc.shape
    s = vals.shape[-1]
    N = vals.shape[0]
    HB, WB = -(-Hc // s), -(-Wc // s)
    row = (pl * HB + ys // s) * WB + (xs // s)
    bank = jnp.zeros((2 * HB * WB, s * s), vals.dtype)
    bank = bank.at[row].add(vals.reshape(N, s * s))
    d = bank.reshape(2, HB, WB, s, s).transpose(0, 1, 3, 2, 4) \
        .reshape(2, HB * s, WB * s)[:, :Hc, :Wc]
    return rc + d


# ---------------------------------------------------------------------------
# Deblocking (common/common_frame.c:46-321)
# ---------------------------------------------------------------------------

def _rep_rows(a, rep):
    """Dense row-expansion (broadcast+reshape)."""
    n, m = a.shape
    return jnp.broadcast_to(a[:, None, :], (n, rep, m)).reshape(n * rep, m)


def _expand2(a, ry, rx):
    """[h, w] -> [h*ry, w*rx] dense block expansion."""
    h, w = a.shape
    return jnp.broadcast_to(a[:, None, :, None], (h, ry, w, rx)) \
        .reshape(h * ry, w * rx)


def _shifted(a, k, axis):
    """out[i] = a[i + k] along axis (wrapped values are always masked
    off by the role/validity masks downstream)."""
    return jnp.roll(a, -k, axis=axis)


def pack_ddp(dd):
    """Pack the 9 per-cell int side-info planes the deblock reads into
    ONE uint8 plane for the host->device copy (the filters only need
    these bits): bit0 intra(mode==1), bit1 cbp_y>0, bit2 any |mv|>=4,
    bit3 tb_split>0, bits4-5 log2(size)-3, bits6-7 pb_part. Host-side
    numpy; the device twin is unpack_ddp."""
    import numpy as np
    big = ((np.abs(dd["mv0x"]) >= 4) | (np.abs(dd["mv0y"]) >= 4)
           | (np.abs(dd["mv1x"]) >= 4) | (np.abs(dd["mv1y"]) >= 4))
    size = np.asarray(dd["size"])
    slog = ((size == 16) * 1 + (size == 32) * 2
            + (size == 64) * 3).astype(np.uint8)
    return ((np.asarray(dd["mode"]) == 1).astype(np.uint8)
            | ((np.asarray(dd["cbp_y"]) > 0).astype(np.uint8) << 1)
            | (big.astype(np.uint8) << 2)
            | ((np.asarray(dd["tb_split"]) > 0).astype(np.uint8) << 3)
            | (slog << 4)
            | ((np.asarray(dd["pb_part"]).astype(np.uint8) & 3) << 6))


def unpack_ddp(ddp):
    """Device-side unpack of pack_ddp's byte plane into the fields the
    deblock passes read."""
    d = ddp.astype(jnp.int32)
    return {
        'mode': d & 1,            # 1 = intra
        'cbp_y': (d >> 1) & 1,
        'bigmv': (d >> 2) & 1,
        'tb_split': (d >> 3) & 1,
        'size': 8 << ((d >> 4) & 3),
        'pb_part': (d >> 6) & 3,
    }


def _deblock_luma_dir(rec, dd, H, W, beta, tc, axis):
    """One luma deblock pass (axis=1: vertical edges at columns 8k;
    axis=0: horizontal edges at rows 8k) as a single dense shift-select
    program: no transposes, no strided lane updates - every pixel
    computes its would-be filtered value for each of the four edge
    roles (p1, p0, q0, q1) from rolled copies of the plane and selects
    by its position class. Exact twin of common/common_frame.c:46-241.
    """
    sh = lambda a, k: _shifted(a, k, axis)
    X = rec
    sm2, sm1, sp1 = sh(X, -2), sh(X, -1), sh(X, 1)

    # delta at q0 positions: p1=sm2 p0=sm1 q0=X q1=sp1
    delta = jnp.clip((18 * (X - sm1) - 6 * (sp1 - sm2) + 16) >> 5,
                     -tc, tc)
    dh = jnp.sign(delta) * (jnp.abs(delta) >> 1)

    # activity test per 8-edge: d sampled at lines 2 and 5 of the
    # 8-group along the edge, at the q0 column/row of the edge
    ad = jnp.abs(sm1 - sm2) + jnp.abs(sp1 - X)
    A = ad.reshape(H // 8, 8, W // 8, 8)
    d8 = (A[:, 2, :, 0] + A[:, 5, :, 0]) if axis == 1 \
        else (A[:, 0, :, 2] + A[:, 0, :, 5])
    act8 = d8 < beta                                   # [H/8, W/8]

    # side-info condition on the 4-px cell grid; q-cell at even cells
    # along the pass axis, p-cell one cell before it
    mvq = dd['bigmv'] != 0
    cbpq = dd['cbp_y'] > 0
    intq = dd['mode'] == 1
    mv = mvq | _shifted(mvq, -1, axis)
    cbp = cbpq | _shifted(cbpq, -1, axis)
    intra = intq | _shifted(intq, -1, axis)

    part = dd['pb_part']
    split_part = ((part == 2) | (part == 3)) if axis == 1 \
        else ((part == 1) | (part == 3))
    adj = ((dd['tb_split'] > 0) | split_part) & (dd['size'] > 8)
    qs = jnp.where(adj, dd['size'] // 2, dd['size'])
    cells = jnp.arange(W // 4, dtype=jnp.int32)[None, :] if axis == 1 \
        else jnp.arange(H // 4, dtype=jnp.int32)[:, None]
    interior = ((4 * cells) % qs) > 0
    cond_cell = ~interior & (mv | cbp | intra)         # [H/4, W/4]

    # per-edge condition [H/4, W/8] (vert) - cond at even cells AND the
    # 8-line activity - expanded to pixels for the q side; the p side
    # reads the next edge over
    if axis == 1:
        condE = cond_cell[:, 0::2] & _rep_rows(act8, 2)
        CE = _expand2(condE, 4, 8)
        pos = jnp.arange(W, dtype=jnp.int32)[None, :]
        n_edge_groups = W // 8
    else:
        condE = cond_cell[0::2, :] & _rep_rows(act8.T, 2).T
        CE = _expand2(condE, 8, 4)
        pos = jnp.arange(H, dtype=jnp.int32)[:, None]
        n_edge_groups = H // 8
    CEp = sh(CE, 8)                      # p side: edge of the next group
    c = pos % 8
    grp = pos // 8
    mask_q = CE & (grp >= 1)
    mask_p = CEp & (grp < n_edge_groups - 1)

    out = X
    out = jnp.where(mask_q & (c == 0), clip255(X - delta), out)
    out = jnp.where(mask_q & (c == 1), clip255(X - sh(dh, -1)), out)
    out = jnp.where(mask_p & (c == 7), clip255(X + sh(delta, 1)), out)
    out = jnp.where(mask_p & (c == 6), clip255(X + sh(dh, 2)), out)
    return out


def deblock_luma(rec, dd, H: int, W: int, beta, tc):
    """Exact two-pass luma deblock; every edge within a pass is
    independent (filter reach +/-2 < edge spacing 8), so each pass is
    one dense whole-plane shift-select update."""
    rec = _deblock_luma_dir(rec, dd, H, W, beta, tc, 1)
    return _deblock_luma_dir(rec, dd, H, W, beta, tc, 0)


def _deblock_chroma_dir(recC, dd, H, W, tc, axis):
    """One chroma deblock pass (intra edges only, 2-tap delta) as a
    dense shift-select program on the [H/2, W/2] plane. Edges follow
    the LUMA 8-grid (chroma 4-grid)."""
    Hc, Wc = H // 2, W // 2
    sh = lambda a, k: _shifted(a, k, axis)
    X = recC
    sm2, sm1, sp1 = sh(X, -2), sh(X, -1), sh(X, 1)
    # delta at q0: p1=sm2 p0=sm1 q0=X q1=sp1
    delta = jnp.clip((4 * (X - sm1) + (sm2 - sp1) + 4) >> 3, -tc, tc)

    # condition per (8-luma-line, edge): intra on either side and the
    # edge not interior to the q block. Samples of the cell grid:
    # q cell (2i, 2m) [axis=1], p cell (2i, 2m-1).
    if axis == 1:
        modeq = dd['mode'][0::2, 0::2] == 1
        modep = jnp.roll(dd['mode'][0::2, 1::2] == 1, 1, axis=1)
        q_size = dd['size'][0::2, 0::2]
        pos8 = 8 * jnp.arange(W // 8, dtype=jnp.int32)[None, :]
    else:
        modeq = dd['mode'][0::2, 0::2] == 1
        modep = jnp.roll(dd['mode'][1::2, 0::2] == 1, 1, axis=0)
        q_size = dd['size'][0::2, 0::2]
        pos8 = 8 * jnp.arange(H // 8, dtype=jnp.int32)[:, None]
    interior = (pos8 % q_size) > 0
    cond8 = (modeq | modep) & ~interior               # [H/8, W/8]

    CE = _expand2(cond8, Hc // (H // 8), Wc // (W // 8))
    pos = jnp.arange(Wc, dtype=jnp.int32)[None, :] if axis == 1 \
        else jnp.arange(Hc, dtype=jnp.int32)[:, None]
    c = pos % 4
    grp = pos // 4
    n_groups = (Wc if axis == 1 else Hc) // 4
    mask_q = CE & (grp >= 1)
    mask_p = sh(CE, 4) & (grp < n_groups - 1)

    out = X
    out = jnp.where(mask_q & (c == 0), clip255(X - delta), out)
    out = jnp.where(mask_p & (c == 3), clip255(X + sh(delta, 1)), out)
    return out


def deblock_chroma(recC, dd, H: int, W: int, tc):
    """Chroma deblock (intra edges only, 2-tap delta). H/W are LUMA
    dims; recC is the [H/2, W/2] chroma plane."""
    recC = _deblock_chroma_dir(recC, dd, H, W, tc, 1)
    return _deblock_chroma_dir(recC, dd, H, W, tc, 0)


# ---------------------------------------------------------------------------
# CLPF (common/common_block.c:180-197, common/common_frame.c:485-557)
# ---------------------------------------------------------------------------

def clpf_plane(plane, mask8, dstride: int, H: int, W: int):
    """+/-1 step toward the 4-neighbor majority, neighbors clamped at the
    dstride-aligned block: block-local, so fully elementwise.

    plane: [H, W] int32 (pre-CLPF); mask8: [H/bs, W/bs] bool at the
    filter-block granularity (8 luma / 4 chroma pixels).
    """
    iy = jnp.arange(H, dtype=jnp.int32)[:, None]
    ix = jnp.arange(W, dtype=jnp.int32)[None, :]
    X = plane
    up = jnp.concatenate([plane[:1], plane[:-1]], axis=0)
    dn = jnp.concatenate([plane[1:], plane[-1:]], axis=0)
    lf = jnp.concatenate([plane[:, :1], plane[:, :-1]], axis=1)
    rt = jnp.concatenate([plane[:, 1:], plane[:, -1:]], axis=1)
    A = jnp.where(iy % dstride == 0, X, up)
    B = jnp.where(ix % dstride == 0, X, lf)
    C = jnp.where((ix % dstride == dstride - 1) | (ix == W - 1), X, rt)
    D = jnp.where((iy % dstride == dstride - 1) | (iy == H - 1), X, dn)
    pos = ((A > X).astype(jnp.int32) + (B > X) + (C > X) + (D > X)) > 2
    neg = ((A < X).astype(jnp.int32) + (B < X) + (C < X) + (D < X)) > 2
    delta = pos.astype(jnp.int32) - neg.astype(jnp.int32)
    bs = H // mask8.shape[0]
    m = _cell_expand(mask8.astype(jnp.int32), bs) != 0
    return jnp.where(m, X + delta, X)


# ---------------------------------------------------------------------------
# Intra prediction scan (common/intra_prediction.c)
# ---------------------------------------------------------------------------

_I64 = np.broadcast_to(np.arange(64, dtype=np.int32)[:, None], (64, 64))
_J64 = np.broadcast_to(np.arange(64, dtype=np.int32)[None, :], (64, 64))


def _ij():
    return jnp.asarray(_I64), jnp.asarray(_J64)


def _filt121(arr, n):
    """121 filter over arr[:n] with edge replication (intra_prediction.c:39)."""
    idx = jnp.arange(arr.shape[0], dtype=jnp.int32)
    prev = arr[jnp.maximum(idx - 1, 0)]
    nxt = arr[jnp.minimum(idx + 1, n - 1)]
    return (prev + 2 * arr + nxt + 2) >> 2


def _trunc_div8(v):
    return jnp.where(v >= 0, v // 8, -((-v) // 8))


def intra_predict(left, top, tl, ty, tx, size, mode):
    """[64,64] int32 prediction; only the top-left size x size is used.

    left/top: [128] int32 (values replicated past their valid length
    exactly as make_top_and_left does); tl scalar; ty/tx TU position;
    size dynamic scalar; mode 0..9 (>=10 folds to DC).
    """
    i, j = _ij()
    k = jnp.arange(128, dtype=jnp.int32)

    def f_dc(_):
        l = jnp.where(tx != 0, left, top)
        t = jnp.where(ty != 0, top, left)
        valid = k < size
        s = jnp.sum(jnp.where(valid, l, 0)) + jnp.sum(jnp.where(valid, t, 0))
        dc = (s + size) // (2 * size)
        return jnp.full((64, 64), dc, jnp.int32)

    def f_planar(_):
        def filt5(v):
            kk = jnp.arange(64, dtype=jnp.int32)
            c = lambda a: jnp.maximum(a, 0)
            d = lambda a: jnp.minimum(a, size - 1)
            return (v[c(kk - 2)] + 2 * v[c(kk - 1)] + 2 * v[kk]
                    + 2 * v[d(kk + 1)] + v[d(kk + 2)])
        topF, leftF = filt5(top), filt5(left)
        tlF = left[1] + 2 * left[0] + 2 * tl + 2 * top[0] + top[1]
        v = leftF[i] + topF[j] - tlF + 4
        return clip255(_trunc_div8(v))

    def f_hor(_):
        return jnp.broadcast_to(left[jnp.arange(64)][:, None], (64, 64))

    def f_ver(_):
        return jnp.broadcast_to(top[jnp.arange(64)][None, :], (64, 64))

    def f_upleft(_):
        leftF = _filt121(left, size)
        topF = _filt121(top, size)
        tlF = (2 * tl + left[0] + top[0] + 2) >> 2
        diag = i - j
        ad = jnp.clip(jnp.abs(diag) - 1, 0, 127)
        return jnp.where(diag > 0, leftF[ad],
                         jnp.where(diag == 0, tlF, topF[ad]))

    def f_upright(_):
        topF = _filt121(top, 2 * size)
        return topF[jnp.clip(i + j + 1, 0, 127)]

    def f_upupright(_):
        topF2 = _filt121(top, 2 * size)
        diag = i + 2 * j
        a = topF2[jnp.clip((diag + 1) // 2, 0, 127)]
        b = (topF2[jnp.clip(diag // 2, 0, 127)]
             + topF2[jnp.clip(diag // 2 + 1, 0, 127)]) >> 1
        return jnp.where((diag & 1) == 1, a, b)

    def f_upupleft(_):
        leftF = _filt121(left, size)
        topF = _filt121(top, size)
        tlF = (2 * tl + left[0] + top[0] + 2) >> 2
        diag = i - 2 * j
        nd = jnp.abs(jnp.minimum(diag, 0))
        a_left = leftF[jnp.clip(diag - 2, 0, 127)]
        hi = jnp.minimum(nd // 2, size - 1)
        a_odd = topF[hi]
        a_even = (topF[hi] + topF[jnp.maximum(nd // 2 - 1, 0)]) >> 1
        return jnp.where(diag > 1, a_left,
                         jnp.where(diag == 1, tlF,
                                   jnp.where(diag == 0, (tlF + topF[0]) >> 1,
                                             jnp.where((nd & 1) == 1, a_odd, a_even))))

    def f_upleftleft(_):
        leftF = _filt121(left, size)
        topF = _filt121(top, size)
        tlF = (2 * tl + left[0] + top[0] + 2) >> 2
        diag = 2 * i - j
        pd = jnp.maximum(diag, 0)
        a_top = topF[jnp.clip(-diag - 2, 0, 127)]
        hi = jnp.minimum(pd // 2, size - 1)
        a_odd = leftF[hi]
        a_even = (leftF[hi] + leftF[jnp.maximum(pd // 2 - 1, 0)]) >> 1
        return jnp.where(diag < -1, a_top,
                         jnp.where(diag == -1, tlF,
                                   jnp.where(diag == 0, (tlF + leftF[0]) >> 1,
                                             jnp.where((pd & 1) == 1, a_odd, a_even))))

    def f_downleftleft(_):
        leftF2 = _filt121(left, 2 * size)
        diag = 2 * i + j
        a = leftF2[jnp.clip((diag + 1) // 2, 0, 127)]
        b = (leftF2[jnp.clip(diag // 2, 0, 127)]
             + leftF2[jnp.minimum(jnp.clip(diag // 2 + 1, 0, 127), 2 * size - 1)]) >> 1
        return jnp.where((diag & 1) == 1, a, b)

    fns = [f_dc, f_planar, f_hor, f_ver, f_upleft, f_upright, f_upupright,
           f_upupleft, f_upleftleft, f_downleftleft]
    if isinstance(size, (int, np.integer)):
        # static-size call sites (wavefront decode, device encoder):
        # the diagonal modes' per-pixel index gathers lower to
        # ~80 ns/element scalar loops on TPU, so with a compile-time
        # size they are replaced by dense static-slice constructions
        # (Hankel/Toeplitz layouts). Bit-equality with the dynamic
        # branches is covered by tests/test_kernels.py.
        s_ = int(size)
        fns = [f_dc, f_planar, f_hor, f_ver] + [
            (lambda m_: lambda _: _pad64(
                _intra_diag_static(left, top, tl, s_, m_)))(m_)
            for m_ in range(4, 10)]
    mode_idx = jnp.where(mode >= 10, 0, mode)
    return lax.switch(mode_idx, fns, None)


def _pad64(p):
    s = p.shape[0]
    return jnp.pad(p, ((0, 64 - s), (0, 64 - s))) if s < 64 else p


def intra_predict_s(left, top, tl, ty, tx, s: int, mode):
    """[s, s] static-size intra prediction - bit-equal to
    intra_predict(...)[:s, :s] without materializing the 64x64 tile
    (the mode SEARCH evaluates 10 modes x every block of the frame;
    the fixed 64x64 output made the s=8 search build [N, 64, 64]
    tensors, 64x wasted work - round-5 xplane profile)."""
    s = int(s)

    def f_dc(_):
        k = jnp.arange(128, dtype=jnp.int32)
        l = jnp.where(tx != 0, left, top)
        t = jnp.where(ty != 0, top, left)
        valid = k < s
        ssum = jnp.sum(jnp.where(valid, l, 0))             + jnp.sum(jnp.where(valid, t, 0))
        dc = (ssum + s) // (2 * s)
        return jnp.full((s, s), dc, jnp.int32)

    def f_planar(_):
        def filt5(v):
            kk = jnp.arange(s, dtype=jnp.int32)
            c = lambda a: jnp.maximum(a, 0)
            d = lambda a: jnp.minimum(a, s - 1)
            return (v[c(kk - 2)] + 2 * v[c(kk - 1)] + 2 * v[kk]
                    + 2 * v[d(kk + 1)] + v[d(kk + 2)])
        topF, leftF = filt5(top), filt5(left)
        tlF = left[1] + 2 * left[0] + 2 * tl + 2 * top[0] + top[1]
        v = leftF[:, None] + topF[None, :] - tlF + 4
        return clip255(_trunc_div8(v))

    def f_hor(_):
        return jnp.broadcast_to(left[:s, None], (s, s))

    def f_ver(_):
        return jnp.broadcast_to(top[None, :s], (s, s))

    fns = [f_dc, f_planar, f_hor, f_ver] + [
        (lambda m_: lambda _: _intra_diag_static(left, top, tl, s, m_))
        (m_) for m_ in range(4, 10)]
    mode_idx = jnp.where(mode >= 10, 0, mode)
    return lax.switch(mode_idx, fns, None)


def _rows(vec, starts, n):
    """Stack rows vec[st:st+n] for static starts (pure slices)."""
    return jnp.stack([lax.slice_in_dim(vec, st, st + n) for st in starts])


def _intra_diag_static(left, top, tl, s, mode):
    """Modes 4..9 with python-int size: gather-free [s, s] prediction.

    Bit-equal to the dynamic branches of intra_predict (randomized
    parity test in tests/test_kernels.py + the golden decode suite)."""
    leftF = _filt121(left, s)
    topF = _filt121(top, s)
    leftF2 = _filt121(left, 2 * s)
    topF2 = _filt121(top, 2 * s)
    tlF = (2 * tl + left[0] + top[0] + 2) >> 2

    if mode == 5:    # UPRIGHT: pred[i,j] = topF2[i+j+1]
        return _rows(topF2, [i + 1 for i in range(s)], s)

    if mode == 6:    # UPUPRIGHT: diag = i+2j, parity fixed per row
        rows = []
        for i in range(s):
            if i & 1:
                rows.append(lax.slice_in_dim(topF2, (i + 1) // 2,
                                             (i + 1) // 2 + s))
            else:
                a = lax.slice_in_dim(topF2, i // 2, i // 2 + s)
                b = lax.slice_in_dim(topF2, i // 2 + 1, i // 2 + 1 + s)
                rows.append((a + b) >> 1)
        return jnp.stack(rows)

    if mode == 9:    # DOWNLEFTLEFT: mirror of UPUPRIGHT on columns
        lf = jnp.concatenate(
            [lax.slice_in_dim(leftF2, 0, 2 * s),
             lax.slice_in_dim(leftF2, 2 * s - 1, 2 * s)])
        cols = []
        for j in range(s):
            if j & 1:
                cols.append(lax.slice_in_dim(leftF2, (j + 1) // 2,
                                             (j + 1) // 2 + s))
            else:
                a = lax.slice_in_dim(lf, j // 2, j // 2 + s)
                b = lax.slice_in_dim(lf, j // 2 + 1, j // 2 + 1 + s)
                cols.append((a + b) >> 1)
        return jnp.stack(cols, axis=1)

    if mode == 4:    # UPLEFT: toeplitz over (reversed leftF | tlF | topF)
        buf = jnp.concatenate(
            [lax.rev(lax.slice_in_dim(leftF, 0, s), (0,)),
             jnp.reshape(tlF, (1,)).astype(leftF.dtype),
             lax.slice_in_dim(topF, 0, s)])
        # row i: buf[s-i+k]; k==i hits tlF, k<i left side, k>i top side
        return _rows(buf, [s - i for i in range(s)], s)

    if mode == 7:    # UPUPLEFT: diag = i-2j
        # per row i: left side (d>=2) is a reversed stride-2 slice of
        # leftF; one boundary element; the top side has fixed nd
        # parity per row -> plain slices of the clamped topF
        topFe = jnp.concatenate(
            [lax.slice_in_dim(topF, 0, s),
             lax.slice_in_dim(topF, s - 1, s)])    # clamp hi at s-1
        topFm1 = jnp.concatenate(
            [lax.slice_in_dim(topF, 0, 1), lax.slice_in_dim(topFe, 0, s)])
        rows = []
        for i in range(s):
            n1 = i // 2                       # j count with d >= 2
            parts = []
            if n1:
                asc = lax.slice(leftF, (i - 2 * n1,), (i - 1,), (2,))
                parts.append(lax.rev(asc, (0,)))
            if i & 1:
                parts.append(jnp.reshape(tlF, (1,)).astype(leftF.dtype))
            else:
                parts.append(jnp.reshape((tlF + topF[0]) >> 1,
                                         (1,)).astype(leftF.dtype))
            n2 = s - 1 - n1
            if n2:
                if i & 1:                     # nd odd: topFe[j-(i+1)//2]
                    parts.append(lax.slice_in_dim(topFe, 0, n2))
                else:                         # nd even: avg with prev
                    a = lax.slice_in_dim(topFe, 1, 1 + n2)
                    b = lax.slice_in_dim(topFm1, 1, 1 + n2)
                    parts.append((a + b) >> 1)
            rows.append(jnp.concatenate(parts))
        return jnp.stack(rows)

    # mode == 8, UPLEFTLEFT: diag = 2i-j (transpose-mirror of mode 7)
    leftFe = jnp.concatenate(
        [lax.slice_in_dim(leftF, 0, s),
         lax.slice_in_dim(leftF, s - 1, s)])
    leftFm1 = jnp.concatenate(
        [lax.slice_in_dim(leftF, 0, 1), lax.slice_in_dim(leftFe, 0, s)])
    cols = []
    for j in range(s):
        n1 = j // 2                           # i count with -d >= 2
        parts = []
        if n1:
            asc = lax.slice(topF, (j - 2 * n1,), (j - 1,), (2,))
            parts.append(lax.rev(asc, (0,)))
        if j & 1:
            parts.append(jnp.reshape(tlF, (1,)).astype(topF.dtype))
        else:
            parts.append(jnp.reshape((tlF + leftF[0]) >> 1,
                                     (1,)).astype(topF.dtype))
        n2 = s - 1 - n1
        if n2:
            if j & 1:
                parts.append(lax.slice_in_dim(leftFe, 0, n2))
            else:
                a = lax.slice_in_dim(leftFe, 1, 1 + n2)
                b = lax.slice_in_dim(leftFm1, 1, 1 + n2)
                parts.append((a + b) >> 1)
        cols.append(jnp.concatenate(parts))
    return jnp.stack(cols, axis=1)


def intra_scan(plane_pad, resid_pad, tus):
    """Sequential intra reconstruction over TUs in decode order.

    plane_pad: [C, PADI+H+PADE, PADI+W+PADE] int32 current recon (inter
    parts already reconstructed); C co-located planes (1 for luma, 2 for
    U+V, which share TU geometry) are processed together per step via
    vmap. resid_pad: same-shape int32 residual planes.
    tus: dict of [N] int32 arrays: ty, tx, size, mode, toplen, leftlen,
    cbx_nonzero, valid.
    Returns the updated padded planes.
    """
    def step(P, tu):
        ty, tx, size, mode = tu['ty'], tu['tx'], tu['size'], tu['mode']
        toplen, leftlen = tu['toplen'], tu['leftlen']
        cbx = tu['cbx_nonzero']
        i, j = _ij()
        m = (i < size) & (j < size) & (tu['valid'] != 0)

        def one_plane(Pp, Rp):
            trow = lax.dynamic_slice(
                Pp, (PADI + ty - 1, PADI + tx - 1), (1, 130))[0]
            lcol = lax.dynamic_slice(
                Pp, (PADI + ty, PADI + tx - 1), (128, 1))[:, 0]
            k = jnp.arange(128, dtype=jnp.int32)
            top = jnp.where(ty == 0, 128, trow[1 + jnp.minimum(k, toplen - 1)])
            left = jnp.where(tx == 0, 128, lcol[jnp.minimum(k, leftlen - 1)])
            tl = jnp.where(ty == 0, left[0],
                           jnp.where(cbx != 0, trow[0], top[0]))
            pred = intra_predict(left, top, tl, ty, tx, size, mode)
            res = lax.dynamic_slice(Rp, (PADI + ty, PADI + tx), (64, 64))
            rec = clip255(pred + res)
            old = lax.dynamic_slice(Pp, (PADI + ty, PADI + tx), (64, 64))
            return jnp.where(m, rec, old)

        tiles = jax.vmap(one_plane)(P, resid_pad)
        P = lax.dynamic_update_slice(P, tiles, (0, PADI + ty, PADI + tx))
        return P, None

    P, _ = lax.scan(step, plane_pad, tus)
    return P


def schedule_wavefront(tus, l_bucket=64, m_bucket=True):
    """Host-side wavefront scheduling of intra TUs.

    The sequential scan is the one raster dependency in the decoder;
    but a TU only depends on the TUs covering its top row / left column
    context (make_top_and_left, common/intra_prediction.c:57-143), so
    TUs can be grouped into dependency levels and each level
    reconstructed as one batched step. Dependency levels are computed
    exactly from each TU's context reach (toplen/leftlen) on a 4-px
    cell map, so mixed TU sizes and the up-right/down-left
    availability windows are honored.

    tus: dict of [N] numpy arrays (decode order). Returns dict of
    [L, M] arrays (level-major), padded with valid=0 entries; L is
    rounded to a multiple of l_bucket and M to a power of two so
    compiled programs are shared across frames.
    """
    ty, tx, sz = tus["ty"], tus["tx"], tus["size"]
    toplen, leftlen = tus["toplen"], tus["leftlen"]
    valid = np.asarray(tus["valid"]) != 0
    idx = np.nonzero(valid)[0]
    n = len(np.asarray(ty))
    lvl = np.zeros(n, np.int32)
    if len(idx):
        gh = int((np.asarray(ty)[idx] + np.asarray(sz)[idx]).max()) // 4 + 2
        gw = int((np.asarray(tx)[idx] + np.asarray(toplen)[idx]).max()) \
            // 4 + 2
        cells = np.zeros((gh, gw), np.int32)
        for t in idx:
            y0, x0, s = int(ty[t]), int(tx[t]), int(sz[t])
            tl_, ll_ = int(toplen[t]), int(leftlen[t])
            lev = 0
            if y0 > 0:
                r = (y0 - 1) // 4
                c0 = max(x0 - 1, 0) // 4
                c1 = min((x0 + tl_ - 1) // 4, gw - 1)
                lev = int(cells[r, c0:c1 + 1].max())
            if x0 > 0:
                c = (x0 - 1) // 4
                r0 = y0 // 4
                r1 = min((y0 + ll_ - 1) // 4, gh - 1)
                lev = max(lev, int(cells[r0:r1 + 1, c].max()))
            lev += 1
            lvl[t] = lev
            cells[y0 // 4:(y0 + s) // 4, x0 // 4:(x0 + s) // 4] = lev
    # split each level into uniform-size sub-levels: inside the device
    # step the TU size is then a compile-time constant, so every intra
    # index map is constant and the diagonal modes take the gather-free
    # static-slice path of intra_predict (data-dependent gathers run
    # ~80 ns/element on the scalar unit - measured via xplane trace)
    sublevels = []          # (size, [tu indices])
    if len(idx):
        nlev = int(lvl.max())
        by_level = [[] for _ in range(nlev + 1)]
        for t in idx:
            by_level[lvl[t]].append(t)
        for le in range(1, nlev + 1):
            group = {}
            for t in by_level[le]:
                group.setdefault(int(sz[t]), []).append(t)
            for ssz in sorted(group):
                sublevels.append((ssz, group[ssz]))
    m = max((len(g) for _, g in sublevels), default=1)
    if m_bucket:
        m = max(8, 1 << (m - 1).bit_length())
    nsub = len(sublevels)
    L = max(l_bucket, -(-max(nsub, 1) // l_bucket) * l_bucket)
    out = {k: np.zeros((L, m), np.int32) for k in
           ("ty", "tx", "size", "mode", "toplen", "leftlen",
            "cbx_nonzero", "valid")}
    out["size"][:] = 4
    out["toplen"][:] = 4
    out["leftlen"][:] = 4
    out["lsize"] = np.full(L, 4, np.int32)    # per-level uniform size
    for le, (ssz, group) in enumerate(sublevels):
        out["lsize"][le] = ssz
        for slot, t in enumerate(group):
            for k in ("ty", "tx", "size", "mode", "toplen", "leftlen",
                      "cbx_nonzero", "valid"):
                out[k][le, slot] = tus[k][t]
    return out


def intra_wavefront(plane_pad, resid_pad, waves):
    """Wavefront-batched intra reconstruction: lax.scan over dependency
    LEVELS (not TUs); within a level all TUs reconstruct in one
    vmapped step. Bit-exact with intra_scan by construction (levels
    from schedule_wavefront honor every context dependency; TU regions
    within a level are disjoint).

    Measured on TPU v5e (1080p I-frame: 5079 TUs -> 640 levels x 32
    slots): ~24 ms/level, dominated by intra_predict under vmap --
    vmapped lax.switch executes all 10 mode branches and the diagonal
    modes' 128-buffer index gathers lower poorly. The known next step
    is a one-hot-matmul batched predictor (pred as a static per-(size,
    mode) selection matrix applied to the 257-sample context vector on
    the MXU), which removes the per-mode gathers entirely."""
    i, j = _ij()
    SIZES = (4, 8, 16, 32, 64)

    def step(P, tu):
        ty, tx, mode = tu["ty"], tu["tx"], tu["mode"]
        toplen, leftlen = tu["toplen"], tu["leftlen"]
        cbx, valid = tu["cbx_nonzero"], tu["valid"]

        def branch(s):
            # s is a python constant: intra_predict takes its
            # gather-free static-slice path
            def br(_):
                def per_tu(ty, tx, mode, toplen, leftlen, cbx):
                    def one_plane(Pp, Rp):
                        trow = lax.dynamic_slice(
                            Pp, (PADI + ty - 1, PADI + tx - 1),
                            (1, 130))[0]
                        lcol = lax.dynamic_slice(
                            Pp, (PADI + ty, PADI + tx - 1),
                            (128, 1))[:, 0]
                        k = jnp.arange(128, dtype=jnp.int32)
                        top = jnp.where(
                            ty == 0, 128,
                            trow[1 + jnp.minimum(k, toplen - 1)])
                        left = jnp.where(
                            tx == 0, 128,
                            lcol[jnp.minimum(k, leftlen - 1)])
                        tl = jnp.where(
                            ty == 0, left[0],
                            jnp.where(cbx != 0, trow[0], top[0]))
                        pred = intra_predict(left, top, tl, ty, tx, s,
                                             mode)
                        res = lax.dynamic_slice(
                            Rp, (PADI + ty, PADI + tx), (64, 64))
                        return clip255(pred + res)
                    return jax.vmap(one_plane)(P, resid_pad)  # [C,64,64]
                tiles = jax.vmap(per_tu)(ty, tx, mode, toplen, leftlen,
                                         cbx)                 # [M,C,..]
                msk = ((i < s) & (j < s))[None] \
                    & (valid[:, None, None] != 0)
                return tiles, msk
            return br

        sidx = jnp.searchsorted(jnp.asarray(SIZES, jnp.int32),
                                tu["lsize"]).astype(jnp.int32)
        tiles, m = lax.switch(sidx, [branch(s) for s in SIZES], None)

        # apply tiles with in-place dynamic updates (a big-plane scatter
        # would copy the multi-MB carry every level)
        def put(t, P):
            old = lax.dynamic_slice(
                P, (0, PADI + ty[t], PADI + tx[t]),
                (P.shape[0], 64, 64))
            new = jnp.where(m[t][None], tiles[t], old)
            return lax.dynamic_update_slice(
                P, new, (0, PADI + ty[t], PADI + tx[t]))

        P = lax.fori_loop(0, tiles.shape[0], put, P)
        return P, None

    P, _ = lax.scan(step, plane_pad, waves)
    return P


# ---------------------------------------------------------------------------
# Encoder-side batched kernels
# ---------------------------------------------------------------------------

def fwd_transform_batch(resid, size: int, fast: bool = False):
    """[N, size, size] int residual -> [N, size, size] int16-valued
    coefficients (only the low min(size,16)^2 nonzero), mirroring
    common/transform.c:249-330 as two batched int32 matmuls."""
    dsize = size
    qsize = min(size, 16)
    tr_log2size = int(np.log2(size))
    shift_1 = tr_log2size
    shift_2 = tr_log2size + 5
    inb = resid.astype(jnp.int32)

    if size > 16 and fast:
        shift_1 += 1 + (1 if size == 64 else 0)
        shift_2 = 9
        f = size // 16
        inb = inb.reshape(-1, 16, f, 16, f).sum(axis=(2, 4))
        size = 16
    elif size == 64:
        shift_1, shift_2 = 7, 10
        inb = inb.reshape(-1, 32, 2, 32, 2).sum(axis=(2, 4))
        size = 32

    M = jnp.asarray(TMAT[size][:qsize])
    add_1, add_2 = 1 << (shift_1 - 1), 1 << (shift_2 - 1)
    # tmp[n,i,j] = (sum_k M[i,k] in[n,j,k] + add1) >> shift1  (int16 wrap)
    tmp = jnp.einsum('ik,njk->nij', M, inb,
                     preferred_element_type=jnp.int32)
    tmp = ((tmp + add_1) >> shift_1).astype(jnp.int16)
    coeff = jnp.einsum('ik,njk->nij', M, tmp.astype(jnp.int32),
                       preferred_element_type=jnp.int32)
    coeff = ((coeff + add_2) >> shift_2).astype(jnp.int16)
    out = jnp.zeros((resid.shape[0], dsize, dsize), jnp.int16)
    return out.at[:, :qsize, :qsize].set(coeff)


def quantize_fwd_batch(coeff, qp, size: int, intra: bool,
                       zigzag_inv, chroma: bool = False):
    """Vectorized forward quantizer (enc/encode_block.c:75-172):
    zigzag scan, last-pos search with the 38/-26 offsets, forward
    quant with the 102/51 / 115/90 offsets (chroma always uses the
    low offset), then the unconditional 'RDOQ light' zero-run pass
    (enc/encode_block.c:134-168) as a lax.scan over scan positions.

    coeff: [N, size, size]; qp: python int OR traced int32 scalar (so
    jitted callers compile once across the GOP's QP cascade);
    zigzag_inv: [qsize*qsize] indices such that
    scoeff[zz[i*q+j]] = coeff[i,j]. Returns ([N, size, size] levels,
    [N] cbp flags).
    """
    from ..codec.constants import GQUANT_TABLE, GDEQUANT_TABLE
    qsize = min(size, 16)
    Nc = qsize * qsize
    tr_log2size = int(np.log2(size))
    qp = jnp.asarray(qp, jnp.int32)
    scale = jnp.asarray(np.asarray(GQUANT_TABLE, np.int32))[qp % 6]
    shift2 = 21 - tr_log2size + qp // 6

    block = coeff[:, :qsize, :qsize].reshape(-1, Nc).astype(jnp.int32)
    zz = jnp.asarray(zigzag_inv)
    scoeff = jnp.zeros_like(block).at[:, zz].set(block)

    off_last = jnp.left_shift(jnp.int32(38 if intra else -26),
                              shift2 - 8)
    lvl = jnp.abs(jnp.abs(scoeff) * scale + off_last) >> shift2
    nz = lvl != 0
    pos_idx = jnp.arange(Nc)
    last_pos = jnp.max(jnp.where(nz, pos_idx, -1), axis=1)   # [N]

    off0 = jnp.left_shift(jnp.int32(102 if intra else 51), shift2 - 8)
    off1 = jnp.left_shift(jnp.int32(115 if intra else 90), shift2 - 8)
    sign = jnp.where(scoeff < 0, -1, 1)
    absc = scale * jnp.abs(scoeff)
    level0 = absc >> shift2
    off = jnp.where((level0 == 0) | chroma, off0, off1)
    level = (absc + off) >> shift2
    q = jnp.where(pos_idx[None, :] <= last_pos[:, None],
                  sign * level, 0)
    cbp = (q != 0).any(axis=1)
    q = _rdoq_light(q, scoeff, last_pos, qp, tr_log2size, Nc, chroma)
    q = jnp.where(cbp[:, None], q, 0)
    out = jnp.zeros((coeff.shape[0], size, size), jnp.int16)
    out = out.at[:, :qsize, :qsize].set(
        q[:, zz].reshape(-1, qsize, qsize).astype(jnp.int16))
    return out, cbp


def _rdoq_light(q, scoeff, last_pos, qp, tr_log2size, Nc, chroma):
    """The reference's unconditional zero-run adjustment
    (enc/encode_block.c:134-168), batched over blocks: a lax.scan in
    scan-position order carrying the last-4 level window (steps only
    read/modify positions pos-2..pos, so position pos-2 is final when
    step pos completes)."""
    from jax import lax
    from ..codec.constants import GDEQUANT_TABLE
    thr = (73 * jnp.asarray(np.asarray(GDEQUANT_TABLE,
                                       np.int32))[qp % 6]
           << (qp // 6)) >> (4 + tr_log2size)
    B = q.shape[0]
    nn = jnp.where(jnp.bool_(chroma), last_pos + 1, Nc)     # [B]
    absc = jnp.abs(scoeff)
    sgn = jnp.where(scoeff < 0, -1, 1)

    def step(carry, xs):
        qm4, qm3, qm2, qm1 = carry
        pos, qcur, c0, c1, c2, s0, s1, s2 = xs
        flag = jnp.ones((B,), bool)
        flag &= ~((pos > 2) & (jnp.abs(qm3) > 1))
        flag &= ~((pos > 3) & (jnp.abs(qm4) > 1) & (jnp.abs(qm3) > 0))
        flag &= ~((pos == 2) & ((not chroma) | (last_pos >= 6)))
        act = (flag & (qm2 == 0) & (qm1 == 0) & (jnp.abs(qcur) > 1)
               & (pos < nn))
        k4 = jnp.maximum(c1, c2)
        move_cur = act & (c0 + k4 < thr)
        move_m1 = act & ~move_cur & (c1 > c2)
        move_m2 = act & ~move_cur & ~(c1 > c2)
        qcur = jnp.where(move_cur, s0, qcur)
        qm1 = jnp.where(move_m1, s1, qm1)
        qm2 = jnp.where(move_m2, s2, qm2)
        return (qm3, qm2, qm1, qcur), qm2

    zerosB = jnp.zeros((B,), q.dtype)
    pos_seq = jnp.arange(2, Nc, dtype=jnp.int32)
    xs = (pos_seq, q[:, 2:].T, absc[:, 2:].T,
          absc[:, 1:Nc - 1].T, absc[:, :Nc - 2].T,
          sgn[:, 2:].T, sgn[:, 1:Nc - 1].T, sgn[:, :Nc - 2].T)
    # latency-bound like coeff_bits: tiny elementwise body on [B]
    # lanes, so unroll to amortize the per-trip loop overhead
    (qm4, qm3, qm2, qm1), outs = lax.scan(
        step, (zerosB, zerosB, q[:, 0], q[:, 1]), xs,
        unroll=min(8, max(1, Nc - 2)))
    # outs[i] = final value of position i (emitted as qm2 at step
    # pos=i+2); positions Nc-2, Nc-1 come from the final carry
    return jnp.concatenate(
        [outs.T, qm2[:, None], qm1[:, None]], axis=1) \
        if Nc > 2 else q
