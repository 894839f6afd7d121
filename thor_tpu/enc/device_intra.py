"""Batched TPU intra encoder (the first device-side encode path).

This is the TPU-first encoder decomposition of SURVEY.md §7: instead of
the reference's per-block trial coding with stream rewinds, the mode and
split search runs as batched tensor programs over ALL blocks of the
frame simultaneously, using original-pixel prediction references (the
standard fast-encoder approximation; only the search uses it - the
final coding pass reconstructs exactly). The resulting stream is fully
valid Thor (decodable by the reference decoder); its RD decisions are
deterministic but not bit-identical to the C encoder's.

Pipeline per I-frame:
 1. search (device, batched): for each block size 8..64 and all 10
    intra modes: predict -> residual -> forward transform -> quantize ->
    reconstruct -> SSD + lambda * bit-proxy; per-size best mode/cost.
 2. split decisions (device): bottom-up quadtree min-cost reduction.
 3. final pass (device lax.scan in decode order): exact reconstruction
    with recon-based references, emitting quantized coefficients + cbp.
 4. syntax emission (host): reuses the exact bitstream writers.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..codec.constants import (
    CHROMA_QP, GDEQUANT_TABLE, GQUANT_TABLE, I_FRAME, MODE_INTRA,
    zigzag_for, log2i)
from ..codec.blockdata import find_block_contexts
from ..ops import jax_kernels as JK
from .syntax import write_block, write_super_mode


# ---------------------------------------------------------------------------
# Search pass
# ---------------------------------------------------------------------------

def _block_refs_host(org, s, W, H):
    """Per-block left/top/topleft arrays (org-pixel approximation) with
    the exact make_top_and_left edge semantics, vectorized on host."""
    from ..dec.native_inputs import (_downleft_available_v,
                                     _upright_available_v)
    HB, WB = H // s, W // s
    ty = (np.arange(HB) * s)[:, None].repeat(WB, 1)
    tx = (np.arange(WB) * s)[None, :].repeat(HB, 0)
    ty, tx = ty.reshape(-1), tx.reshape(-1)
    up_av = _upright_available_v(ty, tx, s, W)
    dl_av = _downleft_available_v(ty, tx, s, H)
    toplen = s + up_av
    leftlen = s + dl_av

    orgp = np.pad(org, ((1, 129), (1, 129)), mode="edge")
    N = len(ty)
    k = np.arange(128)
    rowidx = np.minimum(k[None, :], (toplen - 1)[:, None])
    top = orgp[ty[:, None], tx[:, None] + 1 + rowidx].astype(np.int32)
    top[ty == 0] = 128
    colidx = np.minimum(k[None, :], (leftlen - 1)[:, None])
    left = orgp[ty[:, None] + 1 + colidx, tx[:, None]].astype(np.int32)
    left[tx == 0] = 128
    tl = orgp[ty, tx].astype(np.int32)
    tl = np.where(ty == 0, left[:, 0], np.where(tx > 0, tl, top[:, 0]))
    return (ty.astype(np.int32), tx.astype(np.int32), top, left,
            tl.astype(np.int32), toplen.astype(np.int32),
            leftlen.astype(np.int32))


def _intra_mode_bits(nmodes: int):
    """Signalling bits per intra mode (write_block intra branch,
    enc/write_bits.c:418-437)."""
    from .syntax import (INTRA_MODE_MAP_8, INTRA_LEN_8, INTRA_MODE_MAP_10,
                         INTRA_LEN_10)
    if nmodes <= 4:
        return [2] * max(nmodes, 4)
    if nmodes <= 8:
        return [INTRA_LEN_8[INTRA_MODE_MAP_8[m]] for m in range(8)]
    return [INTRA_LEN_10[INTRA_MODE_MAP_10[m]] for m in range(10)]


# quote_vlc(0, CBP_TABLE-code) per cbp = y + 2u + 4v, ignoring the
# block_context.cbp==0 swap of codes 0<->1 (unknown at search time;
# +-1 bit, identical across modes of the same block most of the time).
_CBP_BITS = tuple(
    (c + 1) if c < 6 else 7
    for c in [1, 0, 5, 2, 6, 3, 7, 4])  # CBP_TABLE, enc/write_bits.c:293


def _recon_from_q(pred, q, s, qp):
    """Exact dequant + inverse transform + add (the decoder's math,
    common/common_block.c:132-156). qp may be a traced int32 scalar."""
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


def _block_refs_dev(P, s, W, H, up_av, dl_av):
    """Device twin of _block_refs_host: per-block top/left/topleft refs
    built from the plane with dense strided slices (no host gathers, no
    [N, 128] transfers). up_av/dl_av: static bool [N] numpy arrays."""
    from jax import lax
    HB, WB = H // s, W // s
    N = HB * WB
    # +1 edge pad on top/left (ref row/col above/left of each block),
    # +s+2 slack on the right/bottom for the window slices
    Pp = jnp.pad(P.astype(jnp.int32), ((1, s + 2), (1, s + 2)),
                 mode='edge')
    # rows above each block row / cols left of each block col
    RA = lax.slice(Pp, (0, 0), (HB * s, Pp.shape[1]), (s, 1))  # [HB, *]
    CA = lax.slice(Pp, (0, 0), (Pp.shape[0], WB * s), (1, s))  # [*, WB]

    def windows(M, nblk):
        # M: [nblk_other, width]; window j at origin o*s+1 per block
        cols = [lax.slice(M, (0, 1 + j), (M.shape[0], 1 + j + nblk * s),
                          (1, s)) for j in range(s + 1)]
        return jnp.stack(cols, axis=-1)   # [nblk_other, nblk, s+1]

    topw = windows(RA, WB).reshape(N, s + 1)
    leftw = windows(CA.T, HB).reshape(WB, HB, s + 1) \
        .transpose(1, 0, 2).reshape(N, s + 1)
    up = jnp.asarray(up_av[:, None])
    dl = jnp.asarray(dl_av[:, None])
    ttail = jnp.where(up, topw[:, s:s + 1], topw[:, s - 1:s])
    ltail = jnp.where(dl, leftw[:, s:s + 1], leftw[:, s - 1:s])
    top = jnp.concatenate(
        [topw[:, :s], jnp.broadcast_to(ttail, (N, 128 - s))], axis=1)
    left = jnp.concatenate(
        [leftw[:, :s], jnp.broadcast_to(ltail, (N, 128 - s))], axis=1)
    tl = lax.slice(Pp, (0, 0), (HB * s, WB * s), (s, s)).reshape(N)
    # frame-edge fills (make_top_and_left: missing refs read 128)
    ty = np.repeat(np.arange(HB) * s, WB)
    tx = np.tile(np.arange(WB) * s, HB)
    row0 = jnp.asarray((ty == 0)[:, None])
    col0 = jnp.asarray((tx == 0)[:, None])
    top = jnp.where(row0, 128, top)
    left = jnp.where(col0, 128, left)
    tl = jnp.where(jnp.asarray(ty == 0), left[:, 0],
                   jnp.where(jnp.asarray(tx > 0), tl, top[:, 0]))
    return top, left, tl


@lru_cache(maxsize=None)
def _search_frame_fn(s: int, W: int, H: int, fast: bool, nmodes: int,
                     intra_quant: bool = True):
    """_search_fn with the per-block refs and block tiles built
    in-program from the raw planes: the only inputs are the three
    frame planes (device-resident) + traced qp/lambda, and the only
    outputs are the [HB, WB] mode/cost maps."""
    from ..dec.native_inputs import (_downleft_available_v,
                                     _upright_available_v)
    HB, WB = H // s, W // s
    sc = s // 2
    ty = np.repeat(np.arange(HB) * s, WB).astype(np.int32)
    tx = np.tile(np.arange(WB) * s, HB).astype(np.int32)
    up_av = _upright_available_v(ty, tx, s, W).astype(bool)
    dl_av = _downleft_available_v(ty, tx, s, H).astype(bool)
    # the search refs use each plane's own geometry (as the host refs
    # builder did)
    up_av_c = _upright_available_v(ty // 2, tx // 2, sc,
                                   W // 2).astype(bool)
    dl_av_c = _downleft_available_v(ty // 2, tx // 2, sc,
                                    H // 2).astype(bool)
    search = _search_fn(s, fast, nmodes, intra_quant)

    def blk(plane, b):
        return plane[:HB * b, :WB * b].reshape(HB, b, WB, b) \
            .transpose(0, 2, 1, 3).reshape(-1, b, b)

    def f(orgY, orgU, orgV, qpY, qpC, lam):
        topY, leftY, tlY = _block_refs_dev(orgY, s, W, H, up_av, dl_av)
        topU, leftU, tlU = _block_refs_dev(orgU, sc, W // 2, H // 2,
                                           up_av_c, dl_av_c)
        topV, leftV, tlV = _block_refs_dev(orgV, sc, W // 2, H // 2,
                                           up_av_c, dl_av_c)
        leftC = jnp.stack([leftU, leftV], 1)
        topC = jnp.stack([topU, topV], 1)
        bm, bc = search.__wrapped__(
            blk(orgY.astype(jnp.int32), s), leftY, topY, tlY,
            jnp.asarray(ty), jnp.asarray(tx),
            blk(orgU.astype(jnp.int32), sc),
            blk(orgV.astype(jnp.int32), sc), leftC, topC, tlU, tlV,
            jnp.asarray(ty // 2), jnp.asarray(tx // 2), qpY, qpC, lam)
        return bm.reshape(HB, WB), bc.reshape(HB, WB)

    return jax.jit(f)


@lru_cache(maxsize=None)
def _search_fn(s: int, fast: bool, nmodes: int,
               intra_quant: bool = True):
    """Jitted per-size search: best mode + cost for all blocks, scored
    by the exact RD measure - true Y+U+V reconstruction SSD plus
    lambda times the exact stream bits (write_coeff cost via the device
    VLC automaton, intra-mode signalling, cbp code).
    qpY/qpC/lam are traced, so one compile covers the GOP QP cascade.
    intra_quant: quantizer offset set (intra on I frames only -
    enc/encode_block.c passes (frame_type==I_FRAME)<<1 as coeff type)."""
    from ..ops.coeff_bits import coeff_bits_batch
    zzy = zigzag_for(min(s, 16))
    sc = s // 2
    zzc = zigzag_for(min(sc, 16))
    mbits = _intra_mode_bits(nmodes)

    def plane_mode(blocks, pred, b, qp, zz, chroma):
        resid = blocks - pred
        coeff = JK.fwd_transform_batch(resid, b, fast)
        q, cbp = JK.quantize_fwd_batch(coeff, qp, b, intra_quant, zz,
                                       chroma)
        rec = _recon_from_q(pred, q, b, qp)
        ssd = ((blocks - rec) ** 2).sum(axis=(1, 2))
        return q, cbp.astype(jnp.int32), ssd

    def f(by, leftY, topY, tlY, ty, tx,
          bu, bv, leftC, topC, tlU, tlV, tyc, txc, qpY, qpC, lam):
        n = by.shape[0]
        by = by.astype(jnp.int32)
        bu = bu.astype(jnp.int32)
        bv = bv.astype(jnp.int32)
        qys, qus, qvs = [], [], []
        cbps, ssds = [], []
        for mode in range(nmodes):
            predY = jax.vmap(
                lambda L, T, t, y, x: JK.intra_predict_s(
                    L, T, t, y, x, s, mode))(leftY, topY, tlY, ty, tx)
            predU = jax.vmap(
                lambda L, T, t, y, x: JK.intra_predict_s(
                    L, T, t, y, x, sc, mode))(
                leftC[:, 0], topC[:, 0], tlU, tyc, txc)
            predV = jax.vmap(
                lambda L, T, t, y, x: JK.intra_predict_s(
                    L, T, t, y, x, sc, mode))(
                leftC[:, 1], topC[:, 1], tlV, tyc, txc)
            qy, cy, sy_ = plane_mode(by, predY, s, qpY, zzy, False)
            qu, cu, su_ = plane_mode(bu, predU, sc, qpC, zzc, True)
            qv, cv, sv_ = plane_mode(bv, predV, sc, qpC, zzc, True)
            qys.append(qy)
            qus.append(qu)
            qvs.append(qv)
            cbps.append(jnp.stack([cy, cu, cv], 1))
            ssds.append(sy_ + su_ + sv_)

        # exact write_coeff bits for every (mode, block) in one batched
        # automaton run per plane
        bity = coeff_bits_batch(jnp.concatenate(qys), s, True, False) \
            .reshape(nmodes, n)
        bitu = coeff_bits_batch(jnp.concatenate(qus), sc, True, True) \
            .reshape(nmodes, n)
        bitv = coeff_bits_batch(jnp.concatenate(qvs), sc, True, True) \
            .reshape(nmodes, n)

        best_cost = jnp.full((n,), 1 << 30, jnp.int32)
        best_mode = jnp.zeros((n,), jnp.int32)
        for mode in range(nmodes):
            cy, cu, cv = (cbps[mode][:, 0], cbps[mode][:, 1],
                          cbps[mode][:, 2])
            cbp = cy + 2 * cu + 4 * cv
            cbp_bits = jnp.zeros((n,), jnp.int32)
            for c, bb in enumerate(_CBP_BITS):
                cbp_bits = jnp.where(cbp == c, bb, cbp_bits)
            bits = (mbits[mode] + cbp_bits
                    + jnp.where(cy != 0, bity[mode], 0)
                    + jnp.where(cu != 0, bitu[mode], 0)
                    + jnp.where(cv != 0, bitv[mode], 0))
            cost = ssds[mode] + (lam * bits + 0.5).astype(jnp.int32)
            better = cost < best_cost
            best_cost = jnp.where(better, cost, best_cost)
            best_mode = jnp.where(better, mode, best_mode)
        return best_mode, best_cost
    return jax.jit(f)


def search_intra_frame_device(org, org_u, org_v, qp, qpC, lam, W, H,
                              fast, nmodes, intra_quant=True):
    """Dispatch the per-size mode searches and return the raw device
    outputs {size: (mode_map, cost_map)} WITHOUT fetching - the fused
    device encoder folds them into its one batched measurement fetch."""
    oy = jnp.asarray(org)
    ou = jnp.asarray(org_u)
    ov = jnp.asarray(org_v)
    out = {}
    for s in (8, 16, 32, 64):
        out[s] = _search_frame_fn(s, W, H, fast, nmodes, intra_quant)(
            oy, ou, ov, jnp.int32(qp), jnp.int32(qpC),
            jnp.float32(lam))
    return out


def intra_split_decisions(host, W, H, return_costs=False):
    """Bottom-up split decisions (host, tiny) over fetched
    {size: (mode_map, cost_map)} maps."""
    modes = {s: host[s][0] for s in host}
    costs = {s: np.asarray(host[s][1]).astype(np.int64) for s in host}
    split = {}
    agg = costs[8]
    for s in (16, 32, 64):
        HB, WB = H // s, W // s
        child = agg[:HB * 2, :WB * 2].reshape(HB, 2, WB, 2).sum(axis=(1, 3))
        here = costs[s][:HB, :WB]
        split[s] = child < here
        agg = np.where(split[s], child, here)
    if return_costs:
        return modes, split, costs
    return modes, split


def search_intra_frame(org, org_u, org_v, qp, qpC, lam, W, H, fast,
                       nmodes, intra_quant=True, return_costs=False):
    """Batched mode search + bottom-up split decisions. Returns
    {size: mode_map}, split maps (and per-size cost maps on request).

    One device dispatch per size over the raw planes (refs + block
    tiles are built in-program); all four sizes' maps come back in a
    single batched fetch - through a high-RTT link eight blocking
    per-map fetches cost more than the search itself."""
    out = search_intra_frame_device(org, org_u, org_v, qp, qpC, lam, W,
                                    H, fast, nmodes, intra_quant)
    return intra_split_decisions(jax.device_get(out), W, H,
                                 return_costs)


# ---------------------------------------------------------------------------
# Final pass: exact reconstruction scan
# ---------------------------------------------------------------------------

def _walk_tree(split, modes, W, H):
    """Quadtree walk in decode order -> list of (ty, tx, size, mode)."""
    out = []

    def rec(s, y, x):
        if y >= H or x >= W:
            return
        full = (y + s <= H) and (x + s <= W)
        if s > 8 and (not full or split[s][y // s, x // s]):
            h = s // 2
            rec(h, y, x)
            rec(h, y + h, x)
            rec(h, y, x + h)
            rec(h, y + h, x + h)
            return
        if full:
            out.append((y, x, s, int(modes[s][y // s, x // s])))

    for k in range(0, H, 64):
        for l in range(0, W, 64):
            rec(64, k, l)
    return out


def use_pallas_enc(H: int = 0, W: int = 0) -> bool:
    """Pallas whole-scan encoder kernel on real TPUs; the XLA lax.scan
    elsewhere. Override with THOR_PALLAS_ENC=1/0 (1 off-TPU implies
    interpret mode). Mirrors dec/reconstruct_jax.use_pallas_intra.

    With a geometry, also requires the kernel's VMEM residents (plane
    + transpose + org) to fit: ~4K luma needs ~30 MB > the 16 MB core
    VMEM, so UHD falls back to the XLA scan."""
    import os
    if H and W:
        Hp = ((8 + H) >> 7 << 7) + 384
        Wp = ((8 + W) >> 7 << 7) + 384
        if 3 * Hp * Wp > 14 * (1 << 20):
            return False
    v = os.environ.get("THOR_PALLAS_ENC")
    if v is not None:
        return v not in ("0", "")
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _pallas_enc_interpret() -> bool:
    import os
    if os.environ.get("THOR_PALLAS_ENC"):
        try:
            return jax.default_backend() != "tpu"
        except Exception:
            return True
    return False


def pallas_scan_luma(y_d, org_y_d, arr, qp, fast: bool, intra: bool):
    """Pallas twin of _encode_scan_fn's luma scan on UNPADDED [H, W]
    planes. Returns (y [H, W] i32, q16 [n, 16, 16] i16, cbp [n] bool)
    rows aligned with arr's valid-first order."""
    from ..ops.pallas_enc_intra import (
        SIZES_Y, build_enc_records, encode_scan_pallas)
    recs, cnt = build_enc_records(arr, SIZES_Y)
    planes, q16 = encode_scan_pallas(
        y_d[None], org_y_d[None], recs, cnt, qp, SIZES_Y, fast, intra,
        interpret=_pallas_enc_interpret())
    n = len(arr["valid"])
    q = q16[:n, 0]
    valid = jnp.asarray(np.asarray(arr["valid"]) != 0)[:q.shape[0]]
    cbp = (q != 0).any(axis=(1, 2)) & valid
    return planes[0], q, cbp


def pallas_scan_chroma(u_d, v_d, ou_d, ov_d, arrc, qp, fast: bool,
                       intra: bool):
    """Pallas twin of the chroma scan. Returns (u, v, q16u, cbpu,
    q16v, cbpv)."""
    from ..ops.pallas_enc_intra import (
        SIZES_C, build_enc_records, encode_scan_pallas)
    recs, cnt = build_enc_records(arrc, SIZES_C)
    planes, q16 = encode_scan_pallas(
        jnp.stack([jnp.asarray(u_d), jnp.asarray(v_d)]),
        jnp.stack([jnp.asarray(ou_d), jnp.asarray(ov_d)]),
        recs, cnt, qp, SIZES_C, fast, intra,
        interpret=_pallas_enc_interpret())
    n = len(arrc["valid"])
    qu, qv = q16[:n, 0], q16[:n, 1]
    valid = jnp.asarray(np.asarray(arrc["valid"]) != 0)[:qu.shape[0]]
    cu = (qu != 0).any(axis=(1, 2)) & valid
    cv = (qv != 0).any(axis=(1, 2)) & valid
    return planes[0], planes[1], qu, cu, qv, cv


@lru_cache(maxsize=None)
def _encode_scan_fn(fast: bool, n_steps: int,
                    intra_quant: bool = True):
    """Jitted exact-recon scans (luma + chroma) over chosen TUs.
    The returned fns take the frame QP as a traced trailing arg (one
    compile covers the GOP QP cascade)."""
    zzs = {s: zigzag_for(min(s, 16)) for s in (4, 8, 16, 32, 64)}

    def tu_step(qp, P, O, tu, sizes_list):
        ty, tx, size, mode = tu["ty"], tu["tx"], tu["size"], tu["mode"]
        toplen, leftlen = tu["toplen"], tu["leftlen"]
        i, j = JK._ij()
        m = (i < size) & (j < size) & (tu["valid"] != 0)

        trow = lax.dynamic_slice(P, (JK.PADI + ty - 1, JK.PADI + tx - 1),
                                 (1, 130))[0]
        lcol = lax.dynamic_slice(P, (JK.PADI + ty, JK.PADI + tx - 1),
                                 (128, 1))[:, 0]
        k = jnp.arange(128, dtype=jnp.int32)
        top = jnp.where(ty == 0, 128, trow[1 + jnp.minimum(k, toplen - 1)])
        left = jnp.where(tx == 0, 128, lcol[jnp.minimum(k, leftlen - 1)])
        tl = jnp.where(ty == 0, left[0],
                       jnp.where(tu["cbx_nonzero"] != 0, trow[0], top[0]))
        pred = JK.intra_predict(left, top, tl, ty, tx, size, mode)
        org = lax.dynamic_slice(O, (JK.PADI + ty, JK.PADI + tx), (64, 64))
        resid = jnp.where(m, org - pred, 0)

        def enc_branch(s):
            def br(_):
                c = JK.fwd_transform_batch(resid[None, :s, :s], s, fast)
                q, cbp = JK.quantize_fwd_batch(c, qp, s, intra_quant,
                                               zzs[s])
                rsh = int(np.log2(s)) - 1
                fac = jnp.left_shift(
                    jnp.asarray(np.asarray(GDEQUANT_TABLE, np.int32))
                    [qp % 6], qp // 6)
                rc = jnp.clip(
                    (q.astype(jnp.int32) * fac + (1 << (rsh - 1))) >> rsh,
                    -32768, 32767).astype(jnp.int16)
                if s == 64:
                    rr = JK.idct_batch(rc[:, :32, :32], 32)
                    rr = jnp.repeat(jnp.repeat(rr, 2, 1), 2, 2)
                else:
                    rr = JK.idct_batch(rc, s)
                q16 = jnp.zeros((16, 16), jnp.int16)
                qs = min(s, 16)
                q16 = q16.at[:qs, :qs].set(q[0, :qs, :qs])
                rr64 = jnp.zeros((64, 64), jnp.int32)
                rr64 = rr64.at[:s, :s].set(rr[0])
                return q16, cbp[0], rr64
            return br

        branch_sizes = sizes_list
        idx = jnp.searchsorted(jnp.asarray(branch_sizes),
                               size).astype(jnp.int32)
        q16, cbp, rr = lax.switch(
            idx, [enc_branch(s) for s in branch_sizes], None)
        rec = jnp.clip(pred + rr, 0, 255)
        old = lax.dynamic_slice(P, (JK.PADI + ty, JK.PADI + tx), (64, 64))
        P = lax.dynamic_update_slice(P, jnp.where(m, rec, old),
                                     (JK.PADI + ty, JK.PADI + tx))
        return P, (q16, cbp & (tu["valid"] != 0))

    def luma(P, O, tus, qpY):
        qpY = jnp.asarray(qpY, jnp.int32)

        def step(P, tu):
            return tu_step(qpY, P, O, tu, (8, 16, 32, 64))
        P, (q16, cbp) = lax.scan(step, P, tus)
        return P, q16, cbp

    def chroma(Pu, Pv, Ou, Ov, tus, qpC):
        qpC = jnp.asarray(qpC, jnp.int32)

        def step(carry, tu):
            Pu, Pv = carry
            Pu, (qu, cu) = tu_step(qpC, Pu, Ou, tu, (4, 8, 16, 32))
            Pv, (qv, cv) = tu_step(qpC, Pv, Ov, tu, (4, 8, 16, 32))
            return (Pu, Pv), (qu, cu, qv, cv)
        (Pu, Pv), (qu, cu, qv, cv) = lax.scan(step, (Pu, Pv), tus)
        return Pu, Pv, qu, cu, qv, cv

    return jax.jit(luma), jax.jit(chroma)


def encode_intra_frame_device(enc, w, org_y, org_u, org_v):
    """Device-searched, device-reconstructed I-frame; returns recon and
    writes the frame syntax through the exact host writers."""
    W, H = enc.width, enc.height
    p = enc.params
    qpY = enc.frame_qp
    qpC = int(CHROMA_QP[qpY])
    fast = p.encoder_speed > 1
    lam = enc.lambda_

    modes, split = search_intra_frame(org_y, org_u, org_v, qpY, qpC,
                                      lam, W, H, fast,
                                      enc.num_intra_modes)
    tus = _walk_tree(split, modes, W, H)

    def pad_for(plane, v):
        return jnp.pad(jnp.asarray(plane, jnp.int32),
                       ((JK.PADI, JK.PADE), (JK.PADI, JK.PADE)),
                       constant_values=v)

    n = len(tus)
    # bucket the TU count so the jitted scan is shared across frames
    # (padding entries carry valid=0 and are masked out inside the scan)
    npad = max(128, 1 << (n - 1).bit_length())
    from ..dec.native_inputs import (_downleft_available_v,
                                     _upright_available_v)
    ty = np.array([t[0] for t in tus], np.int32)
    tx = np.array([t[1] for t in tus], np.int32)
    sz = np.array([t[2] for t in tus], np.int32)
    md = np.array([t[3] for t in tus], np.int32)
    up = _upright_available_v(ty, tx, sz, W)
    dl = _downleft_available_v(ty, tx, sz, H)

    def padn(a, fill=0):
        return np.concatenate(
            [a.astype(np.int32),
             np.full(npad - n, fill, np.int32)])

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

    if use_pallas_enc(H, W):
        yj, q16y, cbpy = pallas_scan_luma(
            jnp.zeros((H, W), jnp.int32), jnp.asarray(org_y, jnp.int32),
            arr, jnp.int32(qpY), fast, True)
        uj, vj, q16u, cbpu, q16v, cbpv = pallas_scan_chroma(
            jnp.zeros((H // 2, W // 2), jnp.int32),
            jnp.zeros((H // 2, W // 2), jnp.int32),
            jnp.asarray(org_u, jnp.int32), jnp.asarray(org_v, jnp.int32),
            arrc, jnp.int32(qpC), fast, True)
        y = np.asarray(yj).astype(np.uint8)
        u = np.asarray(uj).astype(np.uint8)
        v = np.asarray(vj).astype(np.uint8)
    else:
        luma_fn, chroma_fn = _encode_scan_fn(fast, npad)
        P = pad_for(np.zeros((H, W)), 0)
        O = pad_for(org_y, 0)
        P, q16y, cbpy = luma_fn(P, O, arr, jnp.int32(qpY))
        y = np.asarray(P[JK.PADI:JK.PADI + H, JK.PADI:JK.PADI + W]) \
            .astype(np.uint8)
        Pu = pad_for(np.zeros((H // 2, W // 2)), 0)
        Pv = pad_for(np.zeros((H // 2, W // 2)), 0)
        Ou = pad_for(org_u, 0)
        Ov = pad_for(org_v, 0)
        Pu, Pv, q16u, cbpu, q16v, cbpv = chroma_fn(Pu, Pv, Ou, Ov, arrc,
                                                   jnp.int32(qpC))
        u = np.asarray(
            Pu[JK.PADI:JK.PADI + H // 2, JK.PADI:JK.PADI + W // 2]) \
            .astype(np.uint8)
        v = np.asarray(
            Pv[JK.PADI:JK.PADI + H // 2, JK.PADI:JK.PADI + W // 2]) \
            .astype(np.uint8)

    q16y = np.asarray(q16y)
    q16u = np.asarray(q16u)
    q16v = np.asarray(q16v)
    import os
    if os.environ.get("THOR_DEVINTRA_DUMP"):
        np.savez(os.environ["THOR_DEVINTRA_DUMP"],
                 tus=np.array(tus, np.int32), q16y=q16y, q16u=q16u,
                 q16v=q16v, cbpy=np.asarray(cbpy), cbpu=np.asarray(cbpu),
                 cbpv=np.asarray(cbpv), y=y, u=u, v=v, qpY=qpY, qpC=qpC,
                 lam=float(lam), fast=int(fast))
    cbpy = np.asarray(cbpy)
    cbpu = np.asarray(cbpu)
    cbpv = np.asarray(cbpv)

    # --- host syntax emission through the exact writers ---
    from .block import BlockInfo, BlockParam
    bidx = {(int(t[0]), int(t[1]), int(t[2])): i
            for i, t in enumerate(tus)}

    def emit(s, y0, x0):
        if y0 >= H or x0 >= W:
            return
        key = (y0, x0, s)
        binfo = BlockInfo(size=s, ypos=y0, xpos=x0,
                          bwidth=min(s, W - x0), bheight=min(s, H - y0),
                          max_num_tb_part=2 if p.enable_tb_split == 1
                          else 1, max_num_pb_part=1)
        binfo.block_context = find_block_contexts(
            y0, x0, H, W, s, enc.deblock_data, bool(p.use_block_contexts))
        if key not in bidx:
            if s > 8:
                if y0 + s <= H and x0 + s <= W:
                    write_super_mode(w, enc, binfo, MODE_INTRA, 0, 1)
                if s == 64 and p.max_delta_qp:
                    # the decoder reads a delta-QP after every 64-SB
                    # super mode on I frames (mode INTRA != SKIP);
                    # the device path always codes dqp = 0
                    from .syntax import write_delta_qp
                    write_delta_qp(w, 0)
                h = s // 2
                emit(h, y0, x0)
                emit(h, y0 + h, x0)
                emit(h, y0, x0 + h)
                emit(h, y0 + h, x0 + h)
                return
            raise AssertionError("missing leaf")
        i = bidx[key]
        bp = BlockParam(mode=MODE_INTRA, intra_mode=int(md[i]))
        sc = s // 2
        qs = min(s, 16)
        cy = np.zeros((s, s), np.int16)
        cy[:qs, :qs] = q16y[i][:qs, :qs]
        qsc = min(sc, 16)
        cu = np.zeros((sc, sc), np.int16)
        cv = np.zeros((sc, sc), np.int16)
        cu[:qsc, :qsc] = q16u[i][:qsc, :qsc]
        cv[:qsc, :qsc] = q16v[i][:qsc, :qsc]
        bp.coeff_y, bp.coeff_u, bp.coeff_v = cy, cu, cv
        bp.cbp = (int(cbpy[i]), int(cbpu[i]), int(cbpv[i]))
        bp.tb_param = 0
        write_block(w, enc, binfo, bp)
        binfo.block_param = bp
        enc.store_deblock_data(binfo)

    for k in range(0, H, 64):
        for l in range(0, W, 64):
            emit(64, k, l)

    return y, u, v
