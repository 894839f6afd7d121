"""Vectorized device-input builder over the native parse SoA output.

The native C entropy layer emits struct-of-arrays block records; this
module turns them into the batched device-program inputs with pure
vectorized numpy (no per-block Python loops), completing the
"serial parse -> SoA planes -> one device program" decode pipeline.
Produces the same FrameConfig/input dict as the FrameSyntax-based
builder, so all jitted stages are shared.
"""

from __future__ import annotations

import numpy as np

from ..codec.constants import (
    BETA_TABLE, CHROMA_QP, GDEQUANT_TABLE, TC_TABLE)
from .reconstruct_jax import FrameConfig, _pow2pad
from ..ops.pallas_mc import build_mc_records


def _upright_available_v(ypos, xpos, size, width):
    avail = (ypos > 0) & (xpos + size < width)
    avail &= ~((size == 32) & (ypos % 64 == 32))
    avail &= ~((size == 16) & ((ypos % 32 == 16)
               | ((ypos % 64 == 32) & (xpos % 32 == 16))))
    avail &= ~((size == 8) & ((ypos % 16 == 8)
               | ((ypos % 32 == 16) & (xpos % 16 == 8))
               | ((ypos % 64 == 32) & (xpos % 32 == 24))))
    return avail


def _downleft_available_v(ypos, xpos, size, height):
    avail = (xpos > 0) & (ypos + size < height)
    avail &= size != 64
    avail &= ~((size == 32) & (ypos % 64 == 32))
    avail &= ~((size == 16) & ((ypos % 64 == 48)
               | ((ypos % 64 == 16) & (xpos % 32 == 16))))
    avail &= ~((size == 8) & ((ypos % 64 == 56)
               | ((ypos % 16 == 8) & (xpos % 16 == 8))
               | ((ypos % 64 == 24) & (xpos % 32 == 16))))
    return avail


def _dq_arrays(qp, tsize_log2):
    factor = GDEQUANT_TABLE[qp % 6].astype(np.int32) << (qp // 6)
    rshift = tsize_log2 - 1
    add = (1 << (rshift - 1)).astype(np.int32) if isinstance(rshift, np.ndarray) \
        else np.int32(1 << (rshift - 1))
    return factor, add, rshift


def _gather_slabs(coeff_buf, offs, s):
    """[N] offsets -> [N, s, s] int16 slabs."""
    if len(offs) == 0:
        return np.zeros((0, s, s), np.int16)
    idx = offs[:, None] + np.arange(s * s, dtype=np.int64)[None, :]
    return coeff_buf[idx].reshape(-1, s, s)


class _Group:
    __slots__ = ("coeff", "ys", "xs", "qp", "tlog2", "pl")

    def __init__(self):
        self.coeff = []
        self.ys = []
        self.xs = []
        self.qp = []
        self.tlog2 = []
        self.pl = []

    def add(self, coeff, ys, xs, qp, tlog2, pl=None):
        if len(ys) == 0:
            return
        self.coeff.append(coeff)
        self.ys.append(ys)
        self.xs.append(xs)
        self.qp.append(qp)
        self.tlog2.append(np.full(len(ys), tlog2, np.int32))
        if pl is not None:
            self.pl.append(pl)

    def pack(self, s, with_plane):
        n = sum(len(y) for y in self.ys)
        npad = _pow2pad(max(n, 1))
        cs = 32 if s == 64 else s
        coeff = np.zeros((npad, cs, cs), np.int16)
        ys = np.zeros(npad, np.int32)
        xs = np.zeros(npad, np.int32)
        qp = np.zeros(npad, np.int32)
        tl = np.full(npad, 3, np.int32)
        pl = np.zeros(npad, np.int32)
        if n:
            coeff[:n] = np.concatenate(self.coeff)
            ys[:n] = np.concatenate(self.ys)
            xs[:n] = np.concatenate(self.xs)
            qp[:n] = np.concatenate(self.qp)
            tl[:n] = np.concatenate(self.tlog2)
            if with_plane:
                pl[:n] = np.concatenate(self.pl)
        fac, add, rsh = _dq_arrays(qp, tl)
        out = {"coeff": coeff, "y": ys, "x": xs, "f": fac,
               "a": add.astype(np.int32) if isinstance(add, np.ndarray)
               else np.full(npad, add, np.int32),
               "sh": rsh.astype(np.int32)}
        if with_plane:
            out["pl"] = pl
        return out, npad


def _emit_plane_tus(g, coeff_buf, offs, sizes, ys, xs, qps, tb, nz_ok,
                    plane_id=None):
    """Emit residual TUs for one plane class from SoA block arrays.

    tb: per-block bool (this plane uses a TB split); nz_ok: per-block
    bool (cbp set / coefficients may be nonzero)."""
    for s in (4, 8, 16, 32, 64):
        sel = (sizes == s) & nz_ok
        if not sel.any():
            continue
        sel_ntb = sel & ~tb
        if sel_ntb.any():
            slabs = _gather_slabs(coeff_buf, offs[sel_ntb], s)
            nz = slabs.reshape(len(slabs), -1).any(axis=1)
            pl = (np.full(int(nz.sum()), plane_id, np.int32)
                  if plane_id is not None else None)
            tl = 6 if s == 64 else s.bit_length() - 1
            g.add(slabs[nz][:, :32, :32] if s == 64 else slabs[nz],
                  ys[sel_ntb][nz], xs[sel_ntb][nz], qps[sel_ntb][nz],
                  tl, pl)
        sel_tb = sel & tb
        if sel_tb.any():
            s2 = s // 2
            slabs = _gather_slabs(coeff_buf, offs[sel_tb], s)
            q = slabs.reshape(-1, 2, s2, 2, s2).transpose(0, 1, 3, 2, 4) \
                .reshape(-1, 4, s2, s2)
            by = ys[sel_tb]
            bx = xs[sel_tb]
            qp = qps[sel_tb]
            for k in range(4):
                i, j = (k >> 1) & 1, k & 1
                sub = q[:, k]
                nz = sub.reshape(len(sub), -1).any(axis=1)
                if not nz.any():
                    continue
                pl = (np.full(int(nz.sum()), plane_id, np.int32)
                      if plane_id is not None else None)
                g.add(sub[nz], by[nz] + i * s2, bx[nz] + j * s2, qp[nz],
                      s2.bit_length() - 1, pl)


def _emit_sparse_tus(acc, coeff_buf, offs, sizes, ys, xs, qps, tb,
                     nz_ok, plane_id=None):
    """Sparse TU emission: nonzero coefficients straight from the
    parser's compact per-block slab buffer, fully vectorized - no dense
    [N, s, s] slab gather (that gather was ~60% of the host build time
    and its padded banks ~50% of the h2d bytes).

    acc: dict final-group-size -> accumulator (see _pack_sparse).
    Layout contract with thor_entropy.c: every block reserves a
    size*size raster slab at offs[i] (quadrants of a tb-split block
    occupy the spatial quadrants of the slab; a ntb 64-block codes only
    its top-left 32x32)."""
    sel = np.nonzero(nz_ok)[0]
    if not len(sel):
        return
    co = offs[sel]
    bs = sizes[sel].astype(np.int64)
    end = int(co[-1] + bs[-1] * bs[-1])
    nz = np.flatnonzero(coeff_buf[:end])
    if not len(nz):
        return
    j = np.searchsorted(co, nz, side='right') - 1
    o = nz - co[j]
    s = bs[j]
    r = (o // s).astype(np.int64)
    c = (o % s).astype(np.int64)
    v = coeff_buf[nz].astype(np.int32)
    is_tb = tb[sel][j]
    s2 = s >> 1
    subk = np.where(is_tb, (r >= s2) * 2 + (c >= s2), 0)
    rl = np.where(is_tb, r % s2, r)
    cl = np.where(is_tb, c % s2, c)
    # final group: tb quadrants land in the s/2 group; ntb 64-blocks
    # keep their own group (32x32 bank, tr_log2 6)
    gkey = np.where(is_tb, s2, s)
    keep = (rl < 32) & (cl < 32)     # ntb-64 codes only the TL 32x32
    for g in np.unique(gkey):
        m = keep & (gkey == g)
        if not m.any():
            continue
        key = j[m] * 4 + subk[m]
        uk, inv = np.unique(key, return_inverse=True)
        ju = uk >> 2
        ku = uk & 3
        su = bs[ju]
        s2u = su >> 1
        tbu = tb[sel][ju]
        gy = ys[sel][ju] + np.where(tbu, (ku >> 1) * s2u, 0)
        gx = xs[sel][ju] + np.where(tbu, (ku & 1) * s2u, 0)
        tl = np.where(tbu, np.log2(s2u),
                      np.where(su == 64, 6, np.log2(su))).astype(np.int32)
        a = acc.setdefault(int(g), {
            'n': 0, 'ys': [], 'xs': [], 'qp': [], 'tl': [], 'pl': [],
            'sl': [], 'rl': [], 'cl': [], 'vv': []})
        a['ys'].append(gy.astype(np.int32))
        a['xs'].append(gx.astype(np.int32))
        a['qp'].append(qps[sel][ju].astype(np.int32))
        a['tl'].append(tl)
        if plane_id is not None:
            a['pl'].append(np.full(len(uk), plane_id, np.int32))
        a['sl'].append(inv.astype(np.int64) + a['n'])
        a['rl'].append(rl[m])
        a['cl'].append(cl[m])
        a['vv'].append(v[m])
        a['n'] += len(uk)


def _pack_sparse(a, g, with_pl):
    """Accumulator -> the fused path's sparse group dict
    ({cidx, cval, y, x, f, a, sh[, pl]}, npad)."""
    cs = 32 if g == 64 else g
    n = a['n'] if a else 0
    npad = _pow2pad(max(n, 1))
    ys = np.zeros(npad, np.int32)
    xs = np.zeros(npad, np.int32)
    qp = np.zeros(npad, np.int32)
    tl = np.full(npad, 3, np.int32)
    pl = np.zeros(npad, np.int32)
    if n:
        ys[:n] = np.concatenate(a['ys'])
        xs[:n] = np.concatenate(a['xs'])
        qp[:n] = np.concatenate(a['qp'])
        tl[:n] = np.concatenate(a['tl'])
        if with_pl and a['pl']:
            pl[:n] = np.concatenate(a['pl'])
        sl = np.concatenate(a['sl'])
        rr = np.concatenate(a['rl'])
        cc = np.concatenate(a['cl'])
        vv = np.concatenate(a['vv'])
        lin = (sl * cs * cs + rr * cs + cc).astype(np.int32)
    else:
        lin = np.zeros(0, np.int32)
        vv = np.zeros(0, np.int32)
    K = max(64, 1 << int(np.ceil(np.log2(max(1, len(lin))))))
    cidx = np.zeros(K, np.int32)
    cval = np.zeros(K, np.int32)
    cidx[:len(lin)] = lin
    cval[:len(lin)] = vv
    fac, add, rsh = _dq_arrays(qp, tl)
    out = {'cidx': cidx, 'cval': cval, 'y': ys, 'x': xs, 'f': fac,
           'a': add.astype(np.int32) if isinstance(add, np.ndarray)
           else np.full(npad, add, np.int32),
           'sh': rsh.astype(np.int32)}
    if with_pl:
        out['pl'] = pl
    return out, npad


def build_mc_pus_native(nf, R, fnum, cur, W, H):
    """Per-prediction-unit MC params from the native block records.

    Expands each coded block into its prediction units (PB partitions,
    enc/encode_block.c PART_*), clips border blocks to the frame, and
    sign-folds MVs exactly as the cell-map path does. Intra blocks emit
    a zero-MV slot-0 PU so the record set tiles the frame (their pixels
    are overwritten by the intra scan, matching the gather path's
    behavior on dd's zeroed intra cells).

    Returns a dict of luma-coordinate arrays for
    ops/pallas_mc.build_mc_records.
    """
    y0, x0, size = nf.ypos, nf.xpos, nf.size
    mode = nf.mode
    pbp = nf.dd["pb_part"][y0 // 4, x0 // 4]
    pbp = np.where(mode == 2, pbp, 0)            # only INTER has PBs
    bi = nf.dir == 2
    slot0 = np.clip(nf.ref_idx0, 0, R - 1).astype(np.int64)
    slot1 = np.clip(nf.ref_idx1, 0, R - 1).astype(np.int64)
    intra = mode == 1
    slot0 = np.where(intra, 0, slot0)
    slot1 = np.where(intra, 0, slot1)
    sign0 = np.where(bi, fnum[slot0] >= cur, fnum[slot0] > cur)
    sign1 = fnum[slot1] >= cur

    out = {k: [] for k in ("y0", "x0", "h", "w", "slot0", "mvx0",
                           "mvy0", "bi", "slot1", "mvx1", "mvy1")}
    # quadrant k participates for these pb_part values, with PB dims
    # and offsets in half-size units
    quads = {0: ((0,), [(0, 0, 2, 2)]),
             1: ((0, 2), [(0, 0, 1, 2), (1, 0, 1, 2)]),
             2: ((0, 1), [(0, 0, 2, 1), (0, 1, 2, 1)]),
             3: ((0, 1, 2, 3), [(0, 0, 1, 1), (0, 1, 1, 1),
                                (1, 0, 1, 1), (1, 1, 1, 1)])}
    for part, (ks, geoms) in quads.items():
        sel = np.nonzero(pbp == part)[0]
        if not len(sel):
            continue
        s2 = size[sel] // 2
        for k, (qi, qj, gh, gw) in zip(ks, geoms):
            py = y0[sel] + qi * s2
            px = x0[sel] + qj * s2
            ph = np.minimum(gh * s2, H - py)
            pw = np.minimum(gw * s2, W - px)
            keep = (ph > 0) & (pw > 0)
            if not keep.any():
                continue
            kk = sel[keep]
            mvx0 = np.where(sign0[kk], -nf.mv0x[kk, k], nf.mv0x[kk, k])
            mvy0 = np.where(sign0[kk], -nf.mv0y[kk, k], nf.mv0y[kk, k])
            mvx0 = np.where(intra[kk], 0, mvx0)
            mvy0 = np.where(intra[kk], 0, mvy0)
            mvx1 = np.where(sign1[kk], -nf.mv1x[kk, k], nf.mv1x[kk, k])
            mvy1 = np.where(sign1[kk], -nf.mv1y[kk, k], nf.mv1y[kk, k])
            out["y0"].append(py[keep])
            out["x0"].append(px[keep])
            out["h"].append(ph[keep])
            out["w"].append(pw[keep])
            out["slot0"].append(slot0[kk])
            out["mvx0"].append(mvx0)
            out["mvy0"].append(mvy0)
            out["bi"].append(bi[kk].astype(np.int64))
            out["slot1"].append(slot1[kk])
            out["mvx1"].append(mvx1)
            out["mvy1"].append(mvy1)
    return {k: (np.concatenate(v) if v else np.zeros(0, np.int64))
            for k, v in out.items()}


def insert_ref_planes(inp, slots, refs, interp_frame):
    """Insert the actual reference plane handles for build_frame_inputs_meta
    output. Separated from the meta build because the handles depend on
    previously dispatched frames (pipelined decode builds inputs for
    frame n+1 in a worker thread while frame n is still in flight)."""
    if not slots:
        return
    planes = [refs[r] if r >= 0 else interp_frame for r in slots]
    from .reconstruct_jax import use_fused
    if use_fused():
        # the fused program stacks the reference planes in-jit:
        # no separate stack dispatch, device-resident refs never
        # touch the host
        inp["refYs"] = tuple(p.y for p in planes)
        inp["refUs"] = tuple(p.u for p in planes)
        inp["refVs"] = tuple(p.v for p in planes)
    else:
        import jax
        import jax.numpy as jnp
        stack = jnp.stack if isinstance(planes[0].y, jax.Array) \
            else np.stack
        inp["refY"] = stack([p.y for p in planes])
        inp["refU"] = stack([p.u for p in planes])
        inp["refV"] = stack([p.v for p in planes])


def build_frame_inputs_native(nf, seq, refs, interp_frame, deblocking):
    """NativeFrame -> (FrameConfig, device inputs), fully vectorized."""
    ref_nums = [r.frame_num for r in refs]
    interp_num = interp_frame.frame_num if interp_frame is not None \
        else nf.hdr.display_frame_num
    cfg, inp, slots = build_frame_inputs_meta(nf, seq, ref_nums,
                                              interp_num, deblocking)
    insert_ref_planes(inp, slots, refs, interp_frame)
    return cfg, inp


def build_frame_inputs_meta(nf, seq, ref_frame_nums, interp_frame_num,
                            deblocking):
    """Everything in build_frame_inputs_native except the reference
    plane handles: depends only on the parsed frame + the sliding
    window of reference display frame numbers, so it can run ahead of
    the device dispatch in a worker thread. Returns (cfg, inp, slots)
    where slots lists the ref_array indices (length Rpad, -1 = interp
    frame) whose plane handles insert_ref_planes must add."""
    W, H = seq.width, seq.height
    fh = nf.hdr
    dd = nf.dd
    inp = {}
    slots = []

    R = fh.num_ref
    if R > 0:
        Rpad = max(seq.max_num_ref + (1 if seq.interp_ref else 0), R)
        slots = [fh.ref_array[i] for i in range(R)]
        while len(slots) < Rpad:
            slots.append(slots[0])
        fnum = np.array([ref_frame_nums[r] if r >= 0 else
                         interp_frame_num for r in slots], np.int64)
        cur = fh.display_frame_num
        slot0 = np.clip(dd["ref_idx0"], 0, R - 1).astype(np.int32)
        slot1 = np.clip(dd["ref_idx1"], 0, R - 1).astype(np.int32)
        bi = dd["bipred_flag"] == 2
        sign0 = np.where(bi, fnum[slot0] >= cur, fnum[slot0] > cur)
        sign1 = fnum[slot1] >= cur
        inp["mv0x"] = np.where(sign0, -dd["mv0x"], dd["mv0x"]).astype(np.int32)
        inp["mv0y"] = np.where(sign0, -dd["mv0y"], dd["mv0y"]).astype(np.int32)
        inp["mv1x"] = np.where(sign1, -dd["mv1x"], dd["mv1x"]).astype(np.int32)
        inp["mv1y"] = np.where(sign1, -dd["mv1y"], dd["mv1y"]).astype(np.int32)
        inp["slot0"] = slot0
        inp["slot1"] = slot1
        inp["use_bi"] = bi
        R = Rpad
    has_bi = R > 1 and bool(seq.bipred)

    mc_my = mc_mc = 0
    if R > 0:
        from .reconstruct_jax import use_pallas_mc
        if use_pallas_mc():
            pus = build_mc_pus_native(nf, fh.num_ref, fnum, cur, W, H)
            recs_y, cnt_y = build_mc_records(
                pus, H, W, pad=96, frac_bits=2, tap_lo=-2, TH=64, TW=128)
            pus_c = dict(pus)
            for k in ("y0", "x0", "h", "w"):
                pus_c[k] = pus[k] // 2
            recs_c, cnt_c = build_mc_records(
                pus_c, H // 2, W // 2, pad=48, frac_bits=3, tap_lo=-1,
                TH=32, TW=128)
            # int16 on the wire (every record field fits: coords in
            # the padded plane < 2.2k, phases < 256); mc_frame_pallas
            # upcasts on device. Halves the second-largest h2d input.
            inp["mc_recs_y"] = recs_y.astype(np.int16)
            inp["mc_cnt_y"] = cnt_y
            inp["mc_recs_c"] = recs_c.astype(np.int16)
            inp["mc_cnt_c"] = cnt_c
            mc_my, mc_mc = recs_y.shape[1], recs_c.shape[1]

    # --- residual TU groups ---
    sizes = nf.size
    ys, xs = nf.ypos, nf.xpos
    qps = nf.qp
    qpc = CHROMA_QP[qps].astype(np.int32)
    tb = nf.tb_split.astype(bool)
    tbc = tb & (sizes > 8)
    cbp = nf.cbp
    groups_y, groups_c = [], []
    from .reconstruct_jax import use_fused
    if use_fused():
        # sparse groups straight from the compact parse buffers
        acc_y, acc_c = {}, {}
        _emit_sparse_tus(acc_y, nf.coeff_y, nf.coff_y, sizes, ys, xs,
                         qps, tb, (cbp & 1) != 0)
        _emit_sparse_tus(acc_c, nf.coeff_u, nf.coff_u, sizes // 2,
                         ys // 2, xs // 2, qpc, tbc, (cbp & 2) != 0,
                         plane_id=0)
        _emit_sparse_tus(acc_c, nf.coeff_v, nf.coff_v, sizes // 2,
                         ys // 2, xs // 2, qpc, tbc, (cbp & 4) != 0,
                         plane_id=1)
        for name, acc, with_pl, glist, sizes_list in (
                ("gy", acc_y, False, groups_y, (4, 8, 16, 32, 64)),
                ("gc", acc_c, True, groups_c, (4, 8, 16, 32))):
            for s in sizes_list:
                packed, npad = _pack_sparse(acc.get(s), s, with_pl)
                inp[f"{name}{s}"] = packed
                glist.append((s, npad))
    else:
        gy = _Group()
        gc = _Group()
        _emit_plane_tus(gy, nf.coeff_y, nf.coff_y, sizes, ys, xs, qps,
                        tb, (cbp & 1) != 0)
        _emit_plane_tus(gc, nf.coeff_u, nf.coff_u, sizes // 2, ys // 2,
                        xs // 2, qpc, tbc, (cbp & 2) != 0, plane_id=0)
        _emit_plane_tus(gc, nf.coeff_v, nf.coff_v, sizes // 2, ys // 2,
                        xs // 2, qpc, tbc, (cbp & 4) != 0, plane_id=1)

        # regroup per size for the staged kernels (64-blocks carry
        # their 32x32 low-quadrant slabs but keep tr_log2size == 6,
        # routing them to the replicating 64 stage)
        for grp, name, with_pl, glist, sizes_list in (
                (gy, "gy", False, groups_y, (4, 8, 16, 32, 64)),
                (gc, "gc", True, groups_c, (4, 8, 16, 32))):
            by_size = {}
            for c_, y_, x_, q_, t_, p_ in zip(
                    grp.coeff, grp.ys, grp.xs, grp.qp, grp.tlog2,
                    grp.pl if with_pl else [None] * len(grp.coeff)):
                s = 64 if (len(t_) and t_[0] == 6) else c_.shape[-1]
                e = by_size.setdefault(s, _Group())
                e.coeff.append(c_)
                e.ys.append(y_)
                e.xs.append(x_)
                e.qp.append(q_)
                e.tlog2.append(t_)
                if with_pl:
                    e.pl.append(p_)
            for s in sizes_list:
                e = by_size.get(s, _Group())
                packed, npad = e.pack(s, with_pl)
                inp[f"{name}{s}"] = packed
                glist.append((s, npad))

    # --- intra TU records in decode order ---
    n_iy = n_ic = 0
    im = nf.mode == 1
    ii = np.nonzero(im)[0]
    if len(ii):
        bsz = sizes[ii]
        by, bx = ys[ii], xs[ii]
        imod = nf.intra_mode[ii]
        btb = tb[ii]
        up = _upright_available_v(by, bx, bsz, W)
        dl = _downleft_available_v(by, bx, bsz, H)

        def mk(by, bx, bsz, btb, up, dl, cbx_base):
            counts = np.where(btb, 4, 1)
            offs = np.concatenate([[0], np.cumsum(counts)])[:-1]
            n = int(counts.sum())
            ty = np.zeros(n, np.int32)
            tx = np.zeros(n, np.int32)
            sz = np.zeros(n, np.int32)
            md = np.zeros(n, np.int32)
            tl_ = np.zeros(n, np.int32)
            ll = np.zeros(n, np.int32)
            cbx = np.zeros(n, np.int32)
            ntb = ~btb
            ty[offs[ntb]] = by[ntb]
            tx[offs[ntb]] = bx[ntb]
            sz[offs[ntb]] = bsz[ntb]
            md[offs[ntb]] = imod[ntb]
            tl_[offs[ntb]] = bsz[ntb] + up[ntb]
            ll[offs[ntb]] = bsz[ntb] + dl[ntb]
            cbx[offs[ntb]] = cbx_base[ntb] > 0
            if btb.any():
                o = offs[btb]
                s2 = bsz[btb] // 2
                for k, (qi, qj) in enumerate(((0, 0), (0, 1), (1, 0),
                                              (1, 1))):
                    p = o + k
                    ty[p] = by[btb] + qi * s2
                    tx[p] = bx[btb] + qj * s2
                    sz[p] = s2
                    md[p] = imod[btb]
                    upq = (qj == 0) | ((qi == 0) & up[btb])
                    dlq = (qj == 0) & ((qi == 0) | dl[btb])
                    tl_[p] = s2 + upq
                    ll[p] = s2 + dlq
                    cbx[p] = cbx_base[btb] > 0
            return {"ty": ty, "tx": tx, "size": sz, "mode": md,
                    "toplen": tl_, "leftlen": ll, "cbx_nonzero": cbx}, n

        tuy, n_y = mk(by, bx, bsz, btb, up, dl, bx)
        btbc = btb & (bsz > 8)
        tuc, n_c = mk(by // 2, bx // 2, bsz // 2, btbc, up, dl, bx // 2)
        n_iy, n_ic = n_y, n_c
    else:
        tuy = tuc = None

    def pad_tu(t, n):
        npad = _pow2pad(max(n, 1))
        out = {}
        for k, v in (t or {}).items():
            a = np.full(npad, 4 if k in ("size", "toplen", "leftlen")
                        else 0, np.int32)
            a[:n] = v
            out[k] = a
        if t is None:
            out = {k: np.full(npad, 4 if k in ("size", "toplen", "leftlen")
                              else 0, np.int32)
                   for k in ("ty", "tx", "size", "mode", "toplen",
                             "leftlen", "cbx_nonzero")}
        val = np.zeros(npad, np.int32)
        val[:n] = 1
        out["valid"] = val
        return out, npad

    inp["tuy"], n_iy = pad_tu(tuy, n_iy)
    inp["tuc"], n_ic = pad_tu(tuc, n_ic)

    from .reconstruct_jax import use_pallas_intra
    if (tuy is not None) and use_pallas_intra():
        from ..ops.pallas_intra import (SIZES_C, SIZES_Y,
                                        build_intra_records)
        inp["it_recs_y"], inp["it_cnt_y"] = build_intra_records(
            inp["tuy"], SIZES_Y)
        inp["it_recs_c"], inp["it_cnt_c"] = build_intra_records(
            inp["tuc"], SIZES_C)

    if deblocking:
        # Pack the 9 per-cell side-info planes into ONE uint8 plane
        # before the host->device copy: 9 x [H/4, W/4] int32 is
        # ~4.7 MB/frame at 1080p and the device link (tunnel) is the
        # decode bottleneck. The filter jit unpacks on device.
        from ..ops.jax_kernels import pack_ddp
        inp["ddp"] = pack_ddp(
            {k: dd[k] for k in ("size", "tb_split", "pb_part", "mode",
                                "cbp_y", "mv0x", "mv0y", "mv1x",
                                "mv1y")})
        inp["beta"] = np.int32(BETA_TABLE[fh.qp])
        inp["tc"] = np.int32(TC_TABLE[fh.qp])
        inp["tcC"] = np.int32(TC_TABLE[CHROMA_QP[fh.qp]])

    clpf_any = bool(seq.clpf)
    if clpf_any:
        inp["m8y"], inp["m8u"], inp["m8v"] = _clpf_masks_native(nf, W, H)

    cfg = FrameConfig(
        W=W, H=H, R=R, bipred_filter=int(seq.bipred), has_bi=has_bi,
        deblocking=bool(deblocking), clpf=clpf_any,
        groups_y=tuple(groups_y), groups_c=tuple(groups_c),
        n_intra_y=n_iy, n_intra_c=n_ic, mc_my=mc_my, mc_mc=mc_mc)
    return cfg, inp, slots


def _clpf_masks_native(nf, W, H):
    """Vectorized CLPF application masks from the SoA side-info map."""
    fh = nf.hdr
    dd = nf.dd
    h8, w8 = H // 8, W // 8
    m8 = np.zeros((3, h8, w8), bool)
    if not fh.clpf_frame_enable:
        return m8[0], m8[1], m8[2]
    notbi = dd["mode"][::2, ::2] != 3          # [h8, w8] at 8-px cells
    cy = dd["cbp_y"][::2, ::2] > 0
    cu = dd["cbp_u"][::2, ::2] > 0
    cv = dd["cbp_v"][::2, ::2] > 0
    anyc = notbi & (cy | cu | cv)
    nsb_v, nsb_h = H // 64, W // 64
    full8v, full8h = nsb_v * 8, nsb_h * 8
    cand = anyc[:full8v, :full8h].reshape(nsb_v, 8, nsb_h, 8) \
        .any(axis=(1, 3))
    if fh.clpf_all:
        on = cand
    else:
        bits = nf.clpf_bits.reshape(nsb_v, nsb_h)
        on = cand & (bits == 1)
    on8 = np.zeros((h8, w8), bool)
    on8[:full8v, :full8h] = np.repeat(np.repeat(on, 8, 0), 8, 1)
    m8y = on8 & notbi & cy
    m8u = on8 & notbi & cu
    m8v = on8 & notbi & cv
    return m8y, m8u, m8v
