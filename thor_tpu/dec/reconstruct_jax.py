"""Device-side frame reconstruction: parse output -> parameter planes ->
one jitted XLA program per frame shape class.

Host work here is limited to flattening the parsed syntax into SoA
tensors (cell-granular MC parameters straight from the deblock-data map,
size-grouped transform-unit batches, intra TU records in decode order).
All pixel math runs on device in thor_tpu.ops.jax_kernels; outputs are
bit-exact against the NumPy oracle path (dec/reconstruct_np.py) and thus
against reference Thordec.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..codec.constants import (
    CHROMA_QP, BETA_TABLE, TC_TABLE, GDEQUANT_TABLE, MODE_BIPRED,
    MODE_INTRA, log2i)
from ..codec.blockdata import (get_downleft_available, get_upright_available)
from ..ops import jax_kernels as JK
from .parse import FrameSyntax


class FrameConfig(NamedTuple):
    """Static (shape-determining) per-frame configuration for jit."""
    W: int
    H: int
    R: int                      # number of reference slots (0 = intra frame)
    bipred_filter: int          # sequence-level filter-set selector
    has_bi: bool                # any bipred cells this frame
    deblocking: bool
    clpf: bool
    groups_y: Tuple[Tuple[int, int], ...]   # ((size, padded_count), ...)
    groups_c: Tuple[Tuple[int, int], ...]
    n_intra_y: int              # padded intra TU counts (0 = skip stage)
    n_intra_c: int
    mc_my: int = 0              # PU-record bucket sizes for the Pallas
    mc_mc: int = 0              # MC kernel (0 = use the gather path)


def _pow2pad(n: int) -> int:
    """Coarse (power-of-4) count bucketing so compiled frame programs are
    reused across frames; padded entries are masked no-ops."""
    p = 16
    while p < n:
        p *= 4
    return p


def _dq_params(qp: int, tsize: int):
    factor = int(GDEQUANT_TABLE[qp % 6]) << (qp // 6)
    rshift = log2i(tsize) - 1
    return factor, 1 << (rshift - 1), rshift


class _GroupAcc:
    """Accumulates TU entries of one transform size."""

    def __init__(self, size):
        self.size = size
        self.coeff, self.ys, self.xs = [], [], []
        self.f, self.a, self.sh, self.pl = [], [], [], []

    def add(self, coeff, y, x, qp, tsize, plane=0):
        self.coeff.append(coeff)
        self.ys.append(y)
        self.xs.append(x)
        f, a, sh = _dq_params(qp, tsize)
        self.f.append(f)
        self.a.append(a)
        self.sh.append(sh)
        self.pl.append(plane)

    def pack(self, with_plane):
        n = len(self.coeff)
        npad = _pow2pad(max(n, 1))
        s = 32 if self.size == 64 else self.size
        coeff = np.zeros((npad, s, s), np.int16)
        for i, c in enumerate(self.coeff):
            coeff[i] = c
        out = {
            'coeff': coeff,
            'y': _padi(self.ys, npad), 'x': _padi(self.xs, npad),
            'f': _padi(self.f, npad, fill=1),
            'a': _padi(self.a, npad), 'sh': _padi(self.sh, npad, fill=1),
        }
        if with_plane:
            out['pl'] = _padi(self.pl, npad)
        return out, npad


def _padi(lst, n, fill=0):
    a = np.full(n, fill, np.int32)
    a[:len(lst)] = lst
    return a


def _emit_tus(fs: FrameSyntax, W, H):
    """Flatten all transform units (luma + chroma) into size groups, and
    intra TUs (prediction records) in decode order."""
    gy = {s: _GroupAcc(s) for s in (4, 8, 16, 32, 64)}
    gc = {s: _GroupAcc(s) for s in (4, 8, 16, 32)}
    ity = {k: [] for k in ('ty', 'tx', 'size', 'mode', 'toplen', 'leftlen',
                           'cbx_nonzero')}
    itc = {k: [] for k in ity}

    def emit_resid(grp, coeff, size, y, x, qp, tb, plane=0):
        if tb:
            s2 = size // 2
            for i in (0, 1):
                for j in (0, 1):
                    sub = coeff[i * s2:(i + 1) * s2, j * s2:(j + 1) * s2]
                    if sub.any():
                        grp[s2].add(sub, y + i * s2, x + j * s2, qp, s2,
                                    plane)
        else:
            if coeff.any():
                if size == 64:
                    grp[64].add(coeff[:32, :32], y, x, qp, 64, plane)
                else:
                    grp[size].add(coeff, y, x, qp, size, plane)

    def emit_intra(rec_d, y, x, size, up_av, dl_av, tb, cbx):
        if tb:
            s2 = size // 2
            for i in (0, s2):
                for j in (0, s2):
                    up = (j == 0) or (i == 0 and up_av)
                    dl = (j == 0) and (i == 0 or dl_av)
                    rec_d['ty'].append(y + i)
                    rec_d['tx'].append(x + j)
                    rec_d['size'].append(s2)
                    rec_d['toplen'].append(s2 + (1 if up else 0))
                    rec_d['leftlen'].append(s2 + (1 if dl else 0))
                    rec_d['cbx_nonzero'].append(1 if cbx > 0 else 0)
        else:
            rec_d['ty'].append(y)
            rec_d['tx'].append(x)
            rec_d['size'].append(size)
            rec_d['toplen'].append(size + (1 if up_av else 0))
            rec_d['leftlen'].append(size + (1 if dl_av else 0))
            rec_d['cbx_nonzero'].append(1 if cbx > 0 else 0)

    for b in fs.blocks:
        size, sizeC = b.size, b.size // 2
        qpY = b.qp
        qpC = int(CHROMA_QP[qpY])
        oyC, oxC = b.ypos // 2, b.xpos // 2
        tb = bool(b.tb_split)
        tbc = tb and size > 8
        if b.coeff_y is not None:
            emit_resid(gy, b.coeff_y, size, b.ypos, b.xpos, qpY, tb)
            emit_resid(gc, b.coeff_u, sizeC, oyC, oxC, qpC, tbc, plane=0)
            emit_resid(gc, b.coeff_v, sizeC, oyC, oxC, qpC, tbc, plane=1)
        if b.mode == MODE_INTRA:
            up_av = get_upright_available(b.ypos, b.xpos, size, W)
            dl_av = get_downleft_available(b.ypos, b.xpos, size, H)
            nmodes_y = len(ity['ty'])
            emit_intra(ity, b.ypos, b.xpos, size, up_av, dl_av, tb, b.xpos)
            emit_intra(itc, oyC, oxC, sizeC, up_av, dl_av, tbc, oxC)
            for _ in range(len(ity['ty']) - nmodes_y):
                ity['mode'].append(b.intra_mode)
            while len(itc['mode']) < len(itc['ty']):
                itc['mode'].append(b.intra_mode)

    return gy, gc, ity, itc


def _pack_intra(rec_d):
    n = len(rec_d['ty'])
    npad = _pow2pad(max(n, 1))
    out = {k: _padi(v, npad, fill=(4 if k in ('size', 'toplen', 'leftlen')
                                   else 0))
           for k, v in rec_d.items()}
    out['valid'] = _padi([1] * n, npad)
    return out, npad


def _clpf_masks(fs: FrameSyntax, W, H):
    """Host-side per-8x8-cell CLPF application masks (the candidate rule +
    signalled per-SB bits, common/common_frame.c:485-557)."""
    dd = fs.deblock_data
    m8y = np.zeros((H // 8, W // 8), bool)
    m8u = np.zeros((H // 8, W // 8), bool)
    m8v = np.zeros((H // 8, W // 8), bool)
    if not fs.clpf_frame_enable:
        return m8y, m8u, m8v
    nsb_v, nsb_h = H // 64, W // 64
    notbi = dd.mode != MODE_BIPRED
    anycbp = (dd.cbp_y > 0) | (dd.cbp_u > 0) | (dd.cbp_v > 0)
    for k in range(nsb_v):
        for l in range(nsb_h):
            cells = np.s_[k * 16:k * 16 + 16:2, l * 16:l * 16 + 16:2]
            cand = bool((notbi[cells] & anycbp[cells]).any())
            if not cand:
                continue
            on = bool(fs.clpf_all) or (fs.clpf_bits is not None
                                       and fs.clpf_bits[k, l] == 1)
            if not on:
                continue
            c8 = np.s_[k * 8:k * 8 + 8, l * 8:l * 8 + 8]
            nb = notbi[k * 16:k * 16 + 16:2, l * 16:l * 16 + 16:2]
            m8y[c8] = nb & (dd.cbp_y[cells] > 0)
            m8u[c8] = nb & (dd.cbp_u[cells] > 0)
            m8v[c8] = nb & (dd.cbp_v[cells] > 0)
    return m8y, m8u, m8v


def build_frame_inputs(fs: FrameSyntax, refs, interp_frame, W, H, seq,
                       deblocking):
    dd = fs.deblock_data
    inp = {}

    R = fs.num_ref
    if R > 0:
        # Pad the reference stack to the sequence-wide maximum so the
        # compiled frame program is shared across frames with growing
        # reference lists; padded slots are never indexed (slots clip
        # to the real count).
        Rpad = seq.max_num_ref + (1 if seq.interp_ref else 0)
        Rpad = max(Rpad, R)
        planes = []
        for r in fs.ref_array:
            planes.append(refs[r] if r >= 0 else interp_frame)
        while len(planes) < Rpad:
            planes.append(planes[0])
        inp['refY'] = np.stack([p.y for p in planes])
        inp['refU'] = np.stack([p.u for p in planes])
        inp['refV'] = np.stack([p.v for p in planes])

        fnum = np.array([p.frame_num for p in planes], np.int64)
        cur = fs.display_frame_num
        slot0 = np.clip(dd.ref_idx0, 0, R - 1).astype(np.int32)
        slot1 = np.clip(dd.ref_idx1, 0, R - 1).astype(np.int32)
        bi = dd.bipred_flag == 2
        sign0 = np.where(bi, fnum[slot0] >= cur, fnum[slot0] > cur)
        sign1 = fnum[slot1] >= cur
        inp['mv0x'] = np.where(sign0, -dd.mv0x, dd.mv0x).astype(np.int32)
        inp['mv0y'] = np.where(sign0, -dd.mv0y, dd.mv0y).astype(np.int32)
        inp['mv1x'] = np.where(sign1, -dd.mv1x, dd.mv1x).astype(np.int32)
        inp['mv1y'] = np.where(sign1, -dd.mv1y, dd.mv1y).astype(np.int32)
        inp['slot0'] = slot0
        inp['slot1'] = slot1
        inp['use_bi'] = bi
        R = Rpad
    has_bi = R > 1 and bool(seq.bipred)

    gy, gc, ity, itc = _emit_tus(fs, W, H)
    groups_y, groups_c = [], []
    for s, acc in gy.items():
        packed, npad = acc.pack(with_plane=False)
        inp[f'gy{s}'] = packed
        groups_y.append((s, npad))
    for s, acc in gc.items():
        packed, npad = acc.pack(with_plane=True)
        inp[f'gc{s}'] = packed
        groups_c.append((s, npad))

    inp['tuy'], n_iy = _pack_intra(ity)
    inp['tuc'], n_ic = _pack_intra(itc)

    if deblocking:
        inp['ddp'] = JK.pack_ddp({k: getattr(dd, k) for k in
                                  ('size', 'tb_split', 'pb_part',
                                   'mode', 'cbp_y', 'mv0x', 'mv0y',
                                   'mv1x', 'mv1y')})
        inp['beta'] = np.int32(BETA_TABLE[fs.qp])
        inp['tc'] = np.int32(TC_TABLE[fs.qp])
        inp['tcC'] = np.int32(TC_TABLE[CHROMA_QP[fs.qp]])

    clpf_any = bool(seq.clpf)
    if clpf_any:
        inp['m8y'], inp['m8u'], inp['m8v'] = _clpf_masks(fs, W, H)

    cfg = FrameConfig(
        W=W, H=H, R=R, bipred_filter=int(seq.bipred), has_bi=has_bi,
        deblocking=bool(deblocking), clpf=clpf_any,
        groups_y=tuple(groups_y), groups_c=tuple(groups_c),
        n_intra_y=n_iy, n_intra_c=n_ic)
    return cfg, inp


def _pad_for_scan(plane):
    return jnp.pad(plane, ((JK.PADI, JK.PADE), (JK.PADI, JK.PADE)))


def _frame_fn(cfg: FrameConfig, inp):
    W, H = cfg.W, cfg.H
    Wc, Hc = W // 2, H // 2

    # --- residual planes (batched dequant + iDCT + scatter) ---
    ry = jnp.zeros((H, W), jnp.int32)
    rc = jnp.zeros((2, Hc, Wc), jnp.int32)
    for s, _ in cfg.groups_y:
        g = inp[f'gy{s}']
        vals = JK.residual_group(g['coeff'], g['f'], g['a'], g['sh'],
                                 32 if s == 64 else s)
        if s == 64:
            vals = jnp.repeat(jnp.repeat(vals, 2, axis=1), 2, axis=2)
        ry = JK.scatter_tu(ry, vals, g['y'], g['x'])
    for s, _ in cfg.groups_c:
        g = inp[f'gc{s}']
        vals = JK.residual_group(g['coeff'], g['f'], g['a'], g['sh'], s)
        rc = JK.scatter_tu_c(rc, vals, g['y'], g['x'], g['pl'])

    # --- inter prediction + residual add ---
    if cfg.R > 0:
        lutY = JK.build_luma_mc_lut(cfg.bipred_filter)
        lutC = JK.build_chroma_mc_lut()
        mvargs = (inp['mv0x'], inp['mv0y'], inp['mv1x'], inp['mv1y'],
                  inp['slot0'], inp['slot1'], inp['use_bi'])
        py = JK.mc_frame(inp['refY'], *mvargs, lutY, JK.PAD_Y, 2, 4,
                         H, W, -2, cfg.has_bi)
        pu = JK.mc_frame(inp['refU'], *mvargs, lutC, JK.PAD_C, 3, 2,
                         Hc, Wc, -1, cfg.has_bi)
        pv = JK.mc_frame(inp['refV'], *mvargs, lutC, JK.PAD_C, 3, 2,
                         Hc, Wc, -1, cfg.has_bi)
        y = JK.clip255(py + ry)
        u = JK.clip255(pu + rc[0])
        v = JK.clip255(pv + rc[1])
    else:
        y = jnp.zeros((H, W), jnp.int32)
        u = jnp.zeros((Hc, Wc), jnp.int32)
        v = jnp.zeros((Hc, Wc), jnp.int32)

    # --- intra TU scan (decode order) ---
    if cfg.n_intra_y:
        P = _pad_for_scan(y)[None]
        Rp = _pad_for_scan(ry)[None]
        P = JK.intra_scan(P, Rp, inp['tuy'])
        y = P[0, JK.PADI:JK.PADI + H, JK.PADI:JK.PADI + W]
    if cfg.n_intra_c:
        P = jnp.stack([_pad_for_scan(u), _pad_for_scan(v)])
        Rp = jnp.stack([_pad_for_scan(rc[0]), _pad_for_scan(rc[1])])
        P = JK.intra_scan(P, Rp, inp['tuc'])
        u = P[0, JK.PADI:JK.PADI + Hc, JK.PADI:JK.PADI + Wc]
        v = P[1, JK.PADI:JK.PADI + Hc, JK.PADI:JK.PADI + Wc]

    # --- in-loop filters ---
    if cfg.deblocking:
        dd = JK.unpack_ddp(inp['ddp'])
        y = JK.deblock_luma(y, dd, H, W, inp['beta'], inp['tc'])
        u = JK.deblock_chroma(u, dd, H, W, inp['tcC'])
        v = JK.deblock_chroma(v, dd, H, W, inp['tcC'])
    if cfg.clpf:
        y = JK.clpf_plane(y, inp['m8y'], 64, H, W)
        u = JK.clpf_plane(u, inp['m8u'], 32, Hc, Wc)
        v = JK.clpf_plane(v, inp['m8v'], 32, Hc, Wc)

    return y.astype(jnp.uint8), u.astype(jnp.uint8), v.astype(jnp.uint8)


@lru_cache(maxsize=64)
def _jitted(cfg: FrameConfig):
    return jax.jit(lambda inp: _frame_fn(cfg, inp))


# --- stage-wise jitted execution -------------------------------------------
# Each pipeline stage is jitted separately (keyed by its own static
# shape class), so a change in one TU-count bucket recompiles only that
# stage instead of the whole frame program; intermediates stay on
# device between stages.

def _resid_y_body(s, ry, coeff, fac, add, sh, ys, xs):
    vals = JK.residual_group(coeff, fac, add, sh, 32 if s == 64 else s)
    if s == 64:
        vals = jnp.repeat(jnp.repeat(vals, 2, axis=1), 2, axis=2)
    return JK.scatter_tu(ry, vals, ys, xs)


def _resid_c_body(s, rc, coeff, fac, add, sh, ys, xs, pl):
    vals = JK.residual_group(coeff, fac, add, sh, s)
    return JK.scatter_tu_c(rc, vals, ys, xs, pl)


@lru_cache(maxsize=None)
def _jit_resid_y(s: int):
    def f(ry, coeff, fac, add, sh, ys, xs):
        return _resid_y_body(s, ry, coeff, fac, add, sh, ys, xs)
    return jax.jit(f, donate_argnums=0)


@lru_cache(maxsize=None)
def _jit_resid_c(s: int):
    def f(rc, coeff, fac, add, sh, ys, xs, pl):
        return _resid_c_body(s, rc, coeff, fac, add, sh, ys, xs, pl)
    return jax.jit(f, donate_argnums=0)


@lru_cache(maxsize=None)
def _jit_mc(H: int, W: int, bipred_filter: int, has_bi: bool):
    lutY = JK.build_luma_mc_lut(bipred_filter)
    lutC = JK.build_chroma_mc_lut()

    def f(refY, refU, refV, mv0x, mv0y, mv1x, mv1y, slot0, slot1,
          use_bi, ry, rc):
        mvargs = (mv0x, mv0y, mv1x, mv1y, slot0, slot1, use_bi)
        py = JK.mc_frame(refY, *mvargs, lutY, JK.PAD_Y, 2, 4, H, W, -2,
                         has_bi)
        pu = JK.mc_frame(refU, *mvargs, lutC, JK.PAD_C, 3, 2, H // 2,
                         W // 2, -1, has_bi)
        pv = JK.mc_frame(refV, *mvargs, lutC, JK.PAD_C, 3, 2, H // 2,
                         W // 2, -1, has_bi)
        return (JK.clip255(py + ry), JK.clip255(pu + rc[0]),
                JK.clip255(pv + rc[1]))
    return jax.jit(f)


def use_pallas_mc() -> bool:
    """Pallas block-MC on real TPUs; gather path elsewhere. Override
    with THOR_PALLAS_MC=1/0 (1 off-TPU implies interpret mode)."""
    import os
    v = os.environ.get("THOR_PALLAS_MC")
    if v is not None:
        return v not in ("0", "")
    return jax.default_backend() == "tpu"


@lru_cache(maxsize=None)
def _jit_mc_pallas(H: int, W: int, bipred_filter: int, My: int, Mc: int,
                   interpret: bool):
    from ..ops import pallas_mc as PM
    lutY = JK.build_luma_mc_lut(bipred_filter)
    lutC = JK.build_chroma_mc_lut()
    Hc, Wc = H // 2, W // 2

    def f(refY, refU, refV, recs_y, cnt_y, recs_c, cnt_c, ry, rc):
        py = PM.mc_frame_pallas(refY, recs_y, cnt_y, lutY, H, W,
                                64, 128, interpret)
        pu = PM.mc_frame_pallas(refU, recs_c, cnt_c, lutC, Hc, Wc,
                                32, 128, interpret)
        pv = PM.mc_frame_pallas(refV, recs_c, cnt_c, lutC, Hc, Wc,
                                32, 128, interpret)
        return (JK.clip255(py + ry), JK.clip255(pu + rc[0]),
                JK.clip255(pv + rc[1]))
    return jax.jit(f)


def use_pallas_intra() -> bool:
    """Pallas whole-scan intra kernel on real TPUs; XLA wavefront
    elsewhere. Override with THOR_PALLAS_INTRA=1/0 (1 off-TPU implies
    interpret mode)."""
    import os
    v = os.environ.get("THOR_PALLAS_INTRA")
    if v is not None:
        return v not in ("0", "")
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        # Backend init failure (e.g. unreachable TPU tunnel) must never
        # propagate out of a capability query; callers fall back to the
        # XLA wavefront path, which runs on whatever backend jax can
        # still bring up (round-2 postmortem: BENCH_r02 rc=1).
        return False


@lru_cache(maxsize=None)
def _jit_intra_pallas(H: int, W: int, C: int, nchunks: int, K: int,
                      luma: bool, interpret: bool):
    from ..ops import pallas_intra as PI
    SIZES = PI.SIZES_Y if luma else PI.SIZES_C

    def f(planes, resid, recs, cnt):
        return PI.intra_scan_pallas(planes, resid, recs, cnt, SIZES,
                                    interpret=interpret)
    return jax.jit(f)


@lru_cache(maxsize=None)
def _jit_intra_y(H: int, W: int):
    def f(y, ry, waves):
        P = _pad_for_scan(y)[None]
        Rp = _pad_for_scan(ry)[None]
        P = JK.intra_wavefront(P, Rp, waves)
        return P[0, JK.PADI:JK.PADI + H, JK.PADI:JK.PADI + W]
    return jax.jit(f)


@lru_cache(maxsize=None)
def _jit_intra_c(H: int, W: int):
    Hc, Wc = H // 2, W // 2

    def f(u, v, rc, waves):
        P = jnp.stack([_pad_for_scan(u), _pad_for_scan(v)])
        Rp = jnp.stack([_pad_for_scan(rc[0]), _pad_for_scan(rc[1])])
        P = JK.intra_wavefront(P, Rp, waves)
        return (P[0, JK.PADI:JK.PADI + Hc, JK.PADI:JK.PADI + Wc],
                P[1, JK.PADI:JK.PADI + Hc, JK.PADI:JK.PADI + Wc])
    return jax.jit(f)


def _filters_body(H, W, deblocking, clpf, y, u, v, ddp, beta, tc, tcC,
                  m8y, m8u, m8v):
    if deblocking:
        dd = JK.unpack_ddp(ddp)
        y = JK.deblock_luma(y, dd, H, W, beta, tc)
        u = JK.deblock_chroma(u, dd, H, W, tcC)
        v = JK.deblock_chroma(v, dd, H, W, tcC)
    if clpf:
        y = JK.clpf_plane(y, m8y, 64, H, W)
        u = JK.clpf_plane(u, m8u, 32, H // 2, W // 2)
        v = JK.clpf_plane(v, m8v, 32, H // 2, W // 2)
    return (y.astype(jnp.uint8), u.astype(jnp.uint8),
            v.astype(jnp.uint8))


@lru_cache(maxsize=None)
def _jit_filters(H: int, W: int, deblocking: bool, clpf: bool):
    def f(y, u, v, dd, beta, tc, tcC, m8y, m8u, m8v):
        return _filters_body(H, W, deblocking, clpf, y, u, v, dd, beta,
                             tc, tcC, m8y, m8u, m8v)
    return jax.jit(f, donate_argnums=(0, 1, 2))


def _staged_frame(cfg: FrameConfig, inp):
    H, W = cfg.H, cfg.W
    Hc, Wc = H // 2, W // 2
    ry = jnp.zeros((H, W), jnp.int32)
    rc = jnp.zeros((2, Hc, Wc), jnp.int32)
    for s, _ in cfg.groups_y:
        g = inp[f'gy{s}']
        ry = _jit_resid_y(s)(ry, g['coeff'], g['f'], g['a'], g['sh'],
                             g['y'], g['x'])
    for s, _ in cfg.groups_c:
        g = inp[f'gc{s}']
        rc = _jit_resid_c(s)(rc, g['coeff'], g['f'], g['a'], g['sh'],
                             g['y'], g['x'], g['pl'])
    if cfg.R > 0 and cfg.mc_my > 0 and 'mc_recs_y' in inp:
        y, u, v = _jit_mc_pallas(
            H, W, cfg.bipred_filter, cfg.mc_my, cfg.mc_mc,
            jax.default_backend() != 'tpu')(
            inp['refY'], inp['refU'], inp['refV'], inp['mc_recs_y'],
            inp['mc_cnt_y'], inp['mc_recs_c'], inp['mc_cnt_c'], ry, rc)
    elif cfg.R > 0:
        y, u, v = _jit_mc(H, W, cfg.bipred_filter, cfg.has_bi)(
            inp['refY'], inp['refU'], inp['refV'], inp['mv0x'],
            inp['mv0y'], inp['mv1x'], inp['mv1y'], inp['slot0'],
            inp['slot1'], inp['use_bi'], ry, rc)
    else:
        y = jnp.zeros((H, W), jnp.int32)
        u = jnp.zeros((Hc, Wc), jnp.int32)
        v = jnp.zeros((Hc, Wc), jnp.int32)
    pi_interp = jax.default_backend() != 'tpu'
    if cfg.n_intra_y:
        if 'it_recs_y' in inp:
            recs, cnt = inp['it_recs_y'], inp['it_cnt_y']
            y = _jit_intra_pallas(H, W, 1, recs.shape[0], recs.shape[1],
                                  True, pi_interp)(
                y[None], ry[None], recs, cnt)[0]
        else:
            y = _jit_intra_y(H, W)(y, ry,
                                   JK.schedule_wavefront(inp['tuy']))
    if cfg.n_intra_c:
        if 'it_recs_c' in inp:
            recs, cnt = inp['it_recs_c'], inp['it_cnt_c']
            uv = _jit_intra_pallas(H // 2, W // 2, 2, recs.shape[0],
                                   recs.shape[1], False, pi_interp)(
                jnp.stack([u, v]), rc, recs, cnt)
            u, v = uv[0], uv[1]
        else:
            u, v = _jit_intra_c(H, W)(u, v, rc,
                                      JK.schedule_wavefront(inp['tuc']))
    zero = np.int32(0)
    zmask = np.zeros((1, 1), bool)
    zddp = np.zeros((1, 1), np.uint8)
    y, u, v = _jit_filters(H, W, cfg.deblocking, cfg.clpf)(
        y, u, v, inp.get('ddp', zddp), inp.get('beta', zero),
        inp.get('tc', zero), inp.get('tcC', zero),
        inp.get('m8y', zmask), inp.get('m8u', zmask),
        inp.get('m8v', zmask))
    return y, u, v, None


def use_fused() -> bool:
    """One jitted program per frame signature instead of ~12 stage
    dispatches. Every stage dispatch through a tunneled chip pays RPC
    latency, so fusing is the production default; THOR_FUSED=0 falls
    back to the stage-wise path (whose per-stage shape-class sharing
    keeps compile counts lower - useful off-TPU and for bisecting)."""
    import os
    return os.environ.get("THOR_FUSED", "1") not in ("0", "")


@lru_cache(maxsize=256)
def _jit_fused(cfg: FrameConfig, pmc: bool, pit_y: bool, pit_c: bool,
               interpret: bool):
    """The whole frame program of _staged_frame as ONE jitted function
    (stage bodies are shared with the stage-wise path). jax.jit keys on
    the input pytree's shapes, so one cache entry per cfg covers every
    TU-count bucket combination."""
    H, W = cfg.H, cfg.W
    Hc, Wc = H // 2, W // 2
    if cfg.R > 0:
        lutY = JK.build_luma_mc_lut(cfg.bipred_filter)
        lutC = JK.build_chroma_mc_lut()

    def f(inp):
        ry = jnp.zeros((H, W), jnp.int32)
        rc = jnp.zeros((2, Hc, Wc), jnp.int32)

        def densify(g, cs):
            # Sparse (linear idx, value) -> dense [N, cs, cs] coeff
            # bank. The coeff banks dominate the per-frame h2d volume
            # (a bucket-padded dense bank is MBs; the stream's nonzero
            # coefficients are ~KBs), and the h2d link is the decode
            # bottleneck. Padding entries carry val=0 at idx=0, and
            # scatter-add keeps them no-ops even when a real
            # coefficient lives at linear index 0.
            N = g['f'].shape[0]
            flat = jnp.zeros((N * cs * cs,), jnp.int32)
            flat = flat.at[g['cidx']].add(g['cval'])
            return flat.reshape(N, cs, cs).astype(jnp.int16)

        for s, _ in cfg.groups_y:
            g = inp[f'gy{s}']
            coeff = densify(g, 32 if s == 64 else s)
            ry = _resid_y_body(s, ry, coeff, g['f'], g['a'],
                               g['sh'], g['y'], g['x'])
        for s, _ in cfg.groups_c:
            g = inp[f'gc{s}']
            rc = _resid_c_body(s, rc, densify(g, s), g['f'], g['a'],
                               g['sh'], g['y'], g['x'], g['pl'])
        if cfg.R > 0:
            # stack the reference planes in-jit ('refYs' tuple variant:
            # no separate stack dispatch outside the program)
            refY = (jnp.stack(inp['refYs']) if 'refYs' in inp
                    else inp['refY'])
            refU = (jnp.stack(inp['refUs']) if 'refUs' in inp
                    else inp['refU'])
            refV = (jnp.stack(inp['refVs']) if 'refVs' in inp
                    else inp['refV'])
        if cfg.R > 0 and pmc:
            from ..ops import pallas_mc as PM
            py = PM.mc_frame_pallas(refY, inp['mc_recs_y'],
                                    inp['mc_cnt_y'], lutY, H, W,
                                    64, 128, interpret)
            pu = PM.mc_frame_pallas(refU, inp['mc_recs_c'],
                                    inp['mc_cnt_c'], lutC, Hc, Wc,
                                    32, 128, interpret)
            pv = PM.mc_frame_pallas(refV, inp['mc_recs_c'],
                                    inp['mc_cnt_c'], lutC, Hc, Wc,
                                    32, 128, interpret)
            y = JK.clip255(py + ry)
            u = JK.clip255(pu + rc[0])
            v = JK.clip255(pv + rc[1])
        elif cfg.R > 0:
            mvargs = (inp['mv0x'], inp['mv0y'], inp['mv1x'],
                      inp['mv1y'], inp['slot0'], inp['slot1'],
                      inp['use_bi'])
            py = JK.mc_frame(refY, *mvargs, lutY, JK.PAD_Y, 2, 4,
                             H, W, -2, cfg.has_bi)
            pu = JK.mc_frame(refU, *mvargs, lutC, JK.PAD_C, 3, 2,
                             Hc, Wc, -1, cfg.has_bi)
            pv = JK.mc_frame(refV, *mvargs, lutC, JK.PAD_C, 3, 2,
                             Hc, Wc, -1, cfg.has_bi)
            y = JK.clip255(py + ry)
            u = JK.clip255(pu + rc[0])
            v = JK.clip255(pv + rc[1])
        else:
            y = jnp.zeros((H, W), jnp.int32)
            u = jnp.zeros((Hc, Wc), jnp.int32)
            v = jnp.zeros((Hc, Wc), jnp.int32)
        if cfg.n_intra_y:
            if pit_y:
                from ..ops import pallas_intra as PI
                y = PI.intra_scan_pallas(
                    y[None], ry[None], inp['it_recs_y'],
                    inp['it_cnt_y'], PI.SIZES_Y, interpret=interpret)[0]
            else:
                P = _pad_for_scan(y)[None]
                Rp = _pad_for_scan(ry)[None]
                P = JK.intra_wavefront(P, Rp, inp['waves_y'])
                y = P[0, JK.PADI:JK.PADI + H, JK.PADI:JK.PADI + W]
        if cfg.n_intra_c:
            if pit_c:
                from ..ops import pallas_intra as PI
                uv = PI.intra_scan_pallas(
                    jnp.stack([u, v]), rc, inp['it_recs_c'],
                    inp['it_cnt_c'], PI.SIZES_C, interpret=interpret)
                u, v = uv[0], uv[1]
            else:
                P = jnp.stack([_pad_for_scan(u), _pad_for_scan(v)])
                Rp = jnp.stack([_pad_for_scan(rc[0]),
                                _pad_for_scan(rc[1])])
                P = JK.intra_wavefront(P, Rp, inp['waves_c'])
                u = P[0, JK.PADI:JK.PADI + Hc, JK.PADI:JK.PADI + Wc]
                v = P[1, JK.PADI:JK.PADI + Hc, JK.PADI:JK.PADI + Wc]
        zero = np.int32(0)
        zmask = np.zeros((1, 1), bool)
        zddp = np.zeros((1, 1), np.uint8)
        yy, uu, vv = _filters_body(
            H, W, cfg.deblocking, cfg.clpf, y, u, v,
            inp.get('ddp', zddp), inp.get('beta', zero),
            inp.get('tc', zero), inp.get('tcC', zero),
            inp.get('m8y', zmask), inp.get('m8u', zmask),
            inp.get('m8v', zmask))
        # One packed [3H/2, W] uint8 plane for the device->host fetch:
        # the tunnel link pays ~80 ms RTT per blocking transfer, so
        # three per-plane fetches cost ~2x one packed fetch.
        packed = jnp.concatenate(
            [yy, jnp.concatenate([uu, vv], axis=1)], axis=0)
        # reference planes come out codec-padded (the decoder keeps
        # them device-resident), saving the per-frame edge-pad
        # dispatch chain
        return (jnp.pad(yy, 96, mode='edge'),
                jnp.pad(uu, 48, mode='edge'),
                jnp.pad(vv, 48, mode='edge'), packed)

    return jax.jit(f)


def _sparse_group(g):
    """Host-side sparsification of a TU group's dense coeff bank into
    (cidx, cval) int32 pairs, bucket-padded (pow2, min 64) to bound the
    jit signature count. The device twin is densify() in _jit_fused."""
    c = np.asarray(g['coeff'])
    flat = c.reshape(-1)
    nz = np.flatnonzero(flat)
    K = max(64, 1 << int(np.ceil(np.log2(max(1, len(nz))))))
    cidx = np.zeros(K, np.int32)
    cval = np.zeros(K, np.int32)
    cidx[:len(nz)] = nz
    cval[:len(nz)] = flat[nz]
    out = {k: v for k, v in g.items() if k != 'coeff'}
    out['cidx'] = cidx
    out['cval'] = cval
    return out


def _fused_frame(cfg: FrameConfig, inp):
    """Dispatch the whole frame as one device program (see use_fused).
    Only the keys the traced program reads are passed, so unused
    side-channel arrays are never copied to the device."""
    pmc = cfg.R > 0 and cfg.mc_my > 0 and 'mc_recs_y' in inp
    pit_y = bool(cfg.n_intra_y) and 'it_recs_y' in inp
    pit_c = bool(cfg.n_intra_c) and 'it_recs_c' in inp
    interpret = jax.default_backend() != 'tpu'
    used = {}
    for s, _ in cfg.groups_y:
        g = inp[f'gy{s}']
        used[f'gy{s}'] = g if 'cidx' in g else _sparse_group(g)
    for s, _ in cfg.groups_c:
        g = inp[f'gc{s}']
        used[f'gc{s}'] = g if 'cidx' in g else _sparse_group(g)
    keys = []
    if cfg.R > 0:
        for k in ('refYs', 'refUs', 'refVs') \
                if 'refYs' in inp else ('refY', 'refU', 'refV'):
            used[k] = inp[k]
        if pmc:
            keys += ['mc_recs_y', 'mc_cnt_y', 'mc_recs_c', 'mc_cnt_c']
        else:
            keys += ['mv0x', 'mv0y', 'mv1x', 'mv1y', 'slot0', 'slot1',
                     'use_bi']
    if cfg.n_intra_y:
        if pit_y:
            keys += ['it_recs_y', 'it_cnt_y']
        else:
            used['waves_y'] = JK.schedule_wavefront(inp['tuy'])
    if cfg.n_intra_c:
        if pit_c:
            keys += ['it_recs_c', 'it_cnt_c']
        else:
            used['waves_c'] = JK.schedule_wavefront(inp['tuc'])
    keys += [k for k in ('ddp', 'beta', 'tc', 'tcC', 'm8y', 'm8u', 'm8v')
             if k in inp]
    used.update({k: inp[k] for k in keys})
    return _jit_fused(cfg, pmc, pit_y, pit_c, interpret)(used)


def _run_frame(cfg: FrameConfig, inp):
    return _fused_frame(cfg, inp) if use_fused() \
        else _staged_frame(cfg, inp)


def reconstruct_frame_jax(decoder, fs: FrameSyntax, refs, interp_frame,
                          W, H, seq_bipred, deblocking):
    cfg, inp = build_frame_inputs(fs, refs, interp_frame, W, H,
                                  decoder.seq, deblocking)
    y, u, v, packed = _run_frame(cfg, inp)
    if packed is not None:
        h = np.asarray(packed)
        return h[:H], h[H:, :W // 2], h[H:, W // 2:]
    return np.asarray(y), np.asarray(u), np.asarray(v)
