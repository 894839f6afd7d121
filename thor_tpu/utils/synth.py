"""Synthetic frame-input builder for benchmarks and compile checks.

Produces a (FrameConfig, inputs) pair for the device reconstruction
program with statistically plausible coding density (MV field, residual
TU counts, CLPF coverage) without needing a parsed bitstream. Used by
bench.py and __graft_entry__.py.
"""

from __future__ import annotations

import numpy as np

from ..codec.constants import BETA_TABLE, CHROMA_QP, TC_TABLE, GDEQUANT_TABLE
from ..dec.reconstruct_jax import FrameConfig


def _dq(qp, tsize):
    from ..codec.constants import log2i
    factor = int(GDEQUANT_TABLE[qp % 6]) << (qp // 6)
    rshift = log2i(tsize) - 1
    return factor, 1 << (rshift - 1), rshift


def _tu_group(rng, positions, s, qp, nnz=6, chroma=False):
    n = len(positions)
    coeff = np.zeros((n, s, s), np.int16)
    qs = min(s, 16)
    for i in range(n):
        k = rng.randint(1, nnz + 1)
        ys = rng.randint(0, max(qs // 2, 1), k)
        xs = rng.randint(0, max(qs // 2, 1), k)
        coeff[i, ys, xs] = rng.randint(-30, 31, k).astype(np.int16)
    f, a, sh = _dq(qp, s)
    g = {
        'coeff': coeff,
        'y': np.array([p[0] for p in positions], np.int32),
        'x': np.array([p[1] for p in positions], np.int32),
        'f': np.full(n, f, np.int32),
        'a': np.full(n, a, np.int32),
        'sh': np.full(n, sh, np.int32),
    }
    if chroma:
        g['pl'] = rng.randint(0, 2, n).astype(np.int32)
    return g


def _dummy_intra(npad=16):
    z = lambda fill: np.full(npad, fill, np.int32)
    return {'ty': z(0), 'tx': z(0), 'size': z(4), 'mode': z(0),
            'toplen': z(4), 'leftlen': z(4), 'cbx_nonzero': z(0),
            'valid': z(0)}


def build_synthetic_frame(W, H, R=2, qp=32, seed=7, coded_fraction=0.25):
    """Synthetic inter frame at (W, H) with R references."""
    rng = np.random.RandomState(seed)
    gh, gw = H // 4, W // 4
    inp = {}

    inp['refY'] = rng.randint(0, 256, (R, H + 192, W + 192)).astype(np.uint8)
    inp['refU'] = rng.randint(0, 256, (R, H // 2 + 96, W // 2 + 96)).astype(np.uint8)
    inp['refV'] = rng.randint(0, 256, (R, H // 2 + 96, W // 2 + 96)).astype(np.uint8)

    # Cell-granular MV field: mostly small MVs, block-coherent at 16x16
    cgh, cgw = -(-H // 16), -(-W // 16)
    mvx16 = rng.randint(-64, 65, (cgh, cgw)).astype(np.int32)
    mvy16 = rng.randint(-64, 65, (cgh, cgw)).astype(np.int32)
    inp['mv0x'] = np.repeat(np.repeat(mvx16, 4, 0), 4, 1)[:gh, :gw]
    inp['mv0y'] = np.repeat(np.repeat(mvy16, 4, 0), 4, 1)[:gh, :gw]
    inp['mv1x'] = np.zeros((gh, gw), np.int32)
    inp['mv1y'] = np.zeros((gh, gw), np.int32)
    inp['slot0'] = np.repeat(np.repeat(
        rng.randint(0, R, (cgh, cgw)), 4, 0), 4, 1)[:gh, :gw].astype(np.int32)
    inp['slot1'] = np.zeros((gh, gw), np.int32)
    inp['use_bi'] = np.zeros((gh, gw), bool)

    # Residual TUs on a 16-aligned grid, split across sizes 4/8/16
    cells = [(r * 16, c * 16) for r in range(H // 16) for c in range(W // 16)]
    rng.shuffle(cells)
    ncoded = int(len(cells) * coded_fraction)
    coded = cells[:ncoded]
    n16 = ncoded // 2
    n8 = ncoded // 4
    n4 = ncoded - n16 - n8
    qpc = int(CHROMA_QP[qp])
    inp['gy16'] = _tu_group(rng, coded[:n16], 16, qp)
    inp['gy8'] = _tu_group(rng, coded[n16:n16 + n8], 8, qp)
    inp['gy4'] = _tu_group(rng, coded[n16 + n8:], 4, qp)
    ccoded = [(y // 2, x // 2) for (y, x) in coded]
    inp['gc8'] = _tu_group(rng, ccoded[:n16], 8, qpc, chroma=True)
    inp['gc4'] = _tu_group(rng, ccoded[n16:], 4, qpc, chroma=True)

    inp['tuy'] = _dummy_intra()
    inp['tuc'] = _dummy_intra()

    # Side-info map for deblocking
    dd = {}
    dd['size'] = np.full((gh, gw), 16, np.int32)
    dd['tb_split'] = np.zeros((gh, gw), np.int32)
    dd['pb_part'] = np.zeros((gh, gw), np.int32)
    dd['mode'] = np.full((gh, gw), 2, np.int32)
    cbp16 = (rng.rand(cgh, cgw) < coded_fraction).astype(np.int32)
    dd['cbp_y'] = np.repeat(np.repeat(cbp16, 4, 0), 4, 1)[:gh, :gw]
    dd['mv0x'] = inp['mv0x']
    dd['mv0y'] = inp['mv0y']
    dd['mv1x'] = inp['mv1x']
    dd['mv1y'] = inp['mv1y']
    from ..ops.jax_kernels import pack_ddp
    inp['ddp'] = pack_ddp(dd)
    inp['beta'] = np.int32(BETA_TABLE[qp])
    inp['tc'] = np.int32(TC_TABLE[qp])
    inp['tcC'] = np.int32(TC_TABLE[qpc])

    inp['m8y'] = (rng.rand(H // 8, W // 8) < 0.3)
    inp['m8u'] = (rng.rand(H // 8, W // 8) < 0.15)
    inp['m8v'] = (rng.rand(H // 8, W // 8) < 0.15)

    cfg = FrameConfig(
        W=W, H=H, R=R, bipred_filter=0, has_bi=False, deblocking=True,
        clpf=True,
        groups_y=((4, n4), (8, n8), (16, n16)),
        groups_c=((4, ncoded - n16), (8, n16)),
        n_intra_y=16, n_intra_c=16)
    return cfg, inp
