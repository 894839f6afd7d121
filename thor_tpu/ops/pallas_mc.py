"""Pallas TPU kernel for block-level motion compensation.

The round-1 decode path computed every fractional-phase interpolation of
every reference plane (a 70 MB all-phase conv at 1080p) and then chose
one sample per pixel with a 2M-element XLA gather -- ~60% of the frame
time, because TPU gathers lower to per-element scalar loops regardless
of index locality.

This kernel removes both stages by exploiting the codec's structure:
motion vectors are constant per *prediction unit* (quadtree CBs and
their PB splits, reference enc/encode_block.c PB partitioning and
common/inter_prediction.c:120-180 interpolation), so MC is a per-block
windowed 6-tap filter -- exactly the shape TPUs like:

- grid over TH-row bands of the frame; the band's output tile
  ([TH, Wout] u8) lives in VMEM;
- per-band prediction-unit records (rectangle, ref slot, fractional
  phase, absolute window origin) arrive in SMEM;
- per record, the (TH+T-1, TW+T-1) reference window -- anchored to the
  BAND tile, so every tap slice below has a *static* offset -- is DMA'd
  HBM->VMEM with double buffering (next record's window loads while the
  current one filters);
- the T*T-tap phase-weighted accumulation runs on the VPU as predicated
  shifted MACs over the full (TH, TW) tile; zero-weight taps of the
  record's phase are skipped via pl.when, so an integer-position copy
  costs 1 MAC and a pure-horizontal half-pel 6;
- the result is blended into the band tile under the record's
  rectangle mask (read-modify-write of a lane-aligned (TH, TW)
  window).

Bipred averages two independently filtered windows ((p0+p1)>>1 on the
clipped values, dec/decode_block.c bipred path). All arithmetic is
exact int32; bit-exactness vs ops/jax_kernels.mc_frame is covered by
tests/test_pallas_mc.py (interpret mode) and the golden-stream sha256
check in bench.py on hardware.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Record field indices (int32 SoA packed [nbands, M, NF]).
F_YY = 0      # y0 % TH (row of the PU inside its band)
F_H = 1       # PU height in pixels
F_XOFF = 2    # x0 - xc (column of the PU inside its TW-wide window)
F_W = 3       # PU width
F_XC = 4      # lane-aligned window column (multiple of TW)
F_S0 = 5      # list-0 reference slot
F_P0 = 6      # list-0 fractional phase (vfrac*(2^fb) + hfrac)
F_IY0 = 7     # list-0 window origin row in the anchor-padded ref plane
F_IX0 = 8     # list-0 window origin col
F_BI = 9      # 1 = bipred (average with list 1)
F_S1 = 10
F_P1 = 11
F_IY1 = 12
F_IX1 = 13
F_DY0 = 14    # sub-tile row offset (window origin aligned down to 8)
F_DX0 = 15    # sub-tile col offset (window origin aligned down to 128)
F_DY1 = 16
F_DX1 = 17
NF = 18

# Tile-anchor padding added around the (already codec-padded) ref planes
# so a full band-tile window DMA at any legal PU origin stays in bounds.
ANCHOR_T = 64    # >= band height (tile anchor may sit above the PU row)
ANCHOR_L = 128   # >= window width


def _round_up(x, m):
    return -(-x // m) * m


def _win_dims(T, TH, TW):
    """Aligned DMA window dims: the origin is aligned DOWN to the (8,
    128) u8 tiling (Mosaic requires provably aligned dynamic slices),
    so the window carries up to (7, 127) extra leading rows/cols that
    the in-kernel roll shifts away."""
    return (_round_up(TH + T - 1 + 7, 8), _round_up(TW + T - 1 + 127, 128))


def _mc_band_kernel(cnt_ref, recs_ref, lut_ref, ref_hbm, out_ref,
                    win_ref, roll_ref, acc_ref, p0_ref, sem_ref,
                    *, T, TH, TW):
    """One band: loop PU records, DMA window, filter, blend."""
    WH, WW = _win_dims(T, TH, TW)
    cnt = cnt_ref[pl.program_id(0)]

    def dma(k, li, slot):
        s = recs_ref[0, k, F_S1 if li else F_S0]
        iy = pl.multiple_of(recs_ref[0, k, F_IY1 if li else F_IY0], 8)
        ix = pl.multiple_of(recs_ref[0, k, F_IX1 if li else F_IX0], 128)
        return pltpu.make_async_copy(
            ref_hbm.at[s, pl.ds(iy, WH), pl.ds(ix, WW)],
            win_ref.at[slot, li],
            sem_ref.at[slot, li])

    def start(k, slot):
        dma(k, 0, slot).start()

        @pl.when(recs_ref[0, k, F_BI] == 1)
        def _():
            dma(k, 1, slot).start()

    @pl.when(cnt > 0)
    def _():
        start(0, 0)

    row = lax.broadcasted_iota(jnp.int32, (TH, TW), 0)
    col = lax.broadcasted_iota(jnp.int32, (TH, TW), 1)

    def body(k, _):
        slot = k % 2

        @pl.when(k + 1 < cnt)
        def _():
            start(k + 1, (k + 1) % 2)

        def accumulate(li, phase):
            # un-shift the aligned window so tap slices are static
            dy = recs_ref[0, k, F_DY1 if li else F_DY0]
            dx = recs_ref[0, k, F_DX1 if li else F_DX0]
            # dynamic rotates only support 32-bit lanes
            w32 = win_ref[slot, li].astype(jnp.int32)
            roll_ref[:] = pltpu.roll(
                pltpu.roll(w32, WH - dy, axis=0), WW - dx, axis=1)
            acc_ref[:] = jnp.full((TH, TW), 2048, jnp.int32)
            for t in range(T * T):
                m, n = t // T, t % T
                w = lut_ref[phase, t]

                @pl.when(w != 0)
                def _():
                    acc_ref[:] += w * roll_ref[m:m + TH, n:n + TW]
            return jnp.clip(acc_ref[:] >> 12, 0, 255)

        dma(k, 0, slot).wait()
        p0 = accumulate(0, recs_ref[0, k, F_P0])

        bi = recs_ref[0, k, F_BI]

        @pl.when(bi == 1)
        def _():
            p0_ref[:] = p0
            dma(k, 1, slot).wait()

        p1 = accumulate(1, recs_ref[0, k, F_P1])
        pred = jnp.where(bi == 1, (p0_ref[:] + p1) >> 1, p0)

        yy, h = recs_ref[0, k, F_YY], recs_ref[0, k, F_H]
        xo, w_ = recs_ref[0, k, F_XOFF], recs_ref[0, k, F_W]
        xc = pl.multiple_of(recs_ref[0, k, F_XC], TW)
        mask = ((row >= yy) & (row < yy + h)
                & (col >= xo) & (col < xo + w_))
        old = out_ref[0:TH, pl.ds(xc, TW)]
        out_ref[0:TH, pl.ds(xc, TW)] = jnp.where(
            mask, pred, old.astype(jnp.int32)).astype(jnp.uint8)
        return 0

    lax.fori_loop(0, cnt, body, 0, unroll=False)


@functools.partial(
    jax.jit,
    static_argnames=("T", "TH", "TW", "nbands", "M", "Wout", "interpret"))
def _mc_call(refp, recs, cnt, lut_flat, *, T, TH, TW, nbands, M, Wout,
             interpret):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nbands,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, M, NF), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TH, Wout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 2) + _win_dims(T, TH, TW), jnp.uint8),
            pltpu.VMEM(_win_dims(T, TH, TW), jnp.int32),
            pltpu.VMEM((TH, TW), jnp.int32),
            pltpu.VMEM((TH, TW), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    def kernel(cnt_r, recs_r, lut_r, ref_r, out_r, win_r, roll_r,
               acc_r, p0_r, sem_r):
        _mc_band_kernel(cnt_r, recs_r, lut_r, ref_r, out_r, win_r,
                        roll_r, acc_r, p0_r, sem_r, T=T, TH=TH, TW=TW)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nbands * TH, Wout), jnp.uint8),
        grid_spec=grid_spec,
        interpret=interpret,
    )(cnt, recs, lut_flat, refp)


def mc_frame_pallas(refstack, recs, cnt, lut, H, W, TH, TW,
                    interpret=False):
    """Full-plane MC via the band kernel.

    refstack: [R, Hp, Wp] uint8 codec-padded references; recs/cnt from
    build_mc_records (band-bucketed; window origins already include the
    codec pad and anchor offsets); lut: [P, T, T] int32 phase weights.
    Returns [H, W] int32 prediction in 0..255.
    """
    T = lut.shape[-1]
    recs = jnp.asarray(recs).astype(jnp.int32)  # int16 on the wire
    nbands, M, _ = recs.shape
    Wout = _round_up(W, TW)
    WH, WW = _win_dims(T, TH, TW)
    refp = jnp.pad(
        refstack, ((0, 0), (ANCHOR_T, WH + 16), (ANCHOR_L, WW + 16)))
    lut_flat = jnp.asarray(
        np.asarray(lut).reshape(lut.shape[0], T * T).astype(np.int32))
    out = _mc_call(refp, recs, cnt, lut_flat, T=T, TH=TH, TW=TW,
                   nbands=nbands, M=M, Wout=Wout, interpret=interpret)
    return out[:H, :W].astype(jnp.int32)


# ---------------------------------------------------------------------------
# Host-side record builder
# ---------------------------------------------------------------------------

def build_mc_records(pus, H, W, pad, frac_bits, tap_lo, TH, TW,
                     m_bucket=True):
    """Pack per-prediction-unit params into band-bucketed kernel records.

    pus: dict of equal-length int arrays {y0, x0, h, w, slot0, mvx0,
    mvy0, bi, slot1, mvx1, mvy1} in this plane's pixel coordinates
    (MVs already sign-folded, in units of 1/2^frac_bits pel). Quadtree
    alignment guarantees each PU lies inside one TH-row band and one
    TW-wide lane-aligned window.
    Returns (recs [nbands, M, NF] int32, cnt [nbands] int32).
    """
    y0 = np.asarray(pus["y0"], np.int64)
    x0 = np.asarray(pus["x0"], np.int64)
    h = np.asarray(pus["h"], np.int64)
    w = np.asarray(pus["w"], np.int64)
    n = len(y0)
    nbands = _round_up(H, TH) // TH
    Wout = _round_up(W, TW)
    band = y0 // TH

    def side(sl, mvx, mvy):
        sl = np.asarray(sl, np.int64)
        mvx = np.asarray(mvx, np.int64)
        mvy = np.asarray(mvy, np.int64)
        fm = (1 << frac_bits) - 1
        phase = (mvy & fm) * (fm + 1) + (mvx & fm)
        # Window origin anchored at the band tile's top-left in the
        # anchor-padded plane (for tile pixel (r, c) the kernel reads
        # plane[iy + dy + r + m, ix + dx + c + n]), aligned DOWN to the
        # (8, 128) u8 tiling with the remainder carried as (dy, dx).
        iy = band * TH + (mvy >> frac_bits) + pad + tap_lo + ANCHOR_T
        xc = np.minimum((x0 // TW) * TW, Wout - TW)
        ix = xc + (mvx >> frac_bits) + pad + tap_lo + ANCHOR_L
        iy_al = (iy >> 3) << 3
        ix_al = (ix >> 7) << 7
        return sl, phase, iy_al, ix_al, iy - iy_al, ix - ix_al, xc

    s0, p0, iy0, ix0, dy0, dx0, xc = side(
        pus["slot0"], pus["mvx0"], pus["mvy0"])
    bi = np.asarray(pus.get("bi", np.zeros(n)), np.int64)
    if "slot1" in pus:
        s1, p1, iy1, ix1, dy1, dx1, _ = side(
            pus["slot1"], pus["mvx1"], pus["mvy1"])
    else:
        s1, p1, iy1, ix1, dy1, dx1 = s0, p0, iy0, ix0, dy0, dx0

    rec = np.zeros((n, NF), np.int64)
    rec[:, F_YY] = y0 - band * TH
    rec[:, F_H] = h
    rec[:, F_XOFF] = x0 - xc
    rec[:, F_W] = w
    rec[:, F_XC] = xc
    rec[:, F_S0] = s0
    rec[:, F_P0] = p0
    rec[:, F_IY0] = iy0
    rec[:, F_IX0] = ix0
    rec[:, F_BI] = bi
    rec[:, F_S1] = s1
    rec[:, F_P1] = p1
    rec[:, F_IY1] = iy1
    rec[:, F_IX1] = ix1
    rec[:, F_DY0] = dy0
    rec[:, F_DX0] = dx0
    rec[:, F_DY1] = dy1
    rec[:, F_DX1] = dx1

    counts = (np.bincount(band, minlength=nbands) if n
              else np.zeros(nbands, np.int64))
    M = max(int(counts.max()) if n else 1, 1)
    if m_bucket:
        M = max(8, 1 << (M - 1).bit_length())
    recs = np.zeros((nbands, M, NF), np.int32)
    fill = np.zeros(nbands, np.int64)
    order = np.argsort(band, kind="stable")
    for t in order:
        b = band[t]
        recs[b, fill[b]] = rec[t]
        fill[b] += 1
    return recs, counts.astype(np.int32)
