"""Gather-free per-block windowed extraction (banded roll-doubling).

The encoder's ME stages need, per block, a small reference window at a
block-dependent (MV-shifted) origin. The natural XLA forms all lose on
TPU (measured, ROADMAP round-4): a vmapped ``dynamic_slice`` lowers to
a per-block sequential while-loop (~1.7 us/block -> ~0.8 s/frame at
1080p), narrow-tile gathers waste the 128 lanes, and whole-frame
gathers run ~13 ns/element.

This module expresses the same windowed gather with ZERO gathers and
ZERO per-block loops, as a fully parallel tensor program:

1. band the frame into block rows and stack one reference *strip* per
   band (static slices - the strip covers every legal window origin of
   that band's blocks, so its height is ``2*M + w`` for MV range
   ``+-M``);
2. separate blocks into their own axis: an im2col of ``2*M + w``-wide
   per-block segments at block stride (static strided slices). After
   this, every remaining shift is constant per (band, block) - i.e.
   constant along BOTH the row and the in-segment column axis;
3. *shift-doubling*: for each bit of the per-block shift,
   conditionally ``jnp.roll`` along the target axis under a
   per-(band, block) mask. Because the shift never varies along the
   rolled axis, the composition is exact: after ``log2(2M)`` passes
   each block's segment holds its MV-shifted window. (Rolling with the
   mask varying ALONG the rolled axis would be wrong - rolled-in data
   carries a different block's partial shift - which is why step 2
   must come first.)
4. bits are applied high to low with the segment narrowed after each
   pass (remaining shift < 2^bit needs only ``w + 2^bit - 1`` lanes),
   so the expanded tensor shrinks geometrically.

Every pass is elementwise over the banded tensor (VPU work at memory
bandwidth, u8 end-to-end); nothing lowers to a serial loop. This is
the encode-side answer to the same disease the decode path solved with
Pallas MC (ops/pallas_mc.py), chosen over a Pallas kernel because the
shift ranges here are MV-bounded and known per stage, which keeps the
banded tensors small enough that the XLA form is bandwidth-bound.

Reference behavior being replaced: the per-block windowed SAD loops of
enc/encode_block.c:830-1016 via enc/enc_kernels.c:32-490.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _bits_for(maxshift: int) -> int:
    """Number of doubling passes to realize shifts in [0, maxshift]."""
    return max(1, int(maxshift).bit_length())


def _roll_axis(B, shift, axis, w: int, maxshift: int):
    """Per-(band, block) gather along ``axis`` of [HB, Hs, WB, C] by
    shift-doubling. shift: [HB, WB] in [0, maxshift] - constant along
    the rolled axis, so the bitwise composition is exact. Bits apply
    high to low, narrowing the axis to ``w + 2^bit - 1`` after each
    pass; returns the axis sliced to its first ``w`` entries."""
    from jax import lax
    m4 = shift[:, None, :, None]
    for bit in reversed(range(_bits_for(maxshift))):
        m = ((m4 >> bit) & 1) == 1
        B = jnp.where(m, jnp.roll(B, -(1 << bit), axis=axis), B)
        keep = min(B.shape[axis], w + (1 << bit) - 1)
        if keep < B.shape[axis]:
            B = lax.slice_in_dim(B, 0, keep, axis=axis)
    if B.shape[axis] > w:
        B = lax.slice_in_dim(B, 0, w, axis=axis)
    return B


def _banded_segments(plane, HB: int, WB: int, base_y: int, base_x: int,
                     bstep: int, w: int, M: int):
    """Stage 1 of the banded gather: per-band strips + block-axis
    im2col. Returns [HB, Hs, WB, wX] with
    B[t, y, k, c] = plane[base_y + t*bstep - M + y,
                          base_x + k*bstep - M + c]."""
    Hp, Wp = plane.shape
    Hs = 2 * M + w
    wX = 2 * M + w
    anchors = base_y + np.arange(HB) * bstep - M
    cbase = base_x - M
    assert anchors.min() >= 0 and cbase >= 0, "window support above plane"
    pad_b = max(0, int(anchors.max()) + Hs - Hp)
    pad_r = max(0, cbase + (WB - 1) * bstep + wX - Wp)
    if pad_b or pad_r:
        plane = jnp.pad(plane, ((0, pad_b), (0, pad_r)))

    S = jnp.stack([plane[int(a):int(a) + Hs] for a in anchors])
    nseg = -(-wX // bstep)
    pieces = [S[:, :, cbase + j * bstep:cbase + (j + WB) * bstep]
              .reshape(HB, Hs, WB, bstep) for j in range(nseg)]
    return jnp.concatenate(pieces, axis=3)[:, :, :, :wX]


def _banded_apply(B, dy, dx, w: int, M: int):
    """Stage 2: per-block shifts + window slice -> [HB, WB, w, w]."""
    B = _roll_axis(B, dx + M, 3, w, 2 * M)
    B = _roll_axis(B, dy + M, 1, w, 2 * M)
    return B.transpose(0, 2, 1, 3)


def banded_windows(plane, dy, dx, base_y: int, base_x: int, bstep: int,
                   w: int, M: int):
    """Per-block [w, w] windows of ``plane`` at origins
    ``(base_y + t*bstep + dy[t,k], base_x + k*bstep + dx[t,k])``.

    plane: [Hp, Wp] (any integer dtype; u8 recommended).
    dy, dx: [HB, WB] int32 origin offsets, ``|dy|, |dx| <= M``.
    bstep: block grid stride; w: window side; M: static offset bound.

    Returns [HB, WB, w, w] windows, same dtype as ``plane``.
    """
    HB, WB = dy.shape
    B = _banded_segments(plane, HB, WB, base_y, base_x, bstep, w, M)
    return _banded_apply(B, dy, dx, w, M)


def banded_windows_stack(planes, slot, dy, dx, base_y: int, base_x: int,
                         bstep: int, w: int, M: int):
    """banded_windows over a [R, Hp, Wp] plane stack with a per-block
    plane choice ``slot`` [HB, WB] - the per-ref segment tensors are
    merged with selects before the (shared) shift passes."""
    R = planes.shape[0]
    HB, WB = dy.shape
    B = _banded_segments(planes[0], HB, WB, base_y, base_x, bstep, w, M)
    for r in range(1, R):
        Br = _banded_segments(planes[r], HB, WB, base_y, base_x, bstep,
                              w, M)
        B = jnp.where((slot == r)[:, None, :, None], Br, B)
    return _banded_apply(B, dy, dx, w, M)
