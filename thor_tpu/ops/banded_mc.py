"""Block-constant motion compensation as banded in-window
interpolation - the encoder-side replacement for the all-phase conv +
per-pixel gather pair (mc_phase_conv + mc_gather_from_phases).

The round-4 trial/final stages materialized every fractional-phase
interpolation of every reference (a ~85 MB conv at 1080p x 2 refs) and
selected one sample per pixel with whole-frame flat gathers - measured
at ~8-30 ns/element on TPU, ~0.6-0.8 s of the 1.15 s device-encode
frame (xplane, round 5). This module removes both stages for the
per-BLOCK-constant MV fields the encoder works with:

 1. gather per-block full-pel windows of (b + T - 1)^2 straight from
    the padded reference planes with the banded roll gather
    (ops/windowed.py - rolls and selects only, no gathers);
 2. select each block's combined 2-D tap matrix from the [P, T, T]
    phase LUT with P masked selects (no gather);
 3. accumulate the T*T taps as f32 multiply-adds over the banded
    window tensor (exact: every partial sum is an integer < 2^24,
    identical math to mc_phase_conv), then floor((acc + 2048)/4096)
    and clip.

Bit-exactness vs the phases path is covered by
tests/test_banded_mc.py; reference semantics:
common/inter_prediction.c:120-180 via the combined LUTs of
ops/jax_kernels.build_luma_mc_lut / build_chroma_mc_lut.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .windowed import _banded_segments, _banded_apply

#: full-pel origin-offset bounds (device ME emits |mv| <= 163 qpel;
#: luma iv = (mv >> 2) + tap_lo in [-43, 38]; chroma at 1/8-pel
#: in [-22, 19]). The gathers clamp to the bound defensively - by
#: construction no measured variant exceeds it.
M_LUMA = 44
M_CHROMA = 24


def mc_pred_banded(refpads, slot, mvy, mvx, lut, pad: int,
                   frac_bits: int, b: int, tap_lo: int, M: int):
    """[HB, WB, b, b] int32 prediction (0..255) for per-block constant
    visual-domain MVs.

    refpads: [R, Hp, Wp] uint8 codec-padded reference planes.
    slot, mvy, mvx: [HB, WB] int32 (mv sign-folded, in units of
      1/2^frac_bits pel of THIS plane's geometry).
    lut: [P, T, T] static numpy combined tap weights.
    """
    lut = np.asarray(lut)
    P, T, _ = lut.shape
    HB, WB = mvy.shape
    fm = (1 << frac_bits) - 1
    phase = (mvy & fm) * (fm + 1) + (mvx & fm)
    ivy = jnp.clip((mvy >> frac_bits) + tap_lo, -M, M)
    ivx = jnp.clip((mvx >> frac_bits) + tap_lo, -M, M)
    w = b + T - 1

    R = refpads.shape[0]
    if R == 1:
        B = _banded_segments(refpads[0], HB, WB, pad, pad, b, w, M)
    else:
        B = _banded_segments(refpads[0], HB, WB, pad, pad, b, w, M)
        for r in range(1, R):
            Br = _banded_segments(refpads[r], HB, WB, pad, pad, b, w, M)
            B = jnp.where((slot == r)[:, None, :, None], Br, B)
    win = _banded_apply(B, ivy, ivx, w, M).astype(jnp.float32)

    # per-block tap matrix via masked selects over the P phases
    lsel = jnp.zeros((HB, WB, T * T), jnp.float32)
    lutf = lut.reshape(P, T * T).astype(np.float32)
    for p in range(P):
        if not lut[p].any():
            continue
        lsel = jnp.where((phase == p)[:, :, None],
                         jnp.asarray(lutf[p])[None, None, :], lsel)

    acc = jnp.zeros((HB, WB, b, b), jnp.float32)
    for t in range(T * T):
        m, n = t // T, t % T
        if not lut[:, m, n].any():
            continue
        acc = acc + lsel[:, :, t, None, None] \
            * win[:, :, m:m + b, n:n + b]
    v = jnp.floor((acc + 2048.0) / 4096.0)
    return jnp.clip(v, 0.0, 255.0).astype(jnp.int32)
