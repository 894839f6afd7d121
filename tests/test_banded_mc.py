"""Banded in-window MC (ops/banded_mc.py) vs the all-phase conv +
per-pixel gather reference (mc_phase_conv + mc_gather_from_phases):
bit-exact for block-constant MV fields, luma and chroma, multi-ref."""

import numpy as np
import pytest
import jax.numpy as jnp

from thor_tpu.ops import jax_kernels as JK
from thor_tpu.ops.banded_mc import (mc_pred_banded, M_LUMA, M_CHROMA)

PAD = JK.PAD_Y
PAD_C = JK.PAD_C


def _blocks(plane, b, HB, WB):
    return plane[:HB * b, :WB * b].reshape(HB, b, WB, b) \
        .transpose(0, 2, 1, 3)


@pytest.mark.parametrize("s,seq_bipred", [(8, 0), (16, 1), (32, 0)])
def test_luma_parity(s, seq_bipred):
    rng = np.random.default_rng(5 + s)
    H, W, R = 64, 96, 2
    HB, WB = H // s, W // s
    refs = rng.integers(0, 256, (R, H + 2 * PAD, W + 2 * PAD), np.uint8)
    lut = JK.build_luma_mc_lut(seq_bipred)
    phases = JK.mc_phase_conv(jnp.asarray(refs), jnp.asarray(lut), PAD)

    mvy = rng.integers(-163, 164, (HB, WB)).astype(np.int32)
    mvx = rng.integers(-163, 164, (HB, WB)).astype(np.int32)
    slot = rng.integers(0, R, (HB, WB)).astype(np.int32)
    # force some exact-phase cases
    mvy[0, 0] = 0; mvx[0, 0] = 0
    if WB > 1:
        mvy[0, 1] = 2; mvx[0, 1] = 2      # funny position
        mvy[-1, -1] = -6; mvx[-1, -1] = 4

    cpb = s // 4
    mvyc = np.repeat(np.repeat(mvy, cpb, 0), cpb, 1)
    mvxc = np.repeat(np.repeat(mvx, cpb, 0), cpb, 1)
    slc = np.repeat(np.repeat(slot, cpb, 0), cpb, 1)
    want = np.asarray(JK.mc_gather_from_phases(
        phases, jnp.asarray(mvxc), jnp.asarray(mvyc), jnp.asarray(slc),
        PAD, 2, 4, H, W, -2))
    got = np.asarray(mc_pred_banded(
        jnp.asarray(refs), jnp.asarray(slot), jnp.asarray(mvy),
        jnp.asarray(mvx), lut, PAD, 2, s, -2, M_LUMA))
    assert np.array_equal(got, _blocks(want, s, HB, WB))


def test_chroma_parity():
    rng = np.random.default_rng(77)
    Hc, Wc, R = 48, 64, 3
    sc = 8
    HB, WB = Hc // sc, Wc // sc
    refs = rng.integers(0, 256, (R, Hc + 2 * PAD_C, Wc + 2 * PAD_C),
                        np.uint8)
    lut = JK.build_chroma_mc_lut()
    phases = JK.mc_phase_conv(jnp.asarray(refs), jnp.asarray(lut), PAD_C)
    mvy = rng.integers(-163, 164, (HB, WB)).astype(np.int32)
    mvx = rng.integers(-163, 164, (HB, WB)).astype(np.int32)
    slot = rng.integers(0, R, (HB, WB)).astype(np.int32)
    cpb = sc // 2
    want = np.asarray(JK.mc_gather_from_phases(
        phases, jnp.asarray(np.repeat(np.repeat(mvx, cpb, 0), cpb, 1)),
        jnp.asarray(np.repeat(np.repeat(mvy, cpb, 0), cpb, 1)),
        jnp.asarray(np.repeat(np.repeat(slot, cpb, 0), cpb, 1)),
        PAD_C, 3, 2, Hc, Wc, -1))
    got = np.asarray(mc_pred_banded(
        jnp.asarray(refs), jnp.asarray(slot), jnp.asarray(mvy),
        jnp.asarray(mvx), lut, PAD_C, 3, sc, -1, M_CHROMA))
    assert np.array_equal(got, _blocks(want, sc, HB, WB))
