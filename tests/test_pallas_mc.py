"""Bit-exactness of the Pallas block-MC kernel vs the proven gather MC.

Random quadtree-like PU tilings with random MVs/slots/bipred flags are
run through both ops/pallas_mc.mc_frame_pallas (interpret mode) and
ops/jax_kernels.mc_frame (the gather path proven bit-exact against
reference Thordec on the golden streams in round 1).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from thor_tpu.ops import jax_kernels as JK
from thor_tpu.ops.pallas_mc import build_mc_records, mc_frame_pallas


def _random_tiling(rng, H, W, min_s=4, max_s=64):
    """Random aligned power-of-2 tiling of the frame."""
    pus = []

    def split(y, x, s):
        if s > min_s and (s > max_s or y + s > H or x + s > W
                          or rng.random() < 0.5):
            h = s // 2
            for dy in (0, h):
                for dx in (0, h):
                    if y + dy < H and x + dx < W:
                        split(y + dy, x + dx, h)
        else:
            pus.append((y, x, min(s, H - y), min(s, W - x)))

    for y in range(0, H, max_s):
        for x in range(0, W, max_s):
            split(y, x, max_s)
    return pus


def _gen(rng, H, W, R, pad, frac_bits, has_bi):
    mv_int = pad - 8
    tiles = _random_tiling(rng, H, W)
    n = len(tiles)
    pus = {
        "y0": np.array([t[0] for t in tiles]),
        "x0": np.array([t[1] for t in tiles]),
        "h": np.array([t[2] for t in tiles]),
        "w": np.array([t[3] for t in tiles]),
        "slot0": rng.integers(0, R, n),
        "mvx0": rng.integers(-mv_int << frac_bits,
                             (mv_int << frac_bits) + 1, n),
        "mvy0": rng.integers(-mv_int << frac_bits,
                             (mv_int << frac_bits) + 1, n),
        "bi": (rng.integers(0, 2, n) if has_bi else np.zeros(n, int)),
        "slot1": rng.integers(0, R, n),
        "mvx1": rng.integers(-mv_int << frac_bits,
                             (mv_int << frac_bits) + 1, n),
        "mvy1": rng.integers(-mv_int << frac_bits,
                             (mv_int << frac_bits) + 1, n),
    }
    return pus


def _cells_from_pus(pus, H, W, cs):
    HC, WC = H // cs, W // cs
    cell = {k: np.zeros((HC, WC), np.int32) for k in
            ("mv0x", "mv0y", "mv1x", "mv1y", "slot0", "slot1", "bi")}
    for i in range(len(pus["y0"])):
        r = np.s_[pus["y0"][i] // cs:(pus["y0"][i] + pus["h"][i]) // cs,
                  pus["x0"][i] // cs:(pus["x0"][i] + pus["w"][i]) // cs]
        cell["mv0x"][r] = pus["mvx0"][i]
        cell["mv0y"][r] = pus["mvy0"][i]
        cell["mv1x"][r] = pus["mvx1"][i]
        cell["mv1y"][r] = pus["mvy1"][i]
        cell["slot0"][r] = pus["slot0"][i]
        cell["slot1"][r] = pus["slot1"][i]
        cell["bi"][r] = pus["bi"][i]
    return cell


@pytest.mark.parametrize("plane,seed", [
    ("luma", 0), ("chroma", 0),
    pytest.param("luma", 1, marks=pytest.mark.slow),
    pytest.param("chroma", 1, marks=pytest.mark.slow)])
def test_pallas_mc_matches_gather(plane, seed):
    rng = np.random.default_rng(seed)
    R = 2
    if plane == "luma":
        H, W, pad, fb, tap_lo, cs, TH, TW = 128, 192, 96, 2, -2, 4, 64, 128
        lut = JK.build_luma_mc_lut(seq_bipred=1)
    else:
        H, W, pad, fb, tap_lo, cs, TH, TW = 64, 96, 48, 3, -1, 2, 32, 128
        lut = JK.build_chroma_mc_lut()

    refstack = rng.integers(0, 256, (R, H + 2 * pad, W + 2 * pad),
                            dtype=np.uint8)
    pus = _gen(rng, H, W, R, pad, fb, has_bi=True)
    if plane == "chroma":
        # chroma PU geometry is halved luma geometry: max 32, min 2
        tiles = _random_tiling(rng, H, W, min_s=2, max_s=32)
        n = len(tiles)
        for i, key in enumerate(("y0", "x0", "h", "w")):
            pus[key] = np.array([t[i] for t in tiles])
        for key in ("slot0", "slot1"):
            pus[key] = rng.integers(0, R, n)
        mv_int = pad - 8
        for key in ("mvx0", "mvy0", "mvx1", "mvy1"):
            pus[key] = rng.integers(-mv_int << fb, (mv_int << fb) + 1, n)
        pus["bi"] = rng.integers(0, 2, n)

    cell = _cells_from_pus(pus, H, W, cs)
    ref = jnp.asarray(refstack)
    want = np.asarray(JK.mc_frame(
        ref, jnp.asarray(cell["mv0x"]), jnp.asarray(cell["mv0y"]),
        jnp.asarray(cell["mv1x"]), jnp.asarray(cell["mv1y"]),
        jnp.asarray(cell["slot0"]), jnp.asarray(cell["slot1"]),
        jnp.asarray(cell["bi"]), lut, pad, fb, cs, H, W, tap_lo,
        has_bi=True))

    recs, cnt = build_mc_records(pus, H, W, pad=pad, frac_bits=fb,
                                 tap_lo=tap_lo, TH=TH, TW=TW)
    got = np.asarray(mc_frame_pallas(
        ref, jnp.asarray(recs), jnp.asarray(cnt), lut, H, W, TH, TW,
        interpret=True))

    assert (got == want).all(), \
        f"mismatch at {np.argwhere(got != want)[:5]}"
