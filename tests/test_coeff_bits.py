"""Exact device coefficient-rate kernel vs the host write_coeff oracle
(enc/write_bits.c:110-253): bit counts must match exactly for every
(size, intra, chroma) combination."""

import numpy as np
import pytest

from thor_tpu.bitstream.writer import BitWriter
from thor_tpu.enc.syntax import write_coeff
from thor_tpu.ops.coeff_bits import coeff_bits_batch


@pytest.mark.parametrize("size", [4, 8, 16, 32, 64])
@pytest.mark.parametrize("intra", [0, 1])
@pytest.mark.parametrize("chroma", [0, 1])
def test_coeff_bits_exact(size, intra, chroma):
    rng = np.random.default_rng(size * 4 + intra * 2 + chroma)
    qs = min(size, 16)
    blocks = []
    for _ in range(100):
        b = np.zeros((size, size), np.int16)
        k = rng.integers(1, 24)
        ys = rng.integers(0, qs, k)
        xs = rng.integers(0, qs, k)
        b[ys, xs] = rng.choice(
            [-60, -9, -4, -3, -2, -1, 1, 2, 3, 4, 9, 60], k)
        if not b[:qs, :qs].any():
            b[0, 0] = 1
        blocks.append(b)
    # dense and single-coeff edge cases
    dense = rng.integers(-5, 6, (size, size)).astype(np.int16)
    if not dense[:qs, :qs].any():
        dense[0, 0] = 1
    blocks.append(dense)
    for v in (1, -1, 2, -2):
        b = np.zeros((size, size), np.int16)
        b[0, 0] = v
        blocks.append(b)
    blocks = np.stack(blocks)

    got = np.asarray(coeff_bits_batch(blocks, size, bool(intra),
                                      bool(chroma)))
    for i, b in enumerate(blocks):
        w = BitWriter()
        write_coeff(w, b, size, (intra << 1) | chroma)
        assert w.get_bit_pos() == got[i], (size, intra, chroma, i)
