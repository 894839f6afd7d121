"""Golden-bitstream decode tests: bit-exact YUV parity vs reference Thordec.

Streams were produced by the reference Thorenc from the 15 shipped configs
(testdata/regen.sh); the golden YUVs are reference Thordec output. This is
the reference's own operational oracle (enc -rf output == Thordec output,
SURVEY.md §4) turned into a pytest.
"""

import numpy as np
import pytest

from .conftest import TESTDATA

STREAMS = [
    "intra_only",
    "LDB_low_complexity",
    "LDB_medium_complexity",
    "LDB_high_efficiency",
    "RA_low_complexity",
    "RA16_high_efficiency",
    "HDB16_medium_complexity",
]


def _decode_concat(path, backend="numpy"):
    from thor_tpu.dec.decoder import decode_file
    frames = decode_file(str(path), backend=backend)
    return np.concatenate(
        [np.concatenate([y.ravel(), u.ravel(), v.ravel()])
         for (y, u, v) in frames])


@pytest.mark.parametrize("name", STREAMS)
def test_bit_exact_decode(name):
    got = _decode_concat(TESTDATA / f"{name}.bit")
    golden = np.fromfile(TESTDATA / f"{name}_dec.yuv", np.uint8)
    assert got.shape == golden.shape
    mismatch = int((got != golden).sum())
    assert mismatch == 0, f"{name}: {mismatch} mismatching bytes"


def test_python_parse_fallback_parity():
    """The pure-Python parser (fallback when no C compiler is available)
    must agree with the native entropy layer."""
    from thor_tpu.dec.decoder import decode_file
    a = decode_file(str(TESTDATA / "RA_low_complexity.bit"), parse="python")
    b = decode_file(str(TESTDATA / "RA_low_complexity.bit"), parse="native")
    for (ya, ua, va), (yb, ub, vb) in zip(a, b):
        assert np.array_equal(ya, yb)
        assert np.array_equal(ua, ub)
        assert np.array_equal(va, vb)
