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


def test_bit_exact_decode_ra16_long():
    """33-frame RA16 stream: two full dyadic sub-GOPs with frame
    reorder (the committed 10-frame goldens are below one sub-GOP).
    Golden is the SHA-256 of the reference Thordec output
    (testdata/gen_input_long.py; the 5 MB YUV itself is not
    committed)."""
    import hashlib
    got = _decode_concat(TESTDATA / "RA16_long.bit")
    want = (TESTDATA / "RA16_long_dec.sha256").read_text().split()[0]
    assert hashlib.sha256(got.tobytes()).hexdigest() == want


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


def test_checkpoint_resume_mid_stream(tmp_path):
    """Decode 5 frames, checkpoint, resume in a fresh Decoder, finish:
    output must match a straight decode."""
    from thor_tpu.bitstream.reader import BitReader, iter_frames
    from thor_tpu.dec.decoder import Decoder, decode_file
    from thor_tpu.dec.parse import SequenceHeader
    from thor_tpu.dec.reconstruct_np import RefFrame
    from thor_tpu.utils.checkpoint import (load_decoder_state,
                                           save_decoder_state)

    path = TESTDATA / "LDB_medium_complexity.bit"
    golden = decode_file(str(path))

    payloads = list(iter_frames(str(path)))
    dec = Decoder()
    out = []
    for i, p in enumerate(payloads[:5]):
        br = BitReader(p)
        if i == 0:
            dec.seq = SequenceHeader.read(br)
            dec.refs = [RefFrame(np.zeros((288, 352), np.uint8),
                                 np.zeros((144, 176), np.uint8),
                                 np.zeros((144, 176), np.uint8), 0)
                        for _ in range(33)]
        y, u, v, _ = dec.decode_frame(br)
        out.append((y, u, v))
    ckpt = tmp_path / "state.npz"
    save_decoder_state(dec, str(ckpt))

    dec2 = Decoder()
    dec2.refs = [None] * 33
    load_decoder_state(dec2, str(ckpt))
    for p in payloads[5:]:
        y, u, v, _ = dec2.decode_frame(BitReader(p))
        out.append((y, u, v))

    # LDB: coding order == display order
    for (ya, ua, va), (yb, ub, vb) in zip(out, golden):
        assert np.array_equal(ya, yb)
        assert np.array_equal(ua, ub)
        assert np.array_equal(va, vb)
