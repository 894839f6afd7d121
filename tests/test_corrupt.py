"""Failure injection: corrupt and truncated bitstreams must raise a
controlled error (CorruptStream / ValueError), never hang or crash the
process (SURVEY.md §5 failure detection; the reference decoder relies
on flushed buffers + CHECK macros, dec/maindec.c).

Both parsers are probed: the Python mirror (dec/parse.py) and the
native C entropy layer (native/thor_entropy.c) with its bounds-checked
BitReader and bounded VLC loops.
"""

import os

import numpy as np
import pytest

TD = os.path.join(os.path.dirname(__file__), "..", "testdata")
GOLD = os.path.join(TD, "LDB_medium_complexity.bit")

ACCEPTABLE = object()  # sentinel: decode may also just succeed


def _try_decode(path, parse):
    """Decode; returns 'ok' or the controlled-exception class name.

    Anything else (segfault would kill the process; an uncontrolled
    Python exception propagates) fails the test.
    """
    from thor_tpu.bitstream.reader import CorruptStream
    from thor_tpu.dec.decoder import decode_file

    try:
        decode_file(path, backend="numpy", parse=parse)
        return "ok"
    except CorruptStream:
        return "CorruptStream"
    except (ValueError, IndexError, EOFError) as e:
        return type(e).__name__


@pytest.fixture(scope="module")
def golden_bytes():
    with open(GOLD, "rb") as f:
        return f.read()


@pytest.mark.parametrize("parse", ["python", "native"])
@pytest.mark.parametrize("cut", [0.1, 0.45, 0.8, 0.99])
def test_truncated_stream(tmp_path, golden_bytes, parse, cut):
    p = tmp_path / f"trunc_{cut}.bit"
    p.write_bytes(golden_bytes[: int(len(golden_bytes) * cut)])
    _try_decode(str(p), parse)  # must terminate without a crash


@pytest.mark.parametrize("parse", ["python", "native"])
def test_bitflips(tmp_path, golden_bytes, parse):
    rng = np.random.default_rng(1234)
    data = bytearray(golden_bytes)
    # flip one bit in 24 different payload positions (past the 4-byte
    # framing + sequence header so the frame syntax itself is hit)
    n_runs = 12 if parse == "python" else 24
    for t in range(n_runs):
        pos = int(rng.integers(32, len(data)))
        bit = int(rng.integers(0, 8))
        corrupted = bytearray(data)
        corrupted[pos] ^= 1 << bit
        p = tmp_path / f"flip_{t}.bit"
        p.write_bytes(bytes(corrupted))
        _try_decode(str(p), parse)  # must terminate without a crash


@pytest.mark.parametrize("parse", ["python", "native"])
def test_garbage_stream(tmp_path, parse):
    rng = np.random.default_rng(7)
    p = tmp_path / "garbage.bit"
    p.write_bytes(rng.integers(0, 256, 4096, dtype=np.uint8).tobytes())
    _try_decode(str(p), parse)


def test_empty_and_tiny(tmp_path):
    for n, name in ((0, "empty"), (3, "tiny"), (8, "hdr")):
        p = tmp_path / f"{name}.bit"
        p.write_bytes(b"\x00" * n)
        _try_decode(str(p), "python")
        _try_decode(str(p), "native")
