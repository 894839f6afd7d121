"""Device (batched-ME) inter P-frame encoder: the emitted stream must
be fully valid Thor — this project's bit-exact decoder reproduces the
encoder's own reconstruction exactly (device search per device_me.py /
device_inter.py; syntax per enc/write_bits.c via the exact host
writers)."""

import os

import numpy as np
import pytest

TD = os.path.join(os.path.dirname(__file__), "..", "testdata")
CFG = "/root/reference/config_LDB_low_complexity.txt"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(CFG), reason="reference configs absent")
def test_device_inter_roundtrip(tmp_path):
    from thor_tpu.enc.encoder import encode_file, read_yuv_frames
    from thor_tpu.dec.decoder import decode_file
    from thor_tpu.utils.snr import snr_yuv

    yuv = os.path.join(TD, "test_cif.yuv")
    out = str(tmp_path / "dev_p.bit")
    recons = encode_file(CFG, yuv, out, 352, 288, 3, device_encode=1)
    dec = decode_file(out, backend="numpy")
    assert len(dec) == 3
    for (ry, ru, rv), (dy, du, dv) in zip(recons, dec):
        assert np.array_equal(ry, dy)
        assert np.array_equal(ru, du)
        assert np.array_equal(rv, dv)

    # quality sanity: device ME + RDO must land in the same RD range as
    # the exact-mirror encoder (not a bit-identity requirement)
    frames = list(read_yuv_frames(yuv, 352, 288))
    for i in (1, 2):
        psnr_y = snr_yuv(frames[i], recons[i])[0]
        assert psnr_y > 28.0, f"frame {i}: {psnr_y:.2f} dB"


RA_CFG = "/root/reference/config_RA16_high_efficiency.txt"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(RA_CFG),
                    reason="reference configs absent")
def test_device_b_frame_roundtrip(tmp_path):
    """Device encode of a hierarchical-B RA16 sequence (future
    references with MV sign folding, interp-ref synthesis, tb-enabled
    sequence, delta-QP streams coded as dqp=0): the emitted stream
    must decode - by this project's bit-exact decoder - to exactly the
    encoder's own reconstruction."""
    from thor_tpu.enc.encoder import encode_file, read_yuv_frames
    from thor_tpu.dec.decoder import decode_file
    from thor_tpu.utils.snr import snr_yuv

    yuv = os.path.join(TD, "test_cif.yuv")
    out = str(tmp_path / "dev_b.bit")
    recons = encode_file(RA_CFG, yuv, out, 352, 288, 6, device_encode=1)
    dec = decode_file(out, backend="numpy")
    assert len(dec) == 6
    for (ry, ru, rv), (dy, du, dv) in zip(recons, dec):
        assert np.array_equal(ry, dy)
        assert np.array_equal(ru, du)
        assert np.array_equal(rv, dv)
    frames = list(read_yuv_frames(yuv, 352, 288))
    for i in (1, 3, 5):
        assert snr_yuv(frames[i], recons[i])[0] > 28.0


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(CFG), reason="reference configs absent")
def test_native_decide_emit_parity(tmp_path, monkeypatch):
    """The C decision walk and C syntax emitter (native/thor_decide.c)
    must produce streams byte-identical to the Python paths they
    replace - all four combinations agree."""
    from thor_tpu.enc.encoder import encode_file

    yuv = os.path.join(TD, "test_cif.yuv")
    outs = []
    for decide in ("0", "1"):
        for emit in ("0", "1"):
            monkeypatch.setenv("THOR_NATIVE_DECIDE", decide)
            monkeypatch.setenv("THOR_NATIVE_EMIT", emit)
            out = str(tmp_path / f"d{decide}e{emit}.bit")
            encode_file(CFG, yuv, out, 352, 288, 3, device_encode=1)
            outs.append(open(out, "rb").read())
    assert all(o == outs[0] for o in outs[1:])
