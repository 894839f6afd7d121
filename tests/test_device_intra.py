"""Device (batched-search) intra encoder: the emitted stream must be
fully valid Thor — i.e. this project's bit-exact decoder reproduces the
encoder's own reconstruction exactly (enc/encode_block.c semantics via
the TPU-first search of device_intra.py)."""

import os

import numpy as np
import pytest

TD = os.path.join(os.path.dirname(__file__), "..", "testdata")
CFG = "/root/reference/config_LDB_low_complexity.txt"


@pytest.mark.skipif(not os.path.exists(CFG), reason="reference configs absent")
def test_device_intra_roundtrip(tmp_path):
    from thor_tpu.enc.encoder import encode_file, read_yuv_frames
    from thor_tpu.dec.decoder import decode_file
    from thor_tpu.utils.snr import snr_yuv

    yuv = os.path.join(TD, "test_cif.yuv")
    out = str(tmp_path / "dev_intra.bit")
    recons = encode_file(CFG, yuv, out, 352, 288, 1,
                         intra_period=1, device_encode=1)
    dec = decode_file(out, backend="numpy")
    assert len(dec) == 1
    for (ry, ru, rv), (dy, du, dv) in zip(recons, dec):
        assert np.array_equal(ry, dy)
        assert np.array_equal(ru, du)
        assert np.array_equal(rv, dv)

    # sanity on quality: device search must land in the same RD range
    # as the exact-mirror encoder (not a bit-identity requirement)
    frame = next(iter(read_yuv_frames(yuv, 352, 288)))
    psnr_y = snr_yuv(frame, recons[0])[0]
    assert psnr_y > 28.0
