"""Encoder checkpoint/resume: a mid-sequence snapshot of {reference
ring, loop counters, stream offset} (utils/checkpoint.py) must let a
fresh Encoder continue and produce a byte-identical stream (SURVEY.md
§5 - the reference has no such subsystem)."""

import os

import numpy as np
import pytest

TD = os.path.join(os.path.dirname(__file__), "..", "testdata")
CFG = "/root/reference/config_LDB_low_complexity.txt"


@pytest.mark.skipif(not os.path.exists(CFG), reason="reference configs absent")
def test_encoder_checkpoint_resume_byte_identical(tmp_path):
    from thor_tpu.enc.encoder import (EncoderParams, Encoder,
                                      read_yuv_frames)

    yuv = os.path.join(TD, "test_cif.yuv")
    frames = list(read_yuv_frames(yuv, 352, 288))[:6]

    def params():
        return EncoderParams.from_config_file(
            CFG, width=352, height=288, num_frames=6)

    straight = str(tmp_path / "straight.bit")
    Encoder(params()).encode_sequence(frames, straight)

    ckpt = str(tmp_path / "enc.ckpt.npz")
    split = str(tmp_path / "split.bit")
    enc1 = Encoder(params())
    p1 = enc1.params
    p1.num_frames = 3
    rec_a = enc1.encode_sequence(frames, split, checkpoint_path=ckpt,
                                 checkpoint_every=3)
    assert os.path.exists(ckpt)

    enc2 = Encoder(params())
    rec_b = enc2.encode_sequence(frames, split, resume_path=ckpt)

    assert open(split, "rb").read() == open(straight, "rb").read()
    assert len(rec_a) + len(rec_b) == 6
