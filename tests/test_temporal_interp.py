"""Native temporal interpolation (native/thor_interp.c) must be
bit-exact vs the Python oracle (ops/temporal_interp.py) - the decoder
re-synthesizes interpolated references, so any divergence breaks
bit-exact decode (the RA golden streams also cover this end-to-end)."""

import numpy as np
import pytest


class _Ref:
    def __init__(self, w, h, seed):
        g = np.random.default_rng(seed)
        base = (np.add.outer(np.arange(h), np.arange(w)) % 256) \
            .astype(np.uint8)
        self.y = np.pad((base + g.integers(0, 30, (h, w)))
                        .astype(np.uint8), 96, mode="edge")
        self.u = np.pad(g.integers(0, 255, (h // 2, w // 2), np.uint8),
                        48, mode="edge")
        self.v = np.pad(g.integers(0, 255, (h // 2, w // 2), np.uint8),
                        48, mode="edge")
        self.frame_num = 0


@pytest.mark.parametrize("ratio,pos", [(2, 1), (4, 1), (4, 3), (8, 3)])
def test_native_matches_python(ratio, pos):
    from thor_tpu.ops.temporal_interp import interpolate_frames
    a, b = _Ref(176, 144, 10), _Ref(176, 144, 11)
    yn, un, vn = interpolate_frames(a, b, ratio, pos, native=True)
    yp, up, vp = interpolate_frames(a, b, ratio, pos, native=False)
    assert np.array_equal(yn, yp)
    assert np.array_equal(un, up)
    assert np.array_equal(vn, vp)


def test_native_matches_python_identical_frames():
    # identical inputs drive the all-skip path
    from thor_tpu.ops.temporal_interp import interpolate_frames
    c = _Ref(352, 288, 5)
    y1, u1, v1 = interpolate_frames(c, c, 4, 1, native=True)
    y2, u2, v2 = interpolate_frames(c, c, 4, 1, native=False)
    assert np.array_equal(y1, y2)
    assert np.array_equal(u1, u2)
    assert np.array_equal(v1, v2)


@pytest.mark.parametrize("ratio,pos", [(2, 1), (4, 1), (4, 3)])
def test_device_matches_python(ratio, pos):
    """The batched device pyramid (ops/device_interp.py) is bit-exact
    vs the Python oracle - same contract as the native C twin."""
    from thor_tpu.ops.temporal_interp import interpolate_frames
    from thor_tpu.ops.device_interp import interpolate_frames_device
    a, b = _Ref(176, 144, 20), _Ref(176, 144, 21)
    yp, up, vp = interpolate_frames(a, b, ratio, pos, native=False)
    out = interpolate_frames_device(a, b, ratio, pos)
    yd, ud, vd = (np.asarray(x) for x in out[:3])
    assert np.array_equal(yp, yd)
    assert np.array_equal(up, ud)
    assert np.array_equal(vp, vd)
    # the padded reference planes match pad_plane of the output
    ypad = np.asarray(out[3])
    assert np.array_equal(ypad, np.pad(yp, 96, mode="edge"))


@pytest.mark.slow
def test_device_matches_python_real_frames():
    from .conftest import TESTDATA
    from thor_tpu.enc.encoder import read_yuv_frames
    from thor_tpu.ops.temporal_interp import interpolate_frames
    from thor_tpu.ops.device_interp import interpolate_frames_device

    frames = []
    for (y, u, v) in read_yuv_frames(str(TESTDATA / "test_cif.yuv"),
                                     352, 288):
        frames.append((y, u, v))

    class R:
        def __init__(self, f):
            self.y = np.pad(f[0], 96, mode="edge")
            self.u = np.pad(f[1], 48, mode="edge")
            self.v = np.pad(f[2], 48, mode="edge")

    for (i, j, ratio, pos) in [(0, 4, 4, 1), (3, 7, 8, 5),
                               (1, 2, 16, 7)]:
        a, b = R(frames[i]), R(frames[j])
        yp, up, vp = interpolate_frames(a, b, ratio, pos, native=False)
        yd, ud, vd = (np.asarray(x) for x in
                      interpolate_frames_device(a, b, ratio, pos)[:3])
        assert np.array_equal(yp, yd), (i, j, ratio, pos)
        assert np.array_equal(up, ud), (i, j, ratio, pos)
        assert np.array_equal(vp, vd), (i, j, ratio, pos)
