"""Randomized kernel parity: JAX device kernels vs the NumPy oracle
(exact integer equality, SURVEY.md §4 kernel-level test strategy)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import thor_tpu.ops.jax_kernels as JK
import thor_tpu.ops.np_kernels as NK
from thor_tpu.codec.constants import BETA_TABLE, CHROMA_QP, TC_TABLE

H, W = 128, 192
QP = 38


class _DD:
    pass


def _rand_dd(rng):
    dd = _DD()
    gh, gw = H // 4, W // 4
    dd.size = rng.choice([8, 16, 32, 64], (gh, gw)).astype(np.int32)
    dd.tb_split = rng.randint(0, 2, (gh, gw)).astype(np.int32)
    dd.pb_part = rng.randint(0, 4, (gh, gw)).astype(np.int32)
    dd.mode = rng.randint(0, 5, (gh, gw)).astype(np.int32)
    dd.cbp_y = rng.randint(0, 2, (gh, gw)).astype(np.int32)
    for k in ("mv0x", "mv0y", "mv1x", "mv1y"):
        setattr(dd, k, rng.randint(-9, 9, (gh, gw)).astype(np.int32))
    return dd


def test_deblock_parity():
    rng = np.random.RandomState(3)
    keys = ("size", "tb_split", "pb_part", "mode", "cbp_y",
            "mv0x", "mv0y", "mv1x", "mv1y")
    fl = jax.jit(lambda r, d: JK.deblock_luma(
        r, JK.unpack_ddp(d), H, W, np.int32(BETA_TABLE[QP]),
        np.int32(TC_TABLE[QP])))
    fc = jax.jit(lambda r, d: JK.deblock_chroma(
        r, JK.unpack_ddp(d), H, W, np.int32(TC_TABLE[CHROMA_QP[QP]])))
    for _ in range(3):
        dd = _rand_dd(rng)
        dd_dict = JK.pack_ddp({k: getattr(dd, k) for k in keys})
        rec = rng.randint(0, 256, (H, W)).astype(np.uint8)
        a = rec.copy()
        NK.deblock_frame_y(a, dd, W, H, QP, BETA_TABLE, TC_TABLE)
        b = np.asarray(fl(rec.astype(np.int32), dd_dict))
        assert np.array_equal(a, b.astype(np.uint8))

        u = rng.randint(0, 256, (H // 2, W // 2)).astype(np.uint8)
        v = rng.randint(0, 256, (H // 2, W // 2)).astype(np.uint8)
        au, av = u.copy(), v.copy()
        NK.deblock_frame_uv(au, av, dd, W, H, int(CHROMA_QP[QP]), TC_TABLE)
        bu = np.asarray(fc(u.astype(np.int32), dd_dict))
        bv = np.asarray(fc(v.astype(np.int32), dd_dict))
        assert np.array_equal(au, bu.astype(np.uint8))
        assert np.array_equal(av, bv.astype(np.uint8))


def test_mc_conv_vs_oracle():
    """conv-MC against the scalar-exact mc_luma oracle on a random MV
    field (covers all 16 phases incl. integer and funny positions)."""
    rng = np.random.RandomState(7)
    PAD = JK.PAD_Y
    ref = rng.randint(0, 256, (2, H + 2 * PAD, W + 2 * PAD)).astype(np.uint8)
    mvx = rng.randint(-64, 65, (H // 4, W // 4)).astype(np.int32)
    mvy = rng.randint(-64, 65, (H // 4, W // 4)).astype(np.int32)
    slot = rng.randint(0, 2, (H // 4, W // 4)).astype(np.int32)
    lut = JK.build_luma_mc_lut(0)

    f = jax.jit(lambda r, a, b, c: JK.mc_gather_from_phases(
        JK.mc_phase_conv(r, lut, PAD), a, b, c, PAD, 2, 4, H, W, -2))
    got = np.asarray(f(ref, mvx, mvy, slot))

    want = np.zeros((H, W), np.uint8)
    for cy in range(H // 4):
        for cx in range(W // 4):
            want[cy*4:cy*4+4, cx*4:cx*4+4] = NK.mc_luma(
                ref[slot[cy, cx]], PAD + cy * 4, PAD + cx * 4, 4, 4,
                int(mvx[cy, cx]), int(mvy[cy, cx]), 0, 0)
    assert np.array_equal(got.astype(np.uint8), want)


def test_idct_parity():
    rng = np.random.RandomState(9)
    for s in (4, 8, 16, 32):
        c = np.zeros((6, s, s), np.int16)
        qs = min(s, 16)
        c[:, :qs, :qs] = rng.randint(-500, 500, (6, qs, qs))
        got = np.asarray(jax.jit(lambda x: JK.idct_batch(x, s))(c))
        for i in range(6):
            want = NK.inverse_transform(c[i], s)
            assert np.array_equal(got[i].astype(np.int16), want), s


def test_intra_predict_static_parity():
    """The gather-free static-size path of intra_predict must equal the
    dynamic path bit for bit for every (size, mode)."""
    rng = np.random.RandomState(5)
    for s in (4, 8, 16, 32, 64):
        dyn_fn = jax.jit(lambda l, t, c, y, x, sz, m: JK.intra_predict(
            l, t, c, y, x, sz, m))
        sta_fn = jax.jit(lambda l, t, c, y, x, m, s=s: JK.intra_predict(
            l, t, c, y, x, s, m))
        for mode in range(10):
            for _ in range(3):
                left = rng.randint(0, 256, 128).astype(np.int32)
                top = rng.randint(0, 256, 128).astype(np.int32)
                tl = np.int32(rng.randint(0, 256))
                ty = np.int32(rng.randint(0, 50) * 8)
                tx = np.int32(rng.randint(0, 50) * 8)
                dyn = np.asarray(dyn_fn(left, top, tl, ty, tx,
                                        np.int32(s), np.int32(mode)))
                sta = np.asarray(sta_fn(left, top, tl, ty, tx,
                                        np.int32(mode)))
                assert np.array_equal(dyn[:s, :s], sta[:s, :s]), (s, mode)


def test_quantize_fwd_batch_parity():
    """Batched device quantizer vs the mirror's exact quantize()
    (enc/encode_block.c:75-172) including the unconditional RDOQ-light
    zero-run pass and the chroma low-offset rule."""
    from thor_tpu.enc.quant import quantize
    from thor_tpu.codec.constants import zigzag_for
    rng = np.random.RandomState(1)
    for size in (4, 8, 16, 32):
        for intra in (False, True):
            for chroma in (False, True):
                qp = 32
                N = 17
                c = (rng.randint(-800, 800, (N, size, size))
                     * (rng.rand(N, size, size) < 0.15)).astype(np.int64)
                c[::7] //= 50
                zz = zigzag_for(min(size, 16))
                qd, cbpd = JK.quantize_fwd_batch(
                    jnp.asarray(c), qp, size, intra, zz, chroma)
                qd = np.asarray(qd)
                cbpd = np.asarray(cbpd)
                ct = (intra << 1) | chroma
                for i in range(N):
                    cbp, qq = quantize(c[i], qp, size, ct, 0)
                    assert np.array_equal(qq, qd[i])
                    assert (cbp != 0) == bool(cbpd[i])
