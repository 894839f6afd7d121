"""Pallas encoder intra-scan kernel (ops/pallas_enc_intra.py) vs the
XLA lax.scan reference (enc/device_intra._encode_scan_fn): recon
planes and quantized coefficient banks must match bit-for-bit
(interpret mode; hardware parity is covered by the device-encoder
round trips on TPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from thor_tpu.ops import jax_kernels as JK
from thor_tpu.ops.pallas_enc_intra import (
    SIZES_Y, SIZES_C, build_enc_records, encode_scan_pallas)
from thor_tpu.enc.device_intra import _encode_scan_fn


def _mk_tus(W, H, rng, nmodes=10):
    """Mixed-size coding-order TU list over a small frame."""
    from thor_tpu.dec.native_inputs import (_downleft_available_v,
                                            _upright_available_v)
    tus = []
    k = 0
    for y0 in range(0, H, 64):
        for x0 in range(0, W, 64):
            pat = k % 3
            k += 1
            if pat == 0:
                tus.append((y0, x0, 64))
            elif pat == 1:
                for (dy, dx) in ((0, 0), (0, 32), (32, 0), (32, 32)):
                    tus.append((y0 + dy, x0 + dx, 32))
            else:
                for (dy, dx) in ((0, 0), (0, 32)):
                    tus.append((y0 + dy, x0 + dx, 32))
                for by in (32, 40, 48, 56):
                    for bx in range(0, 32, 8):
                        tus.append((y0 + by, x0 + bx, 8))
                tus.append((y0 + 32, x0 + 32, 32))
    ty = np.array([t[0] for t in tus], np.int32)
    tx = np.array([t[1] for t in tus], np.int32)
    sz = np.array([t[2] for t in tus], np.int32)
    md = rng.integers(0, nmodes, len(tus)).astype(np.int32)
    up = _upright_available_v(ty, tx, sz, W)
    dl = _downleft_available_v(ty, tx, sz, H)
    n = len(tus)
    npad = max(32, 1 << (n - 1).bit_length())

    def padn(a, fill=0):
        return np.concatenate(
            [a.astype(np.int32), np.full(npad - n, fill, np.int32)])

    arr = {
        "ty": padn(ty), "tx": padn(tx), "size": padn(sz, 8),
        "mode": padn(md), "toplen": padn(sz + up, 8),
        "leftlen": padn(sz + dl, 8),
        "cbx_nonzero": padn((tx > 0).astype(np.int32)),
        "valid": padn(np.ones(n, np.int32)),
    }
    arrc = dict(arr)
    arrc["ty"] = padn(ty // 2)
    arrc["tx"] = padn(tx // 2)
    arrc["size"] = padn(sz // 2, 4)
    arrc["toplen"] = padn(sz // 2 + up, 4)
    arrc["leftlen"] = padn(sz // 2 + dl, 4)
    arrc["cbx_nonzero"] = padn((tx // 2 > 0).astype(np.int32))
    return arr, arrc, n, npad


def _pad_for(plane):
    return jnp.pad(jnp.asarray(plane, jnp.int32),
                   ((JK.PADI, JK.PADE), (JK.PADI, JK.PADE)))


@pytest.mark.parametrize("fast,intra,qp", [
    (False, True, 32), (True, False, 27),
])
def test_luma_scan_parity(fast, intra, qp):
    rng = np.random.default_rng(3 * qp)
    W, H = 192, 128
    org = rng.integers(0, 256, (H, W)).astype(np.int32)
    start = rng.integers(0, 256, (H, W)).astype(np.int32)
    arr, _, n, npad = _mk_tus(W, H, rng)

    luma_fn, _ = _encode_scan_fn(fast, npad, intra_quant=intra)
    P, q16, cbp = luma_fn(_pad_for(start), _pad_for(org), arr,
                          jnp.int32(qp))
    want_y = np.asarray(P[JK.PADI:JK.PADI + H, JK.PADI:JK.PADI + W])
    want_q = np.asarray(q16)[:n]
    want_cbp = np.asarray(cbp)[:n]

    recs, cnt = build_enc_records(arr, SIZES_Y, K=64)
    got_pl, got_q = encode_scan_pallas(
        jnp.asarray(start)[None], jnp.asarray(org)[None], recs, cnt,
        qp, SIZES_Y, fast, intra, interpret=True)
    got_y = np.asarray(got_pl)[0]
    got_q = np.asarray(got_q)[:n, 0]

    assert np.array_equal(got_y, want_y)
    assert np.array_equal(got_q, want_q)
    assert np.array_equal((got_q != 0).any(axis=(1, 2)), want_cbp)


def test_chroma_scan_parity():
    rng = np.random.default_rng(9)
    W, H = 192, 128
    Wc, Hc = W // 2, H // 2
    qp = 35
    ou = rng.integers(0, 256, (Hc, Wc)).astype(np.int32)
    ov = rng.integers(0, 256, (Hc, Wc)).astype(np.int32)
    su = rng.integers(0, 256, (Hc, Wc)).astype(np.int32)
    sv = rng.integers(0, 256, (Hc, Wc)).astype(np.int32)
    _, arrc, n, npad = _mk_tus(W, H, rng)

    _, chroma_fn = _encode_scan_fn(False, npad, intra_quant=True)
    Pu, Pv, qu, cu, qv, cv = chroma_fn(
        _pad_for(su), _pad_for(sv), _pad_for(ou), _pad_for(ov), arrc,
        jnp.int32(qp))
    want_u = np.asarray(Pu[JK.PADI:JK.PADI + Hc, JK.PADI:JK.PADI + Wc])
    want_v = np.asarray(Pv[JK.PADI:JK.PADI + Hc, JK.PADI:JK.PADI + Wc])

    recs, cnt = build_enc_records(arrc, SIZES_C, K=64)
    got_pl, got_q = encode_scan_pallas(
        jnp.stack([jnp.asarray(su), jnp.asarray(sv)]),
        jnp.stack([jnp.asarray(ou), jnp.asarray(ov)]), recs, cnt,
        qp, SIZES_C, False, True, interpret=True)
    assert np.array_equal(np.asarray(got_pl)[0], want_u)
    assert np.array_equal(np.asarray(got_pl)[1], want_v)
    gq = np.asarray(got_q)[:n]
    assert np.array_equal(gq[:, 0], np.asarray(qu)[:n])
    assert np.array_equal(gq[:, 1], np.asarray(qv)[:n])
    assert np.array_equal((gq[:, 0] != 0).any(axis=(1, 2)),
                          np.asarray(cu)[:n])
    assert np.array_equal((gq[:, 1] != 0).any(axis=(1, 2)),
                          np.asarray(cv)[:n])
