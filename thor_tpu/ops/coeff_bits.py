"""Exact device bit-cost of the coefficient VLC coding.

Vectorized mirror of write_coeff's two-state level/run automaton
(enc/write_bits.c:110-253) and the relevant quote_vlc tables
(enc/putvlc.c:133-229): a lax.scan walks the zigzag scan positions
once while all blocks advance through the automaton in parallel
lanes. This replaces the calibrated bit proxy in the device encoders
with the true stream cost (SURVEY.md notes the quote_vlc mirror is
intended to be exact).

floor(log2(x)) is computed with frexp - exact for the int ranges
involved (< 2^24).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..codec.constants import zigzag_for


def _flog2(x):
    """floor(log2(x)) for int x >= 1."""
    return jnp.frexp(x.astype(jnp.float32))[1].astype(jnp.int32) - 1


def _qv0(v):
    """quote_vlc(0, v)."""
    return jnp.where(v < 6, 1 + v, 7 + 2 * _flog2(jnp.maximum(v - 5, 1)))


def _qv1(v):
    """quote_vlc(1, v)."""
    return jnp.where(v < 12, 2 + (v >> 1),
                     6 + 2 * _flog2(jnp.maximum(v - 10, 1)))


def _qv2(v):
    """quote_vlc(2, v)."""
    return jnp.where(v < 24, 3 + (v >> 2),
                     5 + 2 * _flog2(jnp.maximum(v - 20, 1)))


def _qv10(v):
    """quote_vlc(10, v)."""
    return 1 + 2 * _flog2(v + 1)


def _find_code(run, lv, maxrun, chroma: bool):
    """find_code(run, level, maxrun, chroma_flag, eob=0)
    (enc/write_bits.c:71-108)."""
    maxrun2 = jnp.maximum(4, maxrun)
    index = run + (lv > 1).astype(jnp.int32) * (maxrun2 + 1)
    cn = jnp.where(
        index <= 4, index + 1,
        jnp.where(index <= maxrun2, index + 3,
                  jnp.where(index == maxrun2 + 1, 6,
                            jnp.where(index == maxrun2 + 2, 7,
                                      index + 1))))
    if not chroma:
        cn = jnp.where(index < 2, index, cn)
    return cn


def _run_code_bits(cn, chroma: bool, small: bool):
    """Bits of the run/level codeword (enc/write_bits.c:201-210)."""
    if chroma and small:
        return _qv10(cn)
    return jnp.where(cn == 0, 2, _qv2(cn + 1))


@lru_cache(maxsize=None)
def _bits_fn(size: int, intra: bool, chroma: bool):
    qsize = min(size, 16)
    Nc = qsize * qsize
    zz = zigzag_for(qsize)
    small = size <= 8
    eob_bits = int(1 if (chroma and small) else (2 if chroma else 3))

    def f(q):
        """q: [N, size, size] int -> [N] exact write_coeff bits.
        Result is meaningful only for blocks with a nonzero coeff (the
        stream never carries an all-zero coefficient block)."""
        n = q.shape[0]
        block = q[:, :qsize, :qsize].reshape(n, Nc).astype(jnp.int32)
        sco = jnp.zeros_like(block).at[:, jnp.asarray(zz)].set(block)
        nz = sco != 0
        pidx = jnp.arange(Nc)
        last_pos = jnp.maximum(
            jnp.max(jnp.where(nz, pidx, -1), axis=1), 0)

        init = dict(
            bits=jnp.zeros((n,), jnp.int32),
            lm=jnp.ones((n,), jnp.bool_),
            vlc=jnp.full((n,), bool(intra and not chroma), jnp.bool_),
            run=jnp.zeros((n,), jnp.int32),
            maxrun=jnp.zeros((n,), jnp.int32))

        def step(c, inp):
            v, p = inp
            lv = jnp.abs(v)
            active = p <= last_pos
            # --- level mode ---
            lv_bits = jnp.where(c['vlc'], _qv1(lv), _qv0(lv)) \
                + (lv > 0)
            vlc_next = (lv > 3) if not chroma else c['vlc']
            lm_next_l = lv > 0
            # --- run mode ---
            is_z = lv == 0
            cn = _find_code(c['run'], lv, c['maxrun'], chroma)
            sgn = (v < 0).astype(jnp.int32)
            lvl_bits = jnp.where(lv > 1,
                                 _qv0(2 * jnp.maximum(lv - 2, 0) + sgn),
                                 1)
            run_bits = _run_code_bits(cn, chroma, small) + lvl_bits
            nbits = jnp.where(c['lm'], lv_bits,
                              jnp.where(is_z, 0, run_bits))
            # state updates
            lm2 = jnp.where(c['lm'], lm_next_l, lv > 1)
            # entering/continuing run mode resets run bookkeeping:
            #  - level mode emitted a zero -> maxrun = Nc - (p+1) - 1
            #  - run mode coded a level-1 coeff -> same
            new_span = (c['lm'] & is_z) | (~c['lm'] & ~is_z & (lv <= 1))
            run2 = jnp.where(c['lm'], 0,
                             jnp.where(is_z, c['run'] + 1, 0))
            maxrun2 = jnp.where(new_span, Nc - p - 2, c['maxrun'])
            vlc2 = jnp.where(c['lm'] & ~jnp.bool_(chroma),
                             vlc_next, c['vlc'])
            out = dict(
                bits=c['bits'] + jnp.where(active, nbits, 0),
                lm=jnp.where(active, lm2, c['lm']),
                vlc=jnp.where(active, vlc2, c['vlc']),
                run=jnp.where(active, run2, c['run']),
                maxrun=jnp.where(active, maxrun2, c['maxrun']))
            return out, None

        # latency-bound: the body is a handful of elementwise ops on
        # [N] lanes, so per-trip loop overhead dominates the 256-step
        # walk; unrolling cuts trip count 8x at unchanged semantics
        fin, _ = lax.scan(step, init, (sco.T, pidx),
                          unroll=min(8, Nc))
        bits = fin['bits']
        # tail zero in level mode + EOB (enc/write_bits.c:231-252)
        tail = fin['lm'] & (last_pos + 1 < Nc)
        bits = bits + jnp.where(tail,
                                jnp.where(fin['vlc'], 2, 1), 0)
        pos_after = last_pos + 1 + tail.astype(jnp.int32)
        bits = bits + jnp.where(pos_after < Nc, eob_bits, 0)
        if chroma:
            shortcut = (last_pos == 0) & (jnp.abs(sco[:, 0]) == 1)
            bits = jnp.where(shortcut, 2, bits + 1)
        return bits

    return f


def coeff_bits_batch(q, size: int, intra: bool, chroma: bool):
    """Exact write_coeff bit count for [N, size, size] quantized
    blocks (jit-compatible; see _bits_fn)."""
    return _bits_fn(size, bool(intra), bool(chroma))(q)
