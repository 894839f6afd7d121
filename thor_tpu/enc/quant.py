"""Forward quantization with "RDOQ light" (enc/encode_block.c:75-172).

Array-first implementation: zigzag, last-pos search and the forward
quant are vectorized; the pattern-based single-coefficient rescue loop
is inherently sequential but short. The full trellis RDOQ (rdoq=1,
enc/encode_block.c:179-472) lives in rdoq.py.
"""

from __future__ import annotations

import numpy as np

from ..codec.constants import (
    GQUANT_TABLE, GDEQUANT_TABLE, MAX_QUANT_SIZE, zigzag_for, log2i)


def quantize(coeff: np.ndarray, qp: int, size: int, coeff_block_type: int,
             rdoq: int):
    """Returns (cbp, coeffq) where coeffq is (size, size) int16 with the
    quantized qsize x qsize block at the top-left.

    Mirrors enc/encode_block.c:75-172 exactly (offsets 38/-26 for
    last-pos, 102/51 & 115/90 for levels, scaled by 256 of the step).
    """
    intra_block = (coeff_block_type >> 1) & 1
    chroma_flag = coeff_block_type & 1
    tr_log2size = log2i(size)
    qsize = min(MAX_QUANT_SIZE, size)
    scale = int(GQUANT_TABLE[qp % 6])
    shift2 = 21 - tr_log2size + qp // 6
    N = qsize * qsize

    zz = zigzag_for(qsize)
    scoeff = np.zeros(N, np.int64)
    scoeff[zz] = coeff[:qsize, :qsize].reshape(-1).astype(np.int64)

    # last_pos scan (intra/inter offsets 38/-26, scaled by 256)
    offset = (38 if intra_block else -26) << (shift2 - 8)
    levels = np.abs(np.abs(scoeff) * scale + offset) >> shift2
    nz = np.nonzero(levels)[0]
    if len(nz) == 0:
        # replicate the C scan result: last_pos = -1 means nothing coded
        return 0, np.zeros((size, size), np.int16)
    last_pos = int(nz[-1])

    # forward quant up to last_pos
    offset0 = (102 if intra_block else 51) << (shift2 - 8)
    offset1 = (115 if intra_block else 90) << (shift2 - 8)
    sc = scoeff[:last_pos + 1]
    sign = np.where(sc < 0, -1, 1)
    abs_coeff = scale * np.abs(sc)
    level0 = abs_coeff >> shift2
    off = np.where((level0 == 0) | bool(chroma_flag), offset0, offset1)
    level = (abs_coeff + off) >> shift2
    scoeffq = np.zeros(N, np.int64)
    scoeffq[:last_pos + 1] = sign * level
    cbp = int((level != 0).any())

    # RDOQ light (enc/encode_block.c:134-168)
    if cbp:
        Nn = last_pos + 1 if chroma_flag else N
        threshold = (73 * int(GDEQUANT_TABLE[qp % 6]) << (qp // 6)) \
            >> (4 + tr_log2size)
        for pos in range(2, Nn):
            flag = 1
            if pos > 2 and abs(scoeffq[pos - 3]) > 1:
                flag = 0
            if pos > 3 and abs(scoeffq[pos - 4]) > 1 \
                    and abs(scoeffq[pos - 3]) > 0:
                flag = 0
            if pos == 2 and (chroma_flag == 0 or last_pos >= 6):
                flag = 0
            if flag and scoeffq[pos - 2] == 0 and scoeffq[pos - 1] == 0 \
                    and abs(scoeffq[pos]) > 1:
                K1 = abs(scoeff[pos])
                K2 = abs(scoeff[pos - 1])
                K3 = abs(scoeff[pos - 2])
                K4 = max(K2, K3)
                if K1 + K4 < threshold:
                    scoeffq[pos] = -1 if scoeff[pos] < 0 else 1
                else:
                    if K2 > K3:
                        scoeffq[pos - 1] = -1 if scoeff[pos - 1] < 0 else 1
                    else:
                        scoeffq[pos - 2] = -1 if scoeff[pos - 2] < 0 else 1

    out = np.zeros((size, size), np.int16)
    out[:qsize, :qsize] = scoeffq[zz].reshape(qsize, qsize)
    return cbp, out
