"""Sequence/frame-level encoder driver.

Mirrors enc/mainenc.c (GOP structure, frame typing, QP cascade,
reference-list construction) and enc/encode_frame.c (lambda model, frame
header, SB loop, in-loop filters, CLPF decision, sliding-window refs).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..bitstream.writer import BitWriter
from ..codec.constants import (
    BETA_TABLE, CHROMA_QP, I_FRAME, B_FRAME, P_FRAME, MAX_BLOCK_SIZE,
    MAX_NUM_INTRA_MODES, MAX_REF_FRAMES, MAX_REORDER_BUFFER,
    MODE_BIPRED, MODE_INTER,
    MODE_MERGE, MODE_SKIP, TC_TABLE)
from ..codec.blockdata import DeblockData
from ..ops import np_kernels as K
from .block import BlockParam, process_block

# lambda = lambda_coeff * squared_lambda_QP[qp] (enc/encode_frame.c:37-46)
SQUARED_LAMBDA_QP = [
    0.0382, 0.0485, 0.0615, 0.0781, 0.0990, 0.1257, 0.1595, 0.2023, 0.2567,
    0.3257, 0.4132, 0.5243, 0.6652, 0.8440, 1.0709, 1.3588, 1.7240, 2.1874,
    2.7754, 3.5214, 4.4679, 5.6688, 7.1926, 9.1259, 11.5789, 14.6912,
    18.6402, 23.6505, 30.0076, 38.0735, 48.3075, 61.2922, 77.7672, 98.6706,
    125.1926, 158.8437, 201.5399, 255.7126, 324.4467, 411.6560, 522.3067,
    662.6996, 840.8294, 1066.8393, 1353.5994, 1717.4389, 2179.0763,
    2764.7991, 3507.9607, 4450.8797, 5647.2498, 7165.1970]


@dataclass
class EncoderParams:
    """Typed flag registry with reference defaults
    (enc/strings.c:286-338)."""
    width: int = 1920
    height: int = 1080
    qp: int = 32
    num_frames: int = 600
    skip: int = 0
    frame_rate: float = 60.0
    lambda_coeffI: float = 1.0
    lambda_coeffP: float = 1.0
    lambda_coeffB: float = 1.0
    lambda_coeffB0: float = 1.0
    lambda_coeffB1: float = 1.0
    lambda_coeffB2: float = 1.0
    lambda_coeffB3: float = 1.0
    early_skip_thr: float = 0.0
    enable_tb_split: int = 0
    enable_pb_split: int = 0
    max_num_ref: int = 1
    HQperiod: int = 1
    num_reorder_pics: int = 0
    dyadic_coding: int = 1
    interp_ref: int = 0
    dqpP: int = 0
    dqpB: int = 0
    dqpB0: int = 0
    dqpB1: int = 0
    dqpB2: int = 0
    dqpB3: int = 0
    mqpP: float = 1.0
    mqpB: float = 1.0
    mqpB0: float = 1.0
    mqpB1: float = 1.0
    mqpB2: float = 1.0
    mqpB3: float = 1.0
    dqpI: int = 0
    intra_period: int = 0
    intra_rdo: int = 0
    rdoq: int = 0
    max_delta_qp: int = 0
    delta_qp_step: int = 1
    encoder_speed: int = 0
    sync: int = 0
    deblocking: int = 1
    clpf: int = 1
    snrcalc: int = 1
    use_block_contexts: int = 0
    enable_bipred: int = 0
    file_headerlen: int = 0     # -ph (enc/strings.c:288)
    frame_headerlen: int = 0    # -fh (enc/strings.c:289)
    device_encode: int = 0

    @classmethod
    def from_config_file(cls, path: str, **overrides):
        """Parse a reference -cf config file (enc/strings.c:64-123,
        137-265): whitespace tokens, `;` comments to end of line,
        quoted strings, recursive nested -cf includes."""
        p = cls()
        apply_args(config_tokens(path), p, {})
        for k, v in overrides.items():
            setattr(p, k, v)
        # The reference stores ARG_FLOAT params as C float (32-bit,
        # enc/mainenc.h:48-71); round-trip through float32 so products
        # like lambda_coeffP * squared_lambda_QP match bit for bit.
        for f in FLOAT_PARAMS:
            setattr(p, f, float(np.float32(getattr(p, f))))
        return p


# ARG_FLOAT params (enc/strings.c:298-306, 320-325)
FLOAT_PARAMS = (
    "frame_rate", "lambda_coeffI", "lambda_coeffP", "lambda_coeffB",
    "lambda_coeffB0", "lambda_coeffB1", "lambda_coeffB2",
    "lambda_coeffB3", "early_skip_thr", "mqpP", "mqpB", "mqpB0",
    "mqpB1", "mqpB2", "mqpB3")

# Flags whose name differs from the EncoderParams field
# (enc/strings.c:286-298)
FLAG_ALIAS = {"-n": "num_frames", "-f": "frame_rate",
              "-ph": "file_headerlen", "-fh": "frame_headerlen"}
FILE_FLAGS = {"-if": "if", "-of": "of", "-rf": "rf", "-stat": "stat"}


def config_tokens(path: str):
    """Tokenize a config file exactly like read_config_file
    (enc/strings.c:64-123): whitespace-separated tokens; a token
    starting with `;` discards the rest of its line; `"..."` reads a
    string up to the closing quote, comma or newline."""
    toks = []
    with open(path) as f:
        for line in f:
            i, n = 0, len(line)
            while i < n:
                while i < n and line[i].isspace():
                    i += 1
                if i >= n:
                    break
                if line[i] == ';':
                    break
                if line[i] == '"':
                    j = i + 1
                    while j < n and line[j] not in '",\n':
                        j += 1
                    toks.append(line[i + 1:j])
                    i = j + 1
                else:
                    j = i
                    while j < n and not line[j].isspace():
                        j += 1
                    toks.append(line[i:j])
                    i = j
    return toks


def _atoi(s: str) -> int:
    """C atoi: leading integer prefix, 0 if none."""
    s = s.strip()
    m = 0
    sign = 1
    i = 0
    if i < len(s) and s[i] in "+-":
        sign = -1 if s[i] == "-" else 1
        i += 1
    j = i
    while j < len(s) and s[j].isdigit():
        j += 1
    if j > i:
        m = int(s[i:j])
    return sign * m


def apply_args(args, params: "EncoderParams", files: dict):
    """Apply a flag token stream to (params, files) with the reference
    parse_params semantics (enc/strings.c:137-265): recursive -cf,
    unknown parameters are fatal (ValueError)."""
    i = 0
    n = len(args)
    while i < n:
        a = args[i]
        if a == "-cf":
            if i + 1 >= n:
                raise ValueError("No filename found for parameter: -cf")
            apply_args(config_tokens(args[i + 1]), params, files)
            i += 2
            continue
        if a in FILE_FLAGS:
            if i + 1 >= n:
                raise ValueError(f"No filename found for parameter: {a}")
            files[FILE_FLAGS[a]] = args[i + 1]
            i += 2
            continue
        name = FLAG_ALIAS.get(a, a[1:] if a.startswith("-") else "")
        if not name or name.startswith("_") or \
                name not in params.__dataclass_fields__:
            raise ValueError(f"Unknown parameter: {a}")
        if i + 1 >= n:
            raise ValueError(f"No value found for parameter: {a}")
        val = args[i + 1]
        if name in FLOAT_PARAMS:
            setattr(params, name, float(np.float32(float(val))))
        else:
            setattr(params, name, _atoi(val))
        i += 2


class RefFrame:
    """Padded reference (create_reference_frame,
    common/common_frame.c:464-483)."""

    PAD_Y = 96
    PAD_C = 48

    def __init__(self, y, u, v, frame_num):
        self.frame_num = frame_num
        self.y = K.pad_plane(y, self.PAD_Y)
        self.u = K.pad_plane(u, self.PAD_C)
        self.v = K.pad_plane(v, self.PAD_C)


class Encoder:
    """Top-level encoder (the mainenc.c driver)."""

    def __init__(self, params: EncoderParams):
        self.params = params
        self.width = params.width
        self.height = params.height
        p = params
        # Frame-level state
        self.frame_type = I_FRAME
        self.frame_qp = p.qp
        self.frame_num = 0
        self.num_ref = 0
        self.ref_array: List[int] = []
        self.interp_ref = 0
        self.b_level = 0
        self.num_intra_modes = MAX_NUM_INTRA_MODES
        self.lambda_ = 1.0
        self.max_delta_qp = p.max_delta_qp
        self.enable_bipred = p.enable_bipred
        self.final_encode = False
        self.mvcand = {}
        self.best_ref = -1

        self.refs: List[Optional[RefFrame]] = [None] * MAX_REF_FRAMES
        self.interp_frame: Optional[RefFrame] = None
        self.deblock_data = DeblockData(self.width, self.height)

        H, W = self.height, self.width
        self.rec_y = np.zeros((H, W), np.uint8)
        self.rec_u = np.zeros((H // 2, W // 2), np.uint8)
        self.rec_v = np.zeros((H // 2, W // 2), np.uint8)
        self.org_y = None
        self.org_u = None
        self.org_v = None

    # --- hooks used by block.py (inter implemented in inter.py) ---

    def save_region(self, binfo):
        y0, x0, s = binfo.ypos, binfo.xpos, binfo.size
        yc, xc, sc = y0 // 2, x0 // 2, s // 2
        bh, bw = binfo.bheight, binfo.bwidth
        return (self.rec_y[y0:y0+bh, x0:x0+bw].copy(),
                self.rec_u[yc:yc+(bh+1)//2, xc:xc+(bw+1)//2].copy(),
                self.rec_v[yc:yc+(bh+1)//2, xc:xc+(bw+1)//2].copy())

    def restore_region(self, binfo, region):
        y0, x0 = binfo.ypos, binfo.xpos
        yc, xc = y0 // 2, x0 // 2
        bh, bw = binfo.bheight, binfo.bwidth
        self.rec_y[y0:y0+bh, x0:x0+bw] = region[0]
        self.rec_u[yc:yc+(bh+1)//2, xc:xc+(bw+1)//2] = region[1]
        self.rec_v[yc:yc+(bh+1)//2, xc:xc+(bw+1)//2] = region[2]

    def store_deblock_data(self, binfo):
        """copy_deblock_data (enc/encode_block.c) on final encode."""
        bp = binfo.block_param
        pb_part_stored = bp.pb_part if bp.mode == 2 else 0
        cbp = bp.cbp
        cbp_flat = (1 if cbp[0] else 0, 1 if cbp[1] else 0,
                    1 if cbp[2] else 0)
        self.deblock_data.store_block(
            binfo.ypos, binfo.xpos, binfo.bwidth, binfo.bheight, binfo.size,
            bp.mode, cbp_flat, bp.tb_split, pb_part_stored,
            bp.mv_arr0, bp.mv_arr1, bp.ref_idx0, bp.ref_idx1, bp.dir)

    def get_ref(self, ref_idx):
        r = self.ref_array[ref_idx]
        return self.refs[r] if r >= 0 else self.interp_frame

    def _pred_yuv(self, ref, binfo, mv_arr, sign, split):
        """get_inter_prediction_yuv (enc/encode_block.c:1534-1567):
        per-PB MC with MV clipping; returns (py, pu, pv) covering
        bwidth x bheight."""
        from .inter import clip_mv
        div = split + 1
        bw, bh = binfo.bwidth // div, binfo.bheight // div
        size = binfo.size
        ypos, xpos = binfo.ypos, binfo.xpos
        py = np.empty((binfo.bheight, binfo.bwidth), np.uint8)
        pu = np.empty((binfo.bheight // 2, binfo.bwidth // 2), np.uint8)
        pv = np.empty_like(pu)
        eb = self.enable_bipred
        for index in range(div * div):
            idx, idy = index & 1, (index >> 1) & 1
            mvx, mvy = clip_mv(mv_arr[index][0], mv_arr[index][1], ypos,
                               xpos, self.width, self.height, size, sign)
            oy, ox = ypos + idy * bh, xpos + idx * bw
            py[idy*bh:(idy+1)*bh, idx*bw:(idx+1)*bw] = K.mc_luma(
                ref.y, RefFrame.PAD_Y + oy, RefFrame.PAD_Y + ox, bh, bw,
                mvx, mvy, sign, eb)
            oyc, oxc = ypos // 2 + idy * bh // 2, xpos // 2 + idx * bw // 2
            pu[idy*bh//2:(idy+1)*bh//2, idx*bw//2:(idx+1)*bw//2] = \
                K.mc_chroma(ref.u, RefFrame.PAD_C + oyc,
                            RefFrame.PAD_C + oxc, bh // 2, bw // 2,
                            mvx, mvy, sign)
            pv[idy*bh//2:(idy+1)*bh//2, idx*bw//2:(idx+1)*bw//2] = \
                K.mc_chroma(ref.v, RefFrame.PAD_C + oyc,
                            RefFrame.PAD_C + oxc, bh // 2, bw // 2,
                            mvx, mvy, sign)
        return py, pu, pv

    @staticmethod
    def _avg_pred(p0, p1):
        return tuple(((a.astype(np.int32) + b) >> 1).astype(np.uint8)
                     for a, b in zip(p0, p1))

    def _inter_residual_plane(self, org, pred, size, qp, coeff_type,
                              tb_split, plane_is_luma):
        """encode_and_reconstruct_block_inter for one plane
        (enc/encode_block.c:1469-1532). Returns (cbp, coeffq, rec)."""
        from .quant import quantize
        p = self.params
        resid = org.astype(np.int16) - pred.astype(np.int16)
        coeffq = np.zeros((size, size), np.int16)
        if tb_split:
            s2 = size // 2
            cbp = 0
            rblock = np.zeros((size, size), np.int16)
            for i in (0, s2):
                for j in (0, s2):
                    fast = size == 64 or p.encoder_speed > 1
                    coeff = K.transform_fwd(
                        np.ascontiguousarray(resid[i:i+s2, j:j+s2]), s2,
                        fast)
                    cbpbit, cq = quantize(coeff, qp, s2, coeff_type,
                                          p.rdoq)
                    if cbpbit:
                        rblock[i:i+s2, j:j+s2] = K.inverse_transform(
                            K.dequantize(cq, qp), s2)
                    coeffq[i:i+s2, j:j+s2] = cq
                    cbp = (cbp << 1) + cbpbit
            rec = K.reconstruct_block(rblock, pred)
            return cbp, coeffq, rec
        fast = (size == 64 and p.encoder_speed > 0) or p.encoder_speed > 1
        coeff = K.transform_fwd(resid, size, fast)
        cbp, coeffq = quantize(coeff, qp, size, coeff_type, p.rdoq)
        if cbp:
            rec = K.reconstruct_block(
                K.inverse_transform(K.dequantize(coeffq, qp), size), pred)
        else:
            rec = pred.copy()
        return cbp, coeffq, rec

    def encode_inter_block(self, w, binfo, bp, qpY, qpC):
        """Pixel path of encode_block for non-intra modes
        (enc/encode_block.c:1688-1790). Writes recon into the frame rec
        planes; sets bp.cbp / coefficient planes."""
        mode = bp.mode
        ypos, xpos = binfo.ypos, binfo.xpos
        bw, bh = binfo.bwidth, binfo.bheight
        yc, xc = ypos // 2, xpos // 2
        split = self.params.enable_pb_split if mode in (MODE_INTER,
                                                        MODE_BIPRED) else 0

        if mode == MODE_SKIP or mode == MODE_MERGE:
            if bp.dir == 2:
                ref0 = self.get_ref(bp.ref_idx0)
                ref1 = self.get_ref(bp.ref_idx1)
                s0 = 1 if ref0.frame_num >= self.frame_num else 0
                s1 = 1 if ref1.frame_num >= self.frame_num else 0
                pred = self._avg_pred(
                    self._pred_yuv(ref0, binfo, bp.mv_arr0, s0, 0),
                    self._pred_yuv(ref1, binfo, bp.mv_arr1, s1, 0))
            else:
                ref0 = self.get_ref(bp.ref_idx0)
                s0 = 1 if ref0.frame_num > self.frame_num else 0
                pred = self._pred_yuv(ref0, binfo, bp.mv_arr0, s0, 0)
        elif mode == MODE_INTER:
            ref0 = self.get_ref(bp.ref_idx0)
            s0 = 1 if ref0.frame_num > self.frame_num else 0
            pred = self._pred_yuv(ref0, binfo, bp.mv_arr0, s0, split)
        else:  # MODE_BIPRED
            ref0 = self.get_ref(bp.ref_idx0)
            ref1 = self.get_ref(bp.ref_idx1)
            s0 = 1 if ref0.frame_num >= self.frame_num else 0
            s1 = 1 if ref1.frame_num >= self.frame_num else 0
            pred = self._avg_pred(
                self._pred_yuv(ref0, binfo, bp.mv_arr0, s0, split),
                self._pred_yuv(ref1, binfo, bp.mv_arr1, s1, split))

        if mode == MODE_SKIP:
            bp.cbp = (0, 0, 0)
            self.rec_y[ypos:ypos+bh, xpos:xpos+bw] = pred[0]
            self.rec_u[yc:yc+bh//2, xc:xc+bw//2] = pred[1]
            self.rec_v[yc:yc+bh//2, xc:xc+bw//2] = pred[2]
            return

        size = binfo.size
        sc = size // 2
        zero_block = bp.tb_param == -1
        if zero_block:
            bp.cbp = (0, 0, 0)
            recs = pred
        else:
            it = (1 if self.frame_type == I_FRAME else 0) << 1
            tb = bp.tb_split
            cy, bp.coeff_y, ry = self._inter_residual_plane(
                self.org_y[ypos:ypos+size, xpos:xpos+size], pred[0],
                size, qpY, it | 0, tb, True)
            cu, bp.coeff_u, ru = self._inter_residual_plane(
                self.org_u[yc:yc+sc, xc:xc+sc], pred[1], sc, qpC,
                it | 1, tb and size > 8, False)
            cv, bp.coeff_v, rv = self._inter_residual_plane(
                self.org_v[yc:yc+sc, xc:xc+sc], pred[2], sc, qpC,
                it | 1, tb and size > 8, False)
            bp.cbp = (cy, cu, cv)
            recs = (ry, ru, rv)
        self.rec_y[ypos:ypos+size, xpos:xpos+size] = recs[0]
        self.rec_u[yc:yc+sc, xc:xc+sc] = recs[1]
        self.rec_v[yc:yc+sc, xc:xc+sc] = recs[2]

    # --- early skip (enc/encode_block.c:2481-2783) ---

    def _early_skip_threshold(self, size):
        """float32 semantics throughout: early_skip_threshold is a C
        float, including after the 1.3x scaling for 64-blocks
        (enc/encode_block.c:2635-2636)."""
        thr = float(np.float32(self.params.early_skip_thr))
        if self.params.encoder_speed > 1 and size == MAX_BLOCK_SIZE:
            thr = float(np.float32(1.3 * thr))
        return thr

    def _check_sub_luma(self, org, pred, size, qp, thr):
        """check_early_skip_sub_block (enc/encode_block.c:2505-2538)."""
        from ..codec.constants import GQUANT_TABLE, log2i
        resid = org.astype(np.int32) - pred.astype(np.int32)
        if size > 4:
            s2 = size // 2
            tmp = ((resid.reshape(s2, 2, s2, 2).transpose(0, 2, 1, 3)
                    .reshape(s2, s2, 4).sum(axis=2) + 2) >> 2) \
                .astype(np.int16)
            coeff = K.transform_fwd(tmp, s2, False)
            tsize, rel = s2, 0.5 * thr
        else:
            coeff = K.transform_fwd(resid.astype(np.int16), size, False)
            tsize, rel = size, thr
        shift2 = 21 - log2i(tsize) + qp // 6
        first_level = float(1 << shift2) / float(GQUANT_TABLE[qp % 6])
        threshold = int(rel * first_level)
        return bool((np.abs(coeff[:tsize, :tsize]) > threshold).any())

    def _check_sub_chroma(self, org, pred, size, qp, thr):
        """check_early_skip_sub_blockC (enc/encode_block.c:2540-2611):
        column-sum significance (SIMD-path semantics: per-column sums for
        size 8, col-pair sums of the first 4 rows/cols otherwise)."""
        from ..codec.constants import GQUANT_TABLE
        shift2 = 21 - 5 + qp // 6
        threshold = int(thr * (float(1 << shift2)
                               / float(GQUANT_TABLE[qp % 6])))
        resid = org.astype(np.int32) - pred.astype(np.int32)
        if size == 8:
            colsum = resid.sum(axis=0)
            return bool((colsum > threshold).any())
        c = resid[:4, :4].sum(axis=0)
        return bool(c[0] + c[1] > threshold or c[2] + c[3] > threshold)

    def _check_early_skip_block(self, binfo, bp):
        """check_early_skip_block (enc/encode_block.c:2613-2745).
        Returns True if the candidate is insignificant (skippable)."""
        from .inter import clip_mv
        size = binfo.size
        ypos, xpos = binfo.ypos, binfo.xpos
        size0 = min(size, 32)  # EARLY_SKIP_BLOCK_SIZE
        qpY = self.frame_qp + binfo.delta_qp
        qpC = int(CHROMA_QP[qpY])
        thr = self._early_skip_threshold(size)
        eb = self.enable_bipred
        PY, PC = RefFrame.PAD_Y, RefFrame.PAD_C
        significant = False

        if bp.dir == 2:
            ref0 = self.get_ref(bp.ref_idx0)
            ref1 = self.get_ref(bp.ref_idx1)
            s0 = 1 if ref0.frame_num >= self.frame_num else 0
            s1 = 1 if ref1.frame_num >= self.frame_num else 0
            for i in range(0, size, size0):
                for j in range(0, size, size0):
                    mv0 = clip_mv(bp.mv_arr0[0][0], bp.mv_arr0[0][1],
                                  ypos, xpos, self.width, self.height,
                                  size0, s0)
                    mv1 = clip_mv(bp.mv_arr1[0][0], bp.mv_arr1[0][1],
                                  ypos, xpos, self.width, self.height,
                                  size0, s1)
                    p0 = K.mc_luma(ref0.y, PY+ypos+i, PY+xpos+j, size0,
                                   size0, mv0[0], mv0[1], s0, eb)
                    p1 = K.mc_luma(ref1.y, PY+ypos+i, PY+xpos+j, size0,
                                   size0, mv1[0], mv1[1], s1, eb)
                    pb = ((p0.astype(np.int32) + p1) >> 1).astype(np.uint8)
                    o = self.org_y[ypos+i:ypos+i+size0, xpos+j:xpos+j+size0]
                    significant = significant or self._check_sub_luma(
                        o, pb, size0, qpY, thr)
                    # chroma uses the unclipped MVs (reference quirk)
                    for (plane, orgp) in ((0, self.org_u), (1, self.org_v)):
                        r0 = ref0.u if plane == 0 else ref0.v
                        r1 = ref1.u if plane == 0 else ref1.v
                        c0 = K.mc_chroma(r0, PC+(ypos+i)//2, PC+(xpos+j)//2,
                                         size0//2, size0//2,
                                         bp.mv_arr0[0][0], bp.mv_arr0[0][1],
                                         s0)
                        c1 = K.mc_chroma(r1, PC+(ypos+i)//2, PC+(xpos+j)//2,
                                         size0//2, size0//2,
                                         bp.mv_arr1[0][0], bp.mv_arr1[0][1],
                                         s1)
                        cb = ((c0.astype(np.int32) + c1) >> 1).astype(np.uint8)
                        oc = orgp[(ypos+i)//2:(ypos+i)//2+size0//2,
                                  (xpos+j)//2:(xpos+j)//2+size0//2]
                        significant = significant or self._check_sub_chroma(
                            oc, cb, size0//2, qpC, thr)
        else:
            ref = self.get_ref(bp.ref_idx0)
            sign = 1 if ref.frame_num > self.frame_num else 0
            mvx, mvy = bp.mv_arr0[0]
            for i in range(0, size, size0):
                for j in range(0, size, size0):
                    mvx, mvy = clip_mv(mvx, mvy, ypos, xpos, self.width,
                                       self.height, size0, sign)
                    pb = K.mc_luma(ref.y, PY+ypos+i, PY+xpos+j, size0,
                                   size0, mvx, mvy, sign, eb)
                    o = self.org_y[ypos+i:ypos+i+size0, xpos+j:xpos+j+size0]
                    significant = significant or self._check_sub_luma(
                        o, pb, size0, qpY, thr)
                    for (orgp, rp) in ((self.org_u, ref.u),
                                       (self.org_v, ref.v)):
                        cb = K.mc_chroma(rp, PC+(ypos+i)//2, PC+(xpos+j)//2,
                                         size0//2, size0//2, mvx, mvy, sign)
                        oc = orgp[(ypos+i)//2:(ypos+i)//2+size0//2,
                                  (xpos+j)//2:(xpos+j)//2+size0//2]
                        significant = significant or self._check_sub_chroma(
                            oc, cb, size0//2, qpC, thr)
        return not significant

    def search_early_skip(self, w, binfo):
        """search_early_skip_candidates (enc/encode_block.c:2747-2783)."""
        from .block import BlockParam, _copy_param, cost_calc, encode_block
        min_cost = (1 << 32) - 1
        early_skip_flag = 0
        for skip_idx, c in enumerate(binfo.skip_candidates):
            tmp = BlockParam(
                tb_param=0, skip_idx=skip_idx, ref_idx0=c.ref_idx0,
                ref_idx1=c.ref_idx1, dir=c.bipred_flag,
                mv_arr0=[(c.mv0x, c.mv0y)] * 4,
                mv_arr1=[(c.mv1x, c.mv1y)] * 4)
            if self._check_early_skip_block(binfo, tmp):
                early_skip_flag = 1
                tmp.mode = MODE_SKIP
                nbit = encode_block(self, w, binfo, tmp)
                cost = cost_calc(self, binfo, nbit)
                if cost < min_cost:
                    min_cost = cost
                    binfo.block_param = _copy_param(tmp)
        return early_skip_flag

    # --- frame level ---

    def encode_frame(self, w: BitWriter):
        """enc/encode_frame.c:65-194."""
        ctx = self.encode_frame_begin(w)
        self.encode_frame_finish(w, ctx)

    def encode_frame_begin(self, w: BitWriter):
        """Frame encode through the device measurement dispatch:
        lambda + frame header, then either a full encode (host paths,
        device I frames; returns None) or the device P/B measurement
        context WITHOUT any host sync - the GOP-parallel encoder
        (parallel/encode.py) measures a whole dependency level
        concurrently before draining encode_frame_finish in coding
        order."""
        p = self.params
        self.deblock_data.reset()

        if self.frame_type == I_FRAME:
            lambda_coeff = p.lambda_coeffI
        elif self.frame_type == P_FRAME:
            lambda_coeff = p.lambda_coeffP
        else:
            lambda_coeff = [p.lambda_coeffB0, p.lambda_coeffB1,
                            p.lambda_coeffB2, p.lambda_coeffB3,
                            ][self.b_level] if self.b_level < 4 else p.lambda_coeffB
        self.lambda_ = lambda_coeff * SQUARED_LAMBDA_QP[self.frame_qp]

        w.putbits(1, int(self.frame_type != I_FRAME))
        w.putbits(8, self.frame_qp)
        w.putbits(4, self.num_intra_modes)
        if self.frame_type != I_FRAME:
            w.putbits(2, self.num_ref - 1)
        for r in self.ref_array:
            w.putbits(6, r + 1)
        w.putbits(16, self.frame_num)

        self._filters_done_on_device = False
        device_p = (p.device_encode
                    and self.frame_type in (P_FRAME, B_FRAME)
                    and self.width % 8 == 0 and self.height % 8 == 0
                    and all(self.get_ref(i) is not None
                            for i in range(self.num_ref)))
        if p.device_encode and self.frame_type == I_FRAME:
            from .device_intra import encode_intra_frame_device
            y, u, v = encode_intra_frame_device(
                self, w, self.org_y, self.org_u, self.org_v)
            self.rec_y[:], self.rec_u[:], self.rec_v[:] = y, u, v
            num_sb_ver = 0
            num_sb_hor = 0
        elif device_p:
            from .device_inter import measure_inter_frame_device
            return measure_inter_frame_device(
                self, self.org_y, self.org_u, self.org_v)
        else:
            num_sb_hor = (self.width + MAX_BLOCK_SIZE - 1) \
                // MAX_BLOCK_SIZE
            num_sb_ver = (self.height + MAX_BLOCK_SIZE - 1) \
                // MAX_BLOCK_SIZE
        for k in range(num_sb_ver):
            for l in range(num_sb_hor):
                self.reset_sb_state()
                ypos, xpos = k * MAX_BLOCK_SIZE, l * MAX_BLOCK_SIZE
                if p.max_delta_qp:
                    pos = w.save()
                    min_cost, best_qp = 1 << 30, self.frame_qp
                    for qp0 in range(self.frame_qp - p.max_delta_qp,
                                     self.frame_qp + p.max_delta_qp + 1,
                                     p.delta_qp_step):
                        cost = process_block(self, w, MAX_BLOCK_SIZE,
                                             ypos, xpos, qp0)
                        if cost < min_cost:
                            min_cost, best_qp = cost, qp0
                    w.restore(pos)
                    process_block(self, w, MAX_BLOCK_SIZE, ypos, xpos,
                                  best_qp)
                else:
                    process_block(self, w, MAX_BLOCK_SIZE, ypos, xpos,
                                  self.frame_qp)

        if p.deblocking and not self._filters_done_on_device:
            qp = self.frame_qp
            K.deblock_frame_y(self.rec_y, self.deblock_data, self.width,
                              self.height, qp, BETA_TABLE, TC_TABLE)
            K.deblock_frame_uv(self.rec_u, self.rec_v, self.deblock_data,
                               self.width, self.height,
                               int(CHROMA_QP[qp]), TC_TABLE)

        if p.clpf and not self._filters_done_on_device:
            w.putbits(1, 1)
            w.putbits(1, 0)     # sb_signal: per-SB decision bits follow
            self._clpf_frame(w)
        return None

    def encode_frame_finish(self, w: BitWriter, ctx=None):
        """Drain a staged device measurement (decision walk + final
        reconstruction + filters + emission), then apply the
        sliding-window reference update (common to every path)."""
        if ctx is not None:
            from .device_inter import finish_inter_frame_device
            y, u, v = finish_inter_frame_device(self, w, ctx)
            self.rec_y[:], self.rec_u[:], self.rec_v[:] = y, u, v
        self.refs = [RefFrame(self.rec_y.copy(), self.rec_u.copy(),
                              self.rec_v.copy(), self.frame_num)] \
            + self.refs[:-1]

    def reset_sb_state(self):
        """Per-SB ME candidate reset (enc/encode_frame.c:117-122):
        counts and masks reset, slot contents persist like the
        reference's fixed arrays."""
        for cl in self.mvcand.values():
            cl.reset()
        self.best_ref = -1

    def mvcand_for(self, ref_idx):
        from .inter import MVCandList
        if ref_idx not in self.mvcand:
            self.mvcand[ref_idx] = MVCandList()
        return self.mvcand[ref_idx]

    def _clpf_frame(self, w: BitWriter):
        """clpf_frame with encoder decision callback, fully vectorized
        (common/common_frame.c:485-557, clpf_decision
        enc/encode_frame.c:50-61, detect_clpf enc/encode_block.c:3036):
        dense whole-plane filtering + per-8x8 masked SSD reductions;
        only the raster bit emission stays serial."""
        dd = self.deblock_data
        H, W = self.height, self.width
        SBH, SBW = H // MAX_BLOCK_SIZE, W // MAX_BLOCK_SIZE
        if SBH == 0 or SBW == 0:
            return
        h8, w8 = SBH * 8, SBW * 8

        def cell8(a):
            return np.asarray(a)[::2, ::2][:h8, :w8]

        notbi = cell8(dd.mode) != MODE_BIPRED
        cy8 = (cell8(dd.cbp_y) > 0) & notbi
        cu8 = (cell8(dd.cbp_u) > 0) & notbi
        cv8 = (cell8(dd.cbp_v) > 0) & notbi
        cand8 = cy8 | cu8 | cv8
        cand_sb = cand8.reshape(SBH, 8, SBW, 8).any(axis=(1, 3))
        if not cand_sb.any():
            return

        Fy = K.clpf_plane_dense(self.rec_y, MAX_BLOCK_SIZE, W, H)
        X = self.rec_y[:h8 * 8, :w8 * 8].astype(np.int64)
        O = self.org_y[:h8 * 8, :w8 * 8].astype(np.int64)
        F = Fy[:h8 * 8, :w8 * 8].astype(np.int64)

        def blk_sums(E):
            return E.reshape(h8, 8, w8, 8).sum(axis=(1, 3))

        e0 = blk_sums((O - X) ** 2) * cy8
        e1 = blk_sums((O - F) ** 2) * cy8
        sum0 = e0.reshape(SBH, 8, SBW, 8).sum(axis=(1, 3))
        sum1 = e1.reshape(SBH, 8, SBW, 8).sum(axis=(1, 3))
        bit_sb = sum1 < sum0
        for k in range(SBH):
            for l in range(SBW):
                if cand_sb[k, l]:
                    w.putbits(1, 1 if bit_sb[k, l] else 0)

        on_sb = cand_sb & bit_sb
        if not on_sb.any():
            return
        on8 = np.repeat(np.repeat(on_sb, 8, 0), 8, 1)

        def apply(plane, mask8, b, sbs, ww, hh):
            Fp = K.clpf_plane_dense(plane, sbs, ww, hh)
            m = np.repeat(np.repeat(mask8 & on8, b, 0), b, 1)
            reg = plane[:h8 * b, :w8 * b]
            plane[:h8 * b, :w8 * b] = np.where(m, Fp[:h8 * b, :w8 * b],
                                               reg)

        apply(self.rec_y, cy8, 8, MAX_BLOCK_SIZE, W, H)
        apply(self.rec_u, cu8, 4, MAX_BLOCK_SIZE // 2, W // 2, H // 2)
        apply(self.rec_v, cv8, 4, MAX_BLOCK_SIZE // 2, W // 2, H // 2)

    # --- sequence level ---

    def encode_sequence(self, frames, out_path: str,
                        checkpoint_path: str = None,
                        checkpoint_every: int = 0,
                        resume_path: str = None):
        """Full sequence loop (enc/mainenc.c:214-604): sub-GOP reorder
        (dyadic or sequential), frame typing, QP cascade, reference-list
        construction (LDB sliding window / dyadic RA / non-dyadic HDB
        incl. interpolated-reference insertion), duplicate and
        random-access pruning, end-of-sequence PPP degradation, and
        display-order reconstruction output.

        frames: full input clip as a list of (y, u, v) (display order).
        Returns reconstructed frames in display order.

        checkpoint_path + checkpoint_every=N: snapshot the complete
        inter-frame state every N encoded frames (at sub-GOP
        boundaries). resume_path: restore such a snapshot and continue
        - the resumed stream (appended at the recorded byte offset) is
        byte-identical to an uninterrupted encode; the return value
        then covers only the newly encoded frames."""
        from ..utils.checkpoint import (save_encoder_state,
                                        load_encoder_state)
        p = self.params
        frames = list(frames)
        input_total = len(frames)
        w = BitWriter()

        if resume_path is not None:
            loop = load_encoder_state(self, resume_path)
            out = open(out_path, "r+b")
            out.truncate(loop["stream_bytes"])
            out.seek(loop["stream_bytes"])
            sub_gop = loop["sub_gop"]
            p.num_reorder_pics = loop["num_reorder_pics"]
            p.HQperiod = loop["HQperiod"]
            num_encoded = loop["num_encoded"]
            last_PorI = loop["last_PorI"]
            self.last_intra_frame_num = loop["last_intra_frame_num"]
            frame_num0 = loop["frame_num0"]
            min_interp_depth = _log2i(p.num_reorder_pics + 1) - 2
            if p.frame_rate > 30:
                min_interp_depth -= 1
        else:
            out = open(out_path, "wb")
            # Sequence header (enc/mainenc.c:195-212)
            w.putbits(16, self.width)
            w.putbits(16, self.height)
            w.putbits(1, p.enable_pb_split)
            w.putbits(1, p.enable_tb_split)
            w.putbits(2, p.max_num_ref - 1)
            w.putbits(1, p.interp_ref)
            w.putbits(3, p.max_delta_qp)
            w.putbits(1, p.deblocking)
            w.putbits(1, p.clpf)
            w.putbits(1, p.use_block_contexts)
            w.putbits(1, p.enable_bipred)

            sub_gop = max(1, p.num_reorder_pics + 1)
            min_interp_depth = _log2i(p.num_reorder_pics + 1) - 2
            if p.frame_rate > 30:
                min_interp_depth -= 1

            num_encoded = 0
            last_PorI = -1
            self.last_intra_frame_num = 0
            frame_num0 = p.skip

        rec_avail = {}
        last_output = -1 if resume_path is None \
            else frame_num0 - p.skip - 1
        display = []
        while (frame_num0 < p.skip + p.num_frames
               and frame_num0 + 1 <= input_total):
            for k in range(sub_gop):
                offset = _reorder_frame_offset(k, sub_gop, p.dyadic_coding)
                frame_num = frame_num0 + offset
                if frame_num < p.skip:
                    continue
                self.frame_num = frame_num - p.skip
                self._setup_frame(num_encoded, sub_gop, min_interp_depth,
                                  last_PorI)
                self.org_y, self.org_u, self.org_v = frames[frame_num]
                self.encode_frame(w)
                out.write(w.flush_frame())
                num_encoded += 1
                rec_avail[self.frame_num % MAX_REORDER_BUFFER] = (
                    self.rec_y.copy(), self.rec_u.copy(),
                    self.rec_v.copy())
                nxt = (last_output + 1) % MAX_REORDER_BUFFER
                if nxt in rec_avail:
                    last_output += 1
                    display.append(rec_avail.pop(nxt))
                last_PorI = 0 if self.frame_type != B_FRAME \
                    else last_PorI + 1
            # Revert to PPP when the sub-GOP no longer fits
            # (enc/mainenc.c:586-590)
            if ((frame_num0 + sub_gop + 1 > input_total
                 or frame_num0 + sub_gop >= p.skip + p.num_frames)
                    and sub_gop >= 2):
                p.HQperiod = sub_gop
                sub_gop = 1
                p.num_reorder_pics = 0
            frame_num0 += sub_gop
            if (checkpoint_path and checkpoint_every
                    and num_encoded % checkpoint_every == 0):
                out.flush()
                save_encoder_state(self, checkpoint_path, {
                    "frame_num0": frame_num0,
                    "num_encoded": num_encoded,
                    "last_PorI": last_PorI,
                    "last_intra_frame_num": self.last_intra_frame_num,
                    "sub_gop": sub_gop,
                    "num_reorder_pics": p.num_reorder_pics,
                    "HQperiod": p.HQperiod,
                    "stream_bytes": out.tell()})
        out.close()
        for i in range(1, MAX_REORDER_BUFFER + 1):
            nxt = (last_output + i) % MAX_REORDER_BUFFER
            if nxt in rec_avail:
                display.append(rec_avail.pop(nxt))
            else:
                break
        return display

    def _setup_frame(self, num_encoded, sub_gop, min_interp_depth,
                     last_PorI):
        """Frame type, QP cascade and reference-list construction
        (enc/mainenc.c:236-495)."""
        p = self.params
        fn = self.frame_num
        if p.num_reorder_pics == 0:
            if p.intra_period > 0:
                ftype = I_FRAME if num_encoded % p.intra_period == 0 \
                    else P_FRAME
            else:
                ftype = I_FRAME if num_encoded == 0 else P_FRAME
        else:
            if p.intra_period > 0:
                ftype = I_FRAME if fn % p.intra_period == 0 else (
                    P_FRAME if fn % sub_gop == 0 else B_FRAME)
            else:
                ftype = I_FRAME if fn == 0 else (
                    P_FRAME if fn % sub_gop == 0 else B_FRAME)
        self.frame_type = ftype

        coded_phase = (num_encoded + sub_gop - 2) % sub_gop + 1
        b_level = _log2i(coded_phase)
        self.b_level = b_level

        f32 = np.float32
        if ftype == I_FRAME:
            qp = p.qp + p.dqpI
            self.last_intra_frame_num = fn
        elif p.num_reorder_pics == 0:
            qp = (int(f32(p.mqpP) * f32(p.qp)) + p.dqpP
                  if num_encoded % p.HQperiod else p.qp)
        else:
            if fn % sub_gop:
                if p.dyadic_coding:
                    mqp, dqp = [(p.mqpB0, p.dqpB0), (p.mqpB1, p.dqpB1),
                                (p.mqpB2, p.dqpB2), (p.mqpB3, p.dqpB3),
                                ][b_level] if b_level < 4 \
                        else (p.mqpB, p.dqpB)
                    qp = int(f32(mqp) * f32(p.qp)) + dqp
                else:
                    qp = int(f32(p.mqpB) * f32(p.qp)) + p.dqpB
            else:
                qp = (int(f32(p.mqpP) * f32(p.qp)) + p.dqpP
                      if fn % p.HQperiod else p.qp)
        self.frame_qp = max(0, min(51, qp))

        self.num_ref = 0 if ftype == I_FRAME \
            else min(num_encoded, p.max_num_ref)
        self.interp_ref = 0
        self.interp_frame = None
        n = self.num_ref
        ref = [0] * n
        if n > 0:
            if p.num_reorder_pics > 0:
                lg = _log2i(sub_gop)
                if p.dyadic_coding:
                    if (num_encoded - 1) % sub_gop == 0:
                        ref[0] = 0 if num_encoded == 1 else sub_gop - 1
                        if n > 1:
                            ref[1] = min(MAX_REF_FRAMES - 1,
                                         min(num_encoded - 1,
                                             2 * sub_gop - 1))
                        for r in range(2, n):
                            ref[r] = r - 2
                    else:
                        display_phase = (fn - 1) % sub_gop
                        ref_offset = sub_gop >> (b_level + 1)
                        dc = _DYADIC_DC[sub_gop]
                        if b_level >= min_interp_depth and p.interp_ref:
                            if n == 2:
                                n += 1
                                ref.append(0)
                                self.num_ref = n
                            self.interp_ref = 1
                            ref[1] = min(num_encoded - 1, coded_phase
                                         - dc[display_phase - ref_offset
                                              + 1] - 1)
                            ref[2] = min(num_encoded - 1, coded_phase
                                         - dc[display_phase + ref_offset
                                              + 1] - 1)
                            ref[0] = -1
                            self._synth_interp(ref[1], ref[2], 2, 1)
                            for r in range(3, n):
                                ref[r] = r - 3
                        else:
                            ref[0] = min(num_encoded - 1, coded_phase
                                         - dc[display_phase - ref_offset
                                              + 1] - 1)
                            if n > 1:
                                ref[1] = min(num_encoded - 1, coded_phase
                                             - dc[display_phase
                                                  + ref_offset + 1] - 1)
                            for r in range(2, n):
                                ref[r] = r - 2
                else:
                    if (num_encoded - 1) % sub_gop == 0:
                        ref[0] = 0 if num_encoded == 1 else sub_gop - 1
                        if n > 1:
                            ref[1] = min(MAX_REF_FRAMES - 1,
                                         min(num_encoded - 1,
                                             2 * sub_gop - 1))
                        for r in range(2, n):
                            ref[r] = r - 1
                    else:
                        phase = (num_encoded + sub_gop - 2) % sub_gop
                        if p.interp_ref:
                            if n == 2:
                                n += 1
                                ref.append(0)
                                self.num_ref = n
                            self.interp_ref = 1
                            ref[1] = 0
                            if n > 1:
                                ref[2] = (min(sub_gop, num_encoded - 1)
                                          if phase == 0
                                          else min(phase, num_encoded - 1))
                            ref[0] = -1
                            self._synth_interp(
                                ref[1], ref[2], sub_gop - phase,
                                1 if phase != 0 else sub_gop - phase - 1)
                            if n > 2:
                                ref[3] = min(phase + sub_gop if phase
                                             else 2 * sub_gop,
                                             num_encoded - 1)
                            for r in range(4, n):
                                ref[r] = r - 4 + 1
                        else:
                            ref[0] = 0
                            if n > 1:
                                ref[1] = (min(sub_gop, num_encoded - 1)
                                          if phase == 0
                                          else min(phase, num_encoded - 1))
                            if n > 2:
                                ref[2] = min(phase + sub_gop if phase
                                             else 2 * sub_gop,
                                             num_encoded - 1)
                            for r in range(3, n):
                                ref[r] = r - 3 + 1
            else:
                # LDB sliding window (enc/mainenc.c:423-454)
                ref[0] = 0 if last_PorI < 0 else last_PorI
                if n == 2:
                    ref[1] = ((num_encoded + p.HQperiod - 2)
                              % p.HQperiod) + 1
                elif n == 3:
                    r1 = ((num_encoded + p.HQperiod - 2) % p.HQperiod) + 1
                    ref[1], ref[2] = r1, (2 if r1 == 1 else 1)
                elif n == 4:
                    r1 = ((num_encoded + p.HQperiod - 2) % p.HQperiod) + 1
                    r2 = 2 if r1 == 1 else 1
                    r3 = r2 + 1
                    if r3 == r1:
                        r3 += 1
                    ref[1], ref[2], ref[3] = r1, r2, r3
                elif n > 4:
                    for r in range(1, n):
                        ref[r] = r

        # Remove duplicates (enc/mainenc.c:457-470)
        deduped = []
        for r in ref:
            if r not in deduped:
                deduped.append(r)
        ref = deduped
        self.num_ref = len(ref)
        # Remove references breaking random access (mainenc.c:472-486)
        if fn > self.last_intra_frame_num:
            ref = [r for r in ref
                   if r < 0 or self.refs[r].frame_num
                   >= self.last_intra_frame_num]
            self.num_ref = len(ref)
        self.ref_array = ref

        if (p.intra_rdo == 0
                or (ftype != I_FRAME and p.encoder_speed > 0)):
            self.num_intra_modes = 4
        else:
            self.num_intra_modes = MAX_NUM_INTRA_MODES

    def _synth_interp(self, r1, r2, ratio, pos):
        """Interpolated-reference synthesis, identical to the decoder's
        resynthesis (common/temporal_interp.c:972-1053).

        With _defer_interp set (the GOP-parallel planner), only the
        resolved reference objects are recorded - the synthesis runs at
        frame-stage time, once the planner knows both references'
        planes are materialized."""
        ref1 = self.refs[r1]
        ref2 = self.refs[r2]
        if getattr(self, '_defer_interp', False):
            self._pending_interp = (ref1, ref2, ratio, pos)
            return
        from ..ops.temporal_interp import interpolate_frames
        y, u, v = interpolate_frames(ref1, ref2, ratio, pos)
        self.interp_frame = RefFrame(y, u, v, self.frame_num)


def _log2i(n: int) -> int:
    return n.bit_length() - 1


# Coding order <-> display order for dyadic sub-GOPs (enc/mainenc.c:48-61)
_DYADIC_CD = {1: [0], 2: [1, 0], 4: [3, 1, 0, 2],
              8: [7, 3, 1, 5, 0, 2, 4, 6],
              16: [15, 7, 3, 11, 1, 5, 9, 13, 0, 2, 4, 6, 8, 10, 12, 14]}
_DYADIC_DC = {1: [-1, 0], 2: [-2, 1, 0], 4: [-4, 2, 1, 3, 0],
              8: [-8, 4, 2, 5, 1, 6, 3, 7, 0],
              16: [-16, 8, 4, 9, 2, 10, 5, 11, 1, 12, 6, 13, 3, 14, 7, 15,
                   0]}


def _reorder_frame_offset(idx, sub_gop, dyadic):
    """enc/mainenc.c:63-71"""
    if dyadic and sub_gop > 1:
        return _DYADIC_CD[sub_gop][idx] - sub_gop + 1
    return 0 if idx == 0 else idx - sub_gop


def read_yuv_frames(path, width, height, num_frames=None,
                    file_headerlen=0, frame_headerlen=0):
    """Read frames from a planar 4:2:0 file (the whole file by default -
    the sequence loop needs the true input length for its end-of-clip
    sub-GOP degradation, enc/mainenc.c:586-590). file/frame_headerlen
    mirror -ph/-fh: a one-time file header plus a per-frame header are
    skipped (enc/mainenc.c:510)."""
    ysz, csz = width * height, (width // 2) * (height // 2)
    fsz = ysz + 2 * csz
    with open(path, "rb") as f:
        f.seek(file_headerlen)
        while num_frames is None or num_frames > 0:
            if frame_headerlen:
                f.seek(frame_headerlen, 1)
            buf = f.read(fsz)
            if len(buf) < fsz:
                return
            y = np.frombuffer(buf, np.uint8, ysz).reshape(height, width)
            u = np.frombuffer(buf, np.uint8, csz, ysz).reshape(
                height // 2, width // 2)
            v = np.frombuffer(buf, np.uint8, csz, ysz + csz).reshape(
                height // 2, width // 2)
            yield y.copy(), u.copy(), v.copy()
            if num_frames is not None:
                num_frames -= 1


def encode_file(config_path, in_path, out_path, width, height, num_frames,
                **overrides):
    params = EncoderParams.from_config_file(
        config_path, width=width, height=height, num_frames=num_frames,
        **overrides)
    enc = Encoder(params)
    frames = read_yuv_frames(in_path, width, height)
    recons = enc.encode_sequence(frames, out_path)
    return recons
