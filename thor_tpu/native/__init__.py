"""Native runtime: C entropy layer built on demand and bound via ctypes.

The serial VLC parse is the decoder's only inherently sequential stage;
it runs as native code (thor_entropy.c) producing the SoA parameter
planes the batched device kernels consume. Built with the system
compiler on first use and cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "thor_entropy.c"
_SRC2 = _HERE / "thor_interp.c"
_SRC3 = _HERE / "thor_decide.c"
_SO = _HERE / "_thor_entropy.so"

i32p = ctypes.POINTER(ctypes.c_int32)
i16p = ctypes.POINTER(ctypes.c_int16)
i64p = ctypes.POINTER(ctypes.c_int64)
u8p = ctypes.POINTER(ctypes.c_uint8)


class SeqHdrC(ctypes.Structure):
    _fields_ = [(n, ctypes.c_int32) for n in
                ("width", "height", "pb_split", "tb_split_enable",
                 "max_num_ref", "interp_ref", "max_delta_qp", "deblocking",
                 "clpf", "use_block_contexts", "bipred")]


class FrameHdrC(ctypes.Structure):
    _fields_ = ([(n, ctypes.c_int32) for n in
                 ("frame_type", "stat_frame_type", "qp", "num_intra_modes",
                  "num_ref")]
                + [("ref_array", ctypes.c_int32 * 8)]
                + [(n, ctypes.c_int32) for n in
                   ("interp_ref_frame", "display_frame_num",
                    "clpf_frame_enable", "clpf_all")])


_lib = None


def lib():
    global _lib
    if _lib is None:
        srcs = [_SRC, _SRC2, _SRC3]
        if (not _SO.exists()
                or any(_SO.stat().st_mtime < s.stat().st_mtime
                       for s in srcs)):
            subprocess.run(
                ["gcc", "-O2", "-shared", "-fPIC", "-o", str(_SO)]
                + [str(s) for s in srcs] + ["-lm"], check=True)
        _lib = ctypes.CDLL(str(_SO))
        _lib.thor_parse_frame.restype = ctypes.c_int
        _lib.thor_interpolate_frames.restype = None
        _lib.thor_decide_frame.restype = ctypes.c_int
        _lib.thor_emit_frame.restype = ctypes.c_long
    return _lib


class BankC(ctypes.Structure):
    _fields_ = [("qy", i16p), ("qu", i16p), ("qv", i16p),
                ("ydim", ctypes.c_int32), ("cdim", ctypes.c_int32)]


class EmitParamsC(ctypes.Structure):
    _fields_ = [(n, ctypes.c_int32) for n in
                ("W", "H", "num_ref", "enable_bipred", "interp_ref",
                 "use_block_contexts", "num_intra_modes",
                 "max_num_tb_part", "max_num_pb_part",
                 "max_delta_qp", "frame_type")] \
        + [("bitbuf", ctypes.c_uint32), ("bitrest", ctypes.c_int32)]


class DDOutC(ctypes.Structure):
    _fields_ = [(n, i32p) for n in
                ("mode", "size", "tb_split", "pb_part", "cbp_y",
                 "cbp_u", "cbp_v", "mv0x", "mv0y", "mv1x", "mv1y",
                 "ref_idx0", "ref_idx1", "bipred_flag")]


def emit_frame_native(w, enc_params, leaves, bank_row, cbp3, banks, dd):
    """Emit the decided frame's SB payload through the C writers
    (thor_decide.c's emission half) directly into the BitWriter `w`,
    and fill the DeblockData `dd` like store_deblock_data would.

    leaves: list of LeafC-compatible records; banks: 5 dicts (sizes
    8/16/32/64 coded + intra) with qy/qu/qv int16 arrays + dims."""
    n = len(leaves)
    leaf_arr = (LeafC * max(n, 1))()
    for i, l in enumerate(leaves):
        leaf_arr[i] = LeafC(
            l.ypos, l.xpos, l.size, l.mode, l.mv[0], l.mv[1], l.ref,
            l.skip_idx, l.intra_mode, 1 if l.use_cbp else 0, l.k, l.idx,
            l.mv1[0], l.mv1[1], l.ref1, l.dir, getattr(l, "tb", 0))
    keep = []

    def i16(a, shape):
        a = np.ascontiguousarray(a, np.int16)
        if a.size == 0:
            a = np.zeros(shape, np.int16)
        keep.append(a)
        return a.ctypes.data_as(i16p)

    bank_arr = (BankC * 5)()
    for i, b in enumerate(banks):
        ydim, cdim = b["ydim"], b["cdim"]
        bank_arr[i] = BankC(
            i16(b["qy"], (1, ydim, ydim)), i16(b["qu"], (1, cdim, cdim)),
            i16(b["qv"], (1, cdim, cdim)), ydim, cdim)

    p = EmitParamsC(*[int(enc_params[k]) for k in
                      ("W", "H", "num_ref", "enable_bipred",
                       "interp_ref", "use_block_contexts",
                       "num_intra_modes", "max_num_tb_part",
                       "max_num_pb_part", "max_delta_qp",
                       "frame_type")],
                    ctypes.c_uint32(w.bitbuf).value, w.bitrest)
    # the dd arrays are int32 C-contiguous numpy planes; fill in place
    ddo = DDOutC(*[getattr(dd, name).ctypes.data_as(i32p)
                   for name, _ in DDOutC._fields_])
    cap = enc_params["W"] * enc_params["H"] + (1 << 16)
    out = np.empty(cap, np.uint8)
    br = np.ascontiguousarray(np.asarray(bank_row, np.int32))
    c3 = np.ascontiguousarray(np.asarray(cbp3, np.int32))
    nb = lib().thor_emit_frame(
        ctypes.byref(p), leaf_arr, ctypes.c_int(n), _i32(br), _i32(c3),
        bank_arr, ctypes.byref(ddo), out.ctypes.data_as(u8p),
        ctypes.c_long(cap))
    w.buf += out[:nb].tobytes()
    w.bitbuf = int(p.bitbuf)
    w.bitrest = int(p.bitrest)


class SizeMeasC(ctypes.Structure):
    _fields_ = [("mvx", i32p), ("mvy", i32p), ("slot", i32p),
                ("ssd_coded", i64p), ("ssd_pred", i64p), ("bits", i32p),
                ("cbp_y", u8p), ("cbp_u", u8p), ("cbp_v", u8p),
                ("intra_cost", i64p), ("intra_mode", i32p),
                ("mvx1", i32p), ("mvy1", i32p), ("slot1", i32p),
                ("ssd_tb", i64p), ("bits_tb", i32p),
                ("cbp_tb_y", u8p), ("cbp_tb_u", u8p), ("cbp_tb_v", u8p),
                ("K", ctypes.c_int32), ("N", ctypes.c_int32),
                ("HB", ctypes.c_int32), ("WB", ctypes.c_int32),
                ("K_uni", ctypes.c_int32), ("has_tb", ctypes.c_int32)]


class LeafC(ctypes.Structure):
    _fields_ = [(n, ctypes.c_int32) for n in
                ("ypos", "xpos", "size", "mode", "mvx", "mvy", "ref",
                 "skip_idx", "intra_mode", "use_cbp", "k", "idx",
                 "mv1x", "mv1y", "ref1", "dir", "tb")]


def decide_frame_native(W, H, num_ref, enable_bipred, interp_ref,
                        use_block_contexts, frame_type, lam, lam_me,
                        per_size):
    """Run the C decision walk (thor_decide.c).

    per_size: list of 4 dicts (sizes 8,16,32,64) with contiguous
    arrays mvx/mvy/slot + mvx1/mvy1/slot1 (int32 [K,N]),
    ssd_coded/ssd_pred (int64), bits (int32), cbp_y/u/v (uint8),
    intra_cost (int64 [HB,WB]), intra_mode (int32), K_uni (int;
    variants beyond it are bipred pairs). Returns LeafC records.
    """
    meas = (SizeMeasC * 4)()
    keep = []
    for i, d in enumerate(per_size):
        def arr(key, dt):
            a = np.ascontiguousarray(d[key], dt)
            keep.append(a)
            return a
        m = meas[i]
        m.mvx = _i32(arr("mvx", np.int32))
        m.mvy = _i32(arr("mvy", np.int32))
        m.slot = _i32(arr("slot", np.int32))
        m.mvx1 = _i32(arr("mvx1", np.int32))
        m.mvy1 = _i32(arr("mvy1", np.int32))
        m.slot1 = _i32(arr("slot1", np.int32))
        m.ssd_coded = arr("ssd_coded", np.int64).ctypes.data_as(i64p)
        m.ssd_pred = arr("ssd_pred", np.int64).ctypes.data_as(i64p)
        m.bits = _i32(arr("bits", np.int32))
        m.cbp_y = arr("cbp_y", np.uint8).ctypes.data_as(u8p)
        m.cbp_u = arr("cbp_u", np.uint8).ctypes.data_as(u8p)
        m.cbp_v = arr("cbp_v", np.uint8).ctypes.data_as(u8p)
        m.intra_cost = arr("intra_cost", np.int64).ctypes.data_as(i64p)
        m.intra_mode = _i32(arr("intra_mode", np.int32))
        m.K = int(np.asarray(d["mvx"]).shape[0])
        m.N = int(np.asarray(d["mvx"]).shape[1])
        m.HB = int(np.asarray(d["intra_cost"]).shape[0])
        m.WB = int(np.asarray(d["intra_cost"]).shape[1])
        m.K_uni = int(d["K_uni"])
        if "ssd_tb" in d:
            m.ssd_tb = arr("ssd_tb", np.int64).ctypes.data_as(i64p)
            m.bits_tb = _i32(arr("bits_tb", np.int32))
            m.cbp_tb_y = arr("cbp_tb_y", np.uint8).ctypes.data_as(u8p)
            m.cbp_tb_u = arr("cbp_tb_u", np.uint8).ctypes.data_as(u8p)
            m.cbp_tb_v = arr("cbp_tb_v", np.uint8).ctypes.data_as(u8p)
            m.has_tb = 1
    maxl = (W // 8) * (H // 8 + 8)
    leaves = (LeafC * maxl)()
    n = lib().thor_decide_frame(
        ctypes.c_int(W), ctypes.c_int(H), ctypes.c_int(num_ref),
        ctypes.c_int(enable_bipred), ctypes.c_int(interp_ref),
        ctypes.c_int(use_block_contexts), ctypes.c_int(frame_type),
        ctypes.c_double(lam), ctypes.c_double(lam_me), meas, leaves)
    return leaves[:n]


def interpolate_frames_native(ref0, ref1, ratio: int, pos: int):
    """Native twin of ops/temporal_interp.interpolate_frames: takes
    RefFrame-like objects with padded planes (96/48), returns unpadded
    (y, u, v)."""
    PAD_Y, PAD_C = 96, 48
    h = ref0.y.shape[0] - 2 * PAD_Y
    w = ref0.y.shape[1] - 2 * PAD_Y

    def u8(a):
        a = np.ascontiguousarray(a, np.uint8)
        return a, a.ctypes.data_as(u8p)

    y0, y0p = u8(ref0.y)
    u0, u0p = u8(ref0.u)
    v0, v0p = u8(ref0.v)
    y1, y1p = u8(ref1.y)
    u1, u1p = u8(ref1.u)
    v1, v1p = u8(ref1.v)
    oy = np.empty((h, w), np.uint8)
    ou = np.empty((h // 2, w // 2), np.uint8)
    ov = np.empty((h // 2, w // 2), np.uint8)
    lib().thor_interpolate_frames(
        y0p, u0p, v0p, y1p, u1p, v1p,
        ctypes.c_int(w), ctypes.c_int(h), ctypes.c_int(ratio),
        ctypes.c_int(pos),
        oy.ctypes.data_as(u8p), ou.ctypes.data_as(u8p),
        ov.ctypes.data_as(u8p))
    return oy, ou, ov


def _i32(a):
    return a.ctypes.data_as(i32p)


class NativeFrame:
    """SoA result of one parsed frame."""

    __slots__ = ("hdr", "dd", "n", "ypos", "xpos", "size", "mode", "dir",
                 "ref_idx0", "ref_idx1", "intra_mode", "tb_split", "qp",
                 "cbp", "mv0x", "mv0y", "mv1x", "mv1y", "coeff_y",
                 "coeff_u", "coeff_v", "coff_y", "coff_u", "coff_v",
                 "clpf_bits")


def parse_seq_header(payload: bytes):
    s = SeqHdrC()
    bits = ctypes.c_int32(0)
    lib().thor_parse_seq_header(
        ctypes.cast(payload, u8p), len(payload), ctypes.byref(s),
        ctypes.byref(bits))
    return s, bits.value


def parse_frame(payload: bytes, start_bit: int, seq: SeqHdrC,
                ref_frame_nums) -> NativeFrame:
    W, H = seq.width, seq.height
    gh, gw = H // 4, W // 4
    cap_blocks = (W // 8) * (H // 8) + (W // 8) + (H // 8) + 8
    cap_y = W * H + 128 * 64 * 64
    cap_c = cap_y // 4 + 64 * 32 * 32

    dd = {k: np.zeros((gh, gw), np.int32) for k in
          ("mode", "size", "tb_split", "pb_part", "cbp_y", "cbp_u",
           "cbp_v", "mv0x", "mv0y", "mv1x", "mv1y", "ref_idx0",
           "ref_idx1", "bipred_flag")}
    fh = FrameHdrC()
    b = {k: np.zeros(cap_blocks, np.int32) for k in
         ("ypos", "xpos", "size", "mode", "dir", "ref0", "ref1", "imode",
          "tb", "qp", "cbp")}
    mv = {k: np.zeros(cap_blocks * 4, np.int32) for k in
          ("mv0x", "mv0y", "mv1x", "mv1y")}
    coeff_y = np.zeros(cap_y, np.int16)
    coeff_u = np.zeros(cap_c, np.int16)
    coeff_v = np.zeros(cap_c, np.int16)
    coff_y = np.zeros(cap_blocks, np.int64)
    coff_u = np.zeros(cap_blocks, np.int64)
    coff_v = np.zeros(cap_blocks, np.int64)
    clpf_bits = np.zeros(max((H // 64) * (W // 64), 1), np.int32)
    refnums = np.asarray(ref_frame_nums, np.int32)

    n = lib().thor_parse_frame(
        ctypes.cast(payload, u8p), len(payload), start_bit,
        ctypes.byref(seq), _i32(refnums),
        _i32(dd["mode"]), _i32(dd["size"]), _i32(dd["tb_split"]),
        _i32(dd["pb_part"]), _i32(dd["cbp_y"]), _i32(dd["cbp_u"]),
        _i32(dd["cbp_v"]), _i32(dd["mv0x"]), _i32(dd["mv0y"]),
        _i32(dd["mv1x"]), _i32(dd["mv1y"]), _i32(dd["ref_idx0"]),
        _i32(dd["ref_idx1"]), _i32(dd["bipred_flag"]),
        ctypes.byref(fh),
        _i32(b["ypos"]), _i32(b["xpos"]), _i32(b["size"]), _i32(b["mode"]),
        _i32(b["dir"]), _i32(b["ref0"]), _i32(b["ref1"]), _i32(b["imode"]),
        _i32(b["tb"]), _i32(b["qp"]), _i32(b["cbp"]),
        _i32(mv["mv0x"]), _i32(mv["mv0y"]), _i32(mv["mv1x"]),
        _i32(mv["mv1y"]),
        coeff_y.ctypes.data_as(i16p), coeff_u.ctypes.data_as(i16p),
        coeff_v.ctypes.data_as(i16p),
        coff_y.ctypes.data_as(i64p), coff_u.ctypes.data_as(i64p),
        coff_v.ctypes.data_as(i64p),
        _i32(clpf_bits))
    if n < 0:
        raise ValueError("native parse failed")

    nf = NativeFrame()
    nf.hdr = fh
    nf.dd = dd
    nf.n = n
    for k in ("ypos", "xpos", "size", "mode", "dir", "qp", "cbp"):
        setattr(nf, k, b[k][:n])
    nf.ref_idx0 = b["ref0"][:n]
    nf.ref_idx1 = b["ref1"][:n]
    nf.intra_mode = b["imode"][:n]
    nf.tb_split = b["tb"][:n]
    for k in ("mv0x", "mv0y", "mv1x", "mv1y"):
        setattr(nf, k, mv[k][:n * 4].reshape(n, 4))
    nf.coeff_y, nf.coeff_u, nf.coeff_v = coeff_y, coeff_u, coeff_v
    nf.coff_y, nf.coff_u, nf.coff_v = coff_y[:n], coff_u[:n], coff_v[:n]
    nf.clpf_bits = clpf_bits
    return nf
