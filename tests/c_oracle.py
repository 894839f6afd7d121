"""ctypes bridge to the reference C encoder internals (.oracle/libthor.so).

Differential-testing harness: runs reference functions (motion_estimate,
search_intra_prediction_params, check_early_skip_*, process_block) on
state captured from the Python encoder, exposing internals (mvcand,
best_ref, stream bytes) that the binary oracle cannot show. Test-support
only - nothing here ships in the framework.
"""

import ctypes
import numpy as np

MAX_REF_FRAMES = 33
MAX_SKIP_FRAMES = 8
MAX_BLOCK_SIZE = 64
PAD = 96

_lib = None


def lib():
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL('/root/repo/.oracle/libthor.so')
        ctypes.c_int.in_dll(_lib, 'use_simd').value = 1
        _lib.process_block.restype = ctypes.c_int
        _lib.motion_estimate.restype = ctypes.c_int
        _lib.search_intra_prediction_params.restype = ctypes.c_int
    return _lib


u8p = ctypes.POINTER(ctypes.c_uint8)


class MV(ctypes.Structure):
    _fields_ = [('x', ctypes.c_int16), ('y', ctypes.c_int16)]


class InterPred(ctypes.Structure):
    _fields_ = [('mv0', MV), ('mv1', MV), ('ref_idx0', ctypes.c_uint32),
                ('ref_idx1', ctypes.c_uint32), ('bipred_flag', ctypes.c_uint32)]


class CBP(ctypes.Structure):
    _fields_ = [('y', ctypes.c_int), ('u', ctypes.c_int), ('v', ctypes.c_int)]


class DeblockDataC(ctypes.Structure):
    _fields_ = [('mode', ctypes.c_int), ('cbp', CBP), ('size', ctypes.c_uint8),
                ('tb_split', ctypes.c_uint8), ('pb_part', ctypes.c_int),
                ('inter_pred', InterPred)]


class BlockPos(ctypes.Structure):
    _fields_ = [('ypos', ctypes.c_uint16), ('xpos', ctypes.c_uint16),
                ('size', ctypes.c_uint8), ('bwidth', ctypes.c_uint8),
                ('bheight', ctypes.c_uint8)]


class YuvFrameC(ctypes.Structure):
    _fields_ = [('y', u8p), ('u', u8p), ('v', u8p),
                ('width', ctypes.c_int), ('height', ctypes.c_int),
                ('stride_y', ctypes.c_int), ('stride_c', ctypes.c_int),
                ('offset_y', ctypes.c_int), ('offset_c', ctypes.c_int),
                ('pad_hor_y', ctypes.c_int), ('pad_hor_c', ctypes.c_int),
                ('pad_ver_y', ctypes.c_int), ('pad_ver_c', ctypes.c_int),
                ('area_y', ctypes.c_int), ('area_c', ctypes.c_int),
                ('frame_num', ctypes.c_int)]


class StreamC(ctypes.Structure):
    _fields_ = [('bytesize', ctypes.c_uint32), ('bytepos', ctypes.c_uint32),
                ('bitstream', u8p), ('bitbuf', ctypes.c_uint32),
                ('bitrest', ctypes.c_uint32)]


class FrameInfoC(ctypes.Structure):
    _fields_ = [('frame_type', ctypes.c_int), ('qp', ctypes.c_uint8),
                ('num_ref', ctypes.c_int), ('best_ref', ctypes.c_int),
                ('ref_array', ctypes.c_int * MAX_REF_FRAMES),
                ('mvcand', (MV * 64) * MAX_REF_FRAMES),
                ('mvcand_num', ctypes.c_int * MAX_REF_FRAMES),
                ('mvcand_mask', ctypes.c_uint64 * MAX_REF_FRAMES),
                ('lambda_', ctypes.c_double),
                ('num_intra_modes', ctypes.c_int),
                ('frame_num', ctypes.c_int),
                ('interp_ref', ctypes.c_int), ('b_level', ctypes.c_int)]


class EncParamsC(ctypes.Structure):
    _fields_ = ([('width', ctypes.c_uint), ('height', ctypes.c_uint),
                 ('qp', ctypes.c_uint),
                 ('infilestr', ctypes.c_char_p), ('outfilestr', ctypes.c_char_p),
                 ('reconfilestr', ctypes.c_char_p), ('statfilestr', ctypes.c_char_p),
                 ('file_headerlen', ctypes.c_uint), ('frame_headerlen', ctypes.c_uint),
                 ('num_frames', ctypes.c_uint), ('skip', ctypes.c_int),
                 ('frame_rate', ctypes.c_float)]
                + [(n, ctypes.c_float) for n in
                   ('lambda_coeffI', 'lambda_coeffP', 'lambda_coeffB',
                    'lambda_coeffB0', 'lambda_coeffB1', 'lambda_coeffB2',
                    'lambda_coeffB3', 'early_skip_thr')]
                + [(n, ctypes.c_int) for n in
                   ('enable_tb_split', 'enable_pb_split', 'max_num_ref',
                    'HQperiod', 'num_reorder_pics', 'dyadic_coding',
                    'interp_ref', 'dqpP', 'dqpB', 'dqpB0', 'dqpB1', 'dqpB2',
                    'dqpB3')]
                + [(n, ctypes.c_float) for n in
                   ('mqpP', 'mqpB', 'mqpB0', 'mqpB1', 'mqpB2', 'mqpB3')]
                + [(n, ctypes.c_int) for n in
                   ('dqpI', 'intra_period', 'intra_rdo', 'rdoq',
                    'max_delta_qp', 'delta_qp_step', 'encoder_speed', 'sync',
                    'deblocking', 'clpf', 'snrcalc', 'use_block_contexts',
                    'enable_bipred')])


class EncoderInfoC(ctypes.Structure):
    _fields_ = [('block_info', ctypes.c_void_p),
                ('frame_info', FrameInfoC),
                ('params', ctypes.POINTER(EncParamsC)),
                ('orig', ctypes.POINTER(YuvFrameC)),
                ('rec', ctypes.POINTER(YuvFrameC)),
                ('ref', ctypes.POINTER(YuvFrameC) * MAX_REF_FRAMES),
                ('interp_frames', ctypes.POINTER(YuvFrameC) * MAX_SKIP_FRAMES),
                ('stream', ctypes.POINTER(StreamC)),
                ('deblock_data', ctypes.POINTER(DeblockDataC)),
                ('width', ctypes.c_int), ('height', ctypes.c_int),
                ('depth', ctypes.c_int)]


def wrap_frame(y, u, v, frame_num, pad=0):
    """Wrap numpy planes (optionally already padded by `pad`) into a
    yuv_frame_t. Keeps references to the arrays to pin memory."""
    fr = YuvFrameC()
    H = y.shape[0] - 2 * pad
    W = y.shape[1] - 2 * pad
    assert y.flags['C_CONTIGUOUS'] and u.flags['C_CONTIGUOUS']
    fr.stride_y = y.shape[1]
    fr.stride_c = u.shape[1]
    fr.width, fr.height = W, H
    padc = pad // 2
    fr.y = ctypes.cast(y.ctypes.data + pad * y.shape[1] + pad, u8p)
    fr.u = ctypes.cast(u.ctypes.data + padc * u.shape[1] + padc, u8p)
    fr.v = ctypes.cast(v.ctypes.data + padc * v.shape[1] + padc, u8p)
    fr.frame_num = frame_num
    fr.offset_y = pad * y.shape[1] + pad
    fr.offset_c = padc * u.shape[1] + padc
    fr.pad_hor_y = fr.pad_ver_y = pad
    fr.pad_hor_c = fr.pad_ver_c = padc
    fr.area_y = y.size
    fr.area_c = u.size
    fr._keep = (y, u, v)
    return fr


def params_from(p):
    cp = EncParamsC()
    for name, _t in EncParamsC._fields_:
        if name in ('infilestr', 'outfilestr', 'reconfilestr', 'statfilestr'):
            continue
        if hasattr(p, name):
            setattr(cp, name, getattr(p, name))
    return cp


class CEncoderState:
    """encoder_info_t assembled from a Python Encoder's current state."""

    def __init__(self, enc):
        self.keep = []
        ei = EncoderInfoC()
        self.cp = params_from(enc.params)
        ei.params = ctypes.pointer(self.cp)
        ei.width, ei.height = enc.width, enc.height

        self.orig_y = np.ascontiguousarray(enc.org_y)
        self.orig_u = np.ascontiguousarray(enc.org_u)
        self.orig_v = np.ascontiguousarray(enc.org_v)
        self.orig = wrap_frame(self.orig_y, self.orig_u, self.orig_v,
                               enc.frame_num)
        ei.orig = ctypes.pointer(self.orig)

        self.rec_y = np.ascontiguousarray(enc.rec_y.copy())
        self.rec_u = np.ascontiguousarray(enc.rec_u.copy())
        self.rec_v = np.ascontiguousarray(enc.rec_v.copy())
        self.rec = wrap_frame(self.rec_y, self.rec_u, self.rec_v,
                              enc.frame_num)
        ei.rec = ctypes.pointer(self.rec)

        self.refs = []
        for i, rf in enumerate(enc.refs):
            if rf is None:
                continue
            y = np.ascontiguousarray(rf.y)
            u = np.ascontiguousarray(rf.u)
            v = np.ascontiguousarray(rf.v)
            fr = wrap_frame(y, u, v, rf.frame_num, pad=PAD)
            self.refs.append(fr)
            ei.ref[i] = ctypes.pointer(fr)

        fi = ei.frame_info
        fi.frame_type = enc.frame_type
        fi.qp = enc.frame_qp
        fi.num_ref = enc.num_ref
        fi.best_ref = -1
        for i, r in enumerate(enc.ref_array):
            fi.ref_array[i] = r
        fi.lambda_ = enc.lambda_
        fi.num_intra_modes = enc.num_intra_modes
        fi.frame_num = enc.frame_num
        fi.interp_ref = enc.interp_ref
        fi.b_level = getattr(enc, 'b_level', 0)

        gh, gw = enc.deblock_data.gh, enc.deblock_data.gw
        self.dd = (DeblockDataC * (gh * gw))()
        self._load_dd(enc.deblock_data)
        ei.deblock_data = ctypes.cast(self.dd,
                                      ctypes.POINTER(DeblockDataC))

        self.buf = (ctypes.c_uint8 * (1 << 22))()
        self.stream = StreamC(bytesize=1 << 22, bytepos=0,
                              bitstream=ctypes.cast(self.buf, u8p),
                              bitbuf=0, bitrest=32)
        ei.stream = ctypes.pointer(self.stream)
        self.ei = ei

    def _load_dd(self, dd):
        gh, gw = dd.gh, dd.gw
        for r in range(gh):
            for c in range(gw):
                e = self.dd[r * gw + c]
                e.mode = int(dd.mode[r, c])
                e.cbp.y = int(dd.cbp_y[r, c])
                e.cbp.u = int(dd.cbp_u[r, c])
                e.cbp.v = int(dd.cbp_v[r, c])
                e.size = int(dd.size[r, c])
                e.tb_split = int(dd.tb_split[r, c])
                e.pb_part = int(dd.pb_part[r, c])
                e.inter_pred.mv0 = MV(x=int(dd.mv0x[r, c]),
                                      y=int(dd.mv0y[r, c]))
                e.inter_pred.mv1 = MV(x=int(dd.mv1x[r, c]),
                                      y=int(dd.mv1y[r, c]))
                e.inter_pred.ref_idx0 = int(dd.ref_idx0[r, c])
                e.inter_pred.ref_idx1 = int(dd.ref_idx1[r, c])
                e.inter_pred.bipred_flag = int(dd.bipred_flag[r, c])

    def reset_sb(self):
        fi = self.ei.frame_info
        for i in range(fi.num_ref):
            fi.mvcand_num[i] = 0
            fi.mvcand_mask[i] = 0
        fi.best_ref = -1

    def seed_sb_state(self, enc):
        """Copy the Python encoder's per-SB ME candidate state in."""
        fi = self.ei.frame_info
        self.reset_sb()
        for ref_idx, (lst, mask) in enc.mvcand.items():
            for i, (x, y) in enumerate(lst):
                fi.mvcand[ref_idx][i] = MV(x=x, y=y)
            fi.mvcand_num[ref_idx] = len(lst)
            fi.mvcand_mask[ref_idx] = mask
        fi.best_ref = enc.best_ref

    def process_block(self, size, ypos, xpos, qp):
        return lib().process_block(ctypes.byref(self.ei), size, ypos,
                                   xpos, qp)

    def stream_bytes(self):
        n = self.stream.bytepos
        out = bytes(self.buf[:n])
        nbits = 32 - self.stream.bitrest
        tail = self.stream.bitbuf.to_bytes(4, 'big')[: (nbits + 7) // 8]
        return out + tail

    def mvcands(self, ref_idx):
        fi = self.ei.frame_info
        return [(fi.mvcand[ref_idx][i].x, fi.mvcand[ref_idx][i].y)
                for i in range(fi.mvcand_num[ref_idx])]
