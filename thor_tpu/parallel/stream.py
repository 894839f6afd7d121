"""Sharded decode of real bitstreams over a gop x tile device mesh.

The serial entropy parse stays on the host (one pass, in decode order);
reconstruction is scheduled in *dependency levels*: every frame whose
references (and interpolated-reference sources) are already
reconstructed joins the current level, the level's frame inputs are
padded to one common FrameConfig, and the whole level runs as a single
sharded batch - frames across the 'gop' mesh axis, frame rows across
'tile' (halo exchanges inserted by the XLA SPMD partitioner, see
parallel/mesh.py).

For hierarchical-B streams (RA/RA16/HDB) the B levels give gop-axis
batches of 2..8 frames; low-delay chains degrade gracefully to
tile-only sharding. This is the codec counterpart of DP x SP
decomposition: no counterpart exists in the single-threaded reference
(SURVEY.md §2.5) - the structure is introduced TPU-first.
"""

from __future__ import annotations

import numpy as np

from ..bitstream.reader import BitReader, iter_frames
from ..codec.constants import (MAX_REF_FRAMES, MAX_REORDER_BUFFER,
                               MODE_INTRA)
from ..dec.parse import FrameParser, SequenceHeader
from ..dec.reconstruct_np import RefFrame
from ..dec.reconstruct_jax import FrameConfig, build_frame_inputs
from .mesh import make_decode_mesh, sharded_reconstruct


class _Placeholder:
    """Identity of a not-yet-reconstructed reference in the sliding
    window (frame_num + the decode index that will produce it)."""

    __slots__ = ("frame_num", "producer")

    def __init__(self, frame_num, producer):
        self.frame_num = frame_num
        self.producer = producer


def _pad0(a, n, fill=0):
    """Pad axis 0 of a to length n with a constant."""
    if a.shape[0] == n:
        return a
    pad = np.full((n - a.shape[0],) + a.shape[1:], fill, a.dtype)
    return np.concatenate([a, pad])


_GROUP_FILL = {'f': 1, 'sh': 1}
_INTRA_FILL = {'size': 4, 'toplen': 4, 'leftlen': 4}


def _unify_level(cfg_inps):
    """Pad a level's per-frame (cfg, inp) pairs to one common config and
    stack along a leading batch axis."""
    cfgs = [c for c, _ in cfg_inps]
    base = cfgs[0]
    Rmax = max(c.R for c in cfgs)
    gy, gc = {}, {}
    for c in cfgs:
        for s, npad in c.groups_y:
            gy[s] = max(gy.get(s, 0), npad)
        for s, npad in c.groups_c:
            gc[s] = max(gc.get(s, 0), npad)
    n_iy = max(c.n_intra_y for c in cfgs)
    n_ic = max(c.n_intra_c for c in cfgs)
    cfg = FrameConfig(
        W=base.W, H=base.H, R=Rmax, bipred_filter=base.bipred_filter,
        has_bi=any(c.has_bi for c in cfgs),
        deblocking=base.deblocking, clpf=base.clpf,
        groups_y=tuple(sorted(gy.items())),
        groups_c=tuple(sorted(gc.items())),
        n_intra_y=n_iy, n_intra_c=n_ic)

    outs = []
    for c, inp in cfg_inps:
        e = dict(inp)
        if Rmax and 'refY' in e:
            for k in ('refY', 'refU', 'refV'):
                r = e[k]
                if r.shape[0] < Rmax:
                    e[k] = np.concatenate(
                        [r] + [r[:1]] * (Rmax - r.shape[0]))
        elif Rmax:
            # an I-frame inside a level (no references parsed): give it
            # dummy reference planes + zero MV fields; its MC output is
            # fully overwritten by the intra scan.
            H, W = base.H, base.W
            pad, padc = 96, 48
            e['refY'] = np.zeros((Rmax, H + 2 * pad, W + 2 * pad),
                                 np.uint8)
            e['refU'] = np.zeros(
                (Rmax, H // 2 + 2 * padc, W // 2 + 2 * padc), np.uint8)
            e['refV'] = np.zeros_like(e['refU'])
            z4 = np.zeros((H // 4, W // 4), np.int32)
            for k in ('mv0x', 'mv0y', 'mv1x', 'mv1y', 'slot0', 'slot1'):
                e[k] = z4
            e['use_bi'] = z4 != 0
        present_y = dict(c.groups_y)
        for s, npad in cfg.groups_y:
            key = f'gy{s}'
            if s in present_y:
                e[key] = {k: _pad0(v, npad, _GROUP_FILL.get(k, 0))
                          for k, v in e[key].items()}
            else:
                sz = 32 if s == 64 else s
                e[key] = {
                    'coeff': np.zeros((npad, sz, sz), np.int16),
                    'y': np.zeros(npad, np.int32),
                    'x': np.zeros(npad, np.int32),
                    'f': np.ones(npad, np.int32),
                    'a': np.zeros(npad, np.int32),
                    'sh': np.ones(npad, np.int32)}
        present_c = dict(c.groups_c)
        for s, npad in cfg.groups_c:
            key = f'gc{s}'
            if s in present_c:
                e[key] = {k: _pad0(v, npad, _GROUP_FILL.get(k, 0))
                          for k, v in e[key].items()}
            else:
                e[key] = {
                    'coeff': np.zeros((npad, s, s), np.int16),
                    'y': np.zeros(npad, np.int32),
                    'x': np.zeros(npad, np.int32),
                    'f': np.ones(npad, np.int32),
                    'a': np.zeros(npad, np.int32),
                    'sh': np.ones(npad, np.int32),
                    'pl': np.zeros(npad, np.int32)}
        e['tuy'] = {k: _pad0(v, n_iy, _INTRA_FILL.get(k, 0))
                    for k, v in e['tuy'].items()}
        e['tuc'] = {k: _pad0(v, n_ic, _INTRA_FILL.get(k, 0))
                    for k, v in e['tuc'].items()}
        outs.append(e)

    import jax
    binp = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *outs)
    return cfg, binp


class ShardedDecoder:
    """Parse-then-batch decoder: see module docstring."""

    def __init__(self, mesh=None, gop: int = 0, tile: int = 0,
                 devices=None, parse: str = "native",
                 lookahead: int = 32):
        self.mesh = mesh if mesh is not None else make_decode_mesh(
            devices, gop=gop, tile=tile)
        self.parse_mode = parse
        if parse == "native":
            try:
                from ..native import lib
                lib()
            except Exception:
                self.parse_mode = "python"
        #: how many frames the serial parse runs ahead of
        #: reconstruction (bounds memory for long streams; must cover
        #: at least one full sub-GOP to expose the B levels)
        self.lookahead = lookahead

    def _parse_frame(self, seq, br, ref_frame_nums):
        if self.parse_mode == "native":
            from ..dec.native_adapter import native_parse_to_syntax
            return native_parse_to_syntax(br.data, br.pos, seq,
                                          ref_frame_nums)
        parser = FrameParser(seq, br, ref_frame_nums)
        return parser.parse()

    def decode_stream(self, path: str):
        """Decode a full stream; returns frames in display order
        (list wrapper over the streaming generator)."""
        return list(self.iter_frames(path))

    def iter_frames(self, path: str):
        """Streaming decode: yields (y, u, v) in display order.

        The serial entropy parse (native C) runs `lookahead` frames
        ahead of reconstruction; dependency levels are scheduled over
        the parsed-but-pending window and reconstructed planes are
        released once outside every future frame's 33-deep reference
        window - memory stays bounded for arbitrarily long streams."""
        seq = None
        refs = None
        payloads = iter_frames(path)
        parsed = {}     # decode index -> entry (pending window)
        produced = {}
        done = {}
        recon = {}
        n_parsed = 0
        eos = False
        self._levels = []
        self.last_level_sizes = self._levels
        reorder = {}
        last_output = -1
        yielded_upto = -1

        def used_slots(fs):
            """Reference slots any block actually reads. Thor's RA
            reference lists always include the previously decoded frame
            even when no block selects it, which would falsely
            serialize the whole stream; the exact per-block ref indices
            are already parsed, so the dependency graph uses them."""
            used = set()
            for b in fs.blocks:
                if b.mode == MODE_INTRA:
                    continue
                # every non-intra mode reads ref_idx0 (dir -1, from an
                # intra-derived merge candidate, reconstructs as
                # unidirectional L0 - reconstruct_np's else branch);
                # ref_idx1 only under bidirectional dir == 2
                used.add(b.ref_idx0)
                if getattr(b, 'dir', 0) == 2:
                    used.add(b.ref_idx1)
            return used

        def deps(i):
            ent = parsed[i]
            fs = ent['fs']
            if 'deps_cache' not in ent:
                srcs = []
                for slot in used_slots(fs):
                    if slot < len(fs.ref_array) and fs.ref_array[slot] >= 0:
                        srcs.append(ent['refs_window'][fs.ref_array[slot]])
                if ent['interp_pair']:
                    # resynthesis needs the pair whether or not a block
                    # selects the interpolated slot
                    srcs.extend(ent['interp_pair'])
                ent['deps_cache'] = srcs
            return ent['deps_cache']

        def ready(i):
            return all(getattr(s, 'producer', None) is None
                       or produced.get(s.producer, False)
                       for s in deps(i))

        def parse_more():
            nonlocal seq, refs, n_parsed, eos
            while not eos and n_parsed - len(done) < self.lookahead:
                payload = next(payloads, None)
                if payload is None:
                    eos = True
                    return
                br = BitReader(payload)
                if seq is None:
                    # the first length-prefixed payload carries the
                    # sequence header AND the first frame
                    seq = SequenceHeader.read(br)
                    z = lambda: np.zeros((seq.height, seq.width),
                                         np.uint8)
                    zc = lambda: np.zeros(
                        (seq.height // 2, seq.width // 2), np.uint8)
                    refs = [RefFrame(z(), zc(), zc(), 0)
                            for _ in range(MAX_REF_FRAMES)]
                fs = self._parse_frame(seq, br,
                                       [r.frame_num for r in refs])
                entry = {'fs': fs, 'interp_pair': None}
                if fs.interp_ref_frame and fs.num_ref > 2 \
                        and fs.ref_array[0] == -1:
                    entry['interp_pair'] = (refs[fs.ref_array[1]],
                                            refs[fs.ref_array[2]])
                entry['refs_window'] = list(refs)
                parsed[n_parsed] = entry
                ph = _Placeholder(fs.display_frame_num, n_parsed)
                refs = [ph] + refs[:-1]
                n_parsed += 1

        import os as _os
        # debug knob: bound the batch width (1 = no batching) to
        # bisect level-batching issues from dependency issues
        _chunk = int(_os.environ.get("THOR_LEVEL_CHUNK", "0") or 0)

        while True:
            parse_more()
            pend = [i for i in sorted(parsed) if not done.get(i)]
            if not pend:
                break
            level = [i for i in pend if ready(i)]
            assert level, "dependency cycle in reference structure"
            if _chunk:
                level = level[:_chunk]
            self._levels.append(len(level))
            cfg_inps = []
            for i in level:
                ent = parsed[i]
                fs = ent['fs']

                def resolve(r):
                    if getattr(r, 'producer', None) is not None:
                        if not produced.get(r.producer, False):
                            # listed but unused by any block (see
                            # used_slots): its pixels are never read,
                            # a zero frame keeps the batch shape
                            z = np.zeros((seq.height, seq.width),
                                         np.uint8)
                            zc = np.zeros((seq.height // 2,
                                           seq.width // 2), np.uint8)
                            return RefFrame(z, zc, zc, r.frame_num)
                        y, u, v = recon[r.producer]
                        return RefFrame(y, u, v, r.frame_num)
                    return r
                window = [resolve(r) for r in ent['refs_window']]
                interp = None
                if ent['interp_pair']:
                    from ..ops.temporal_interp import interpolate_frames
                    r1 = resolve(ent['interp_pair'][0])
                    r2 = resolve(ent['interp_pair'][1])
                    dfn = fs.display_frame_num
                    off1 = r2.frame_num - dfn
                    off2 = dfn - r1.frame_num
                    if off1 < 0 and off2 < 0:
                        off1, off2 = -off1, -off2
                    if off1 == off2:
                        off1 = off2 = 1
                    y, u, v = interpolate_frames(r1, r2, off1 + off2,
                                                 off2)
                    interp = RefFrame(y, u, v, dfn)
                cfg_inps.append(build_frame_inputs(
                    fs, window, interp, seq.width, seq.height, seq,
                    seq.deblocking))
            # pad the batch to a multiple of the gop axis (replicated
            # frames; their outputs are discarded)
            gop_axis = self.mesh.devices.shape[0]
            while len(cfg_inps) % gop_axis:
                cfg_inps.append(cfg_inps[-1])
            cfg, binp = _unify_level(cfg_inps)
            yb, ub, vb = sharded_reconstruct(self.mesh, cfg, binp)
            from .mesh import fetch_to_host
            yb, ub, vb = (fetch_to_host(yb), fetch_to_host(ub),
                          fetch_to_host(vb))
            for j, i in enumerate(level):
                recon[i] = (yb[j].astype(np.uint8),
                            ub[j].astype(np.uint8),
                            vb[j].astype(np.uint8))
                produced[i] = True
                done[i] = True
                reorder[parsed[i]['fs'].display_frame_num
                        % MAX_REORDER_BUFFER] = i

            # display-order output (dec/maindec.c:176-195)
            while True:
                nxt = (last_output + 1) % MAX_REORDER_BUFFER
                if nxt not in reorder:
                    break
                last_output += 1
                i = reorder.pop(nxt)
                yielded_upto = max(yielded_upto, i)
                yield recon[i]

            # release: a reconstructed frame can still be referenced
            # while inside any future frame's 33-deep sliding window;
            # once every pending/unparsed frame's window excludes it
            # AND it has been yielded, drop it (bounded memory)
            floor = min(pend) if pend else n_parsed
            held = set(reorder.values())
            for i in [k for k in recon
                      if k < min(floor, yielded_upto + 1) - MAX_REF_FRAMES
                      and k not in held]:
                del recon[i]
                del parsed[i]

        # tail of the reorder buffer
        for k in range(1, MAX_REORDER_BUFFER + 1):
            nxt = (last_output + k) % MAX_REORDER_BUFFER
            if nxt in reorder:
                yield recon[reorder.pop(nxt)]
            else:
                break
