"""Top-level Thor decoder: stream framing, reference management, reorder.

Mirrors dec/maindec.c:91-195 + dec/decode_frame.c:45-148. The parse stage
is host-side serial; reconstruction runs through the pixel kernel path
(NumPy exact path or the batched JAX device path).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..bitstream.reader import BitReader, iter_frames
from ..codec.constants import MAX_REF_FRAMES, MAX_REORDER_BUFFER
from .parse import FrameParser, SequenceHeader
from .reconstruct_np import RefFrame, apply_clpf, reconstruct_frame


_PAD_JIT = None


def _edge_pad(p, n):
    global _PAD_JIT
    if _PAD_JIT is None:
        import jax
        import jax.numpy as jnp
        from functools import partial
        _PAD_JIT = partial(jax.jit, static_argnums=(1,))(
            lambda a, k: jnp.pad(a, k, mode="edge"))
    return _PAD_JIT(p, n)


class _DeviceRef:
    """Device-resident padded reference (the fast-path counterpart of
    RefFrame): reconstruction stays on device and the padded planes are
    produced by a jitted edge-pad, so the per-frame reference stack is a
    device-side stack with no host round trip."""

    __slots__ = ("frame_num", "y", "u", "v")

    def __init__(self, y, u, v, frame_num, padded=False):
        self.frame_num = frame_num
        if padded:          # the fused program emits codec-padded refs
            self.y, self.u, self.v = y, u, v
        else:
            self.y = _edge_pad(y, 96)
            self.u = _edge_pad(u, 48)
            self.v = _edge_pad(v, 48)


def _frame_digest(packed):
    """uint32 position-weighted checksum of the packed output plane,
    computed ON DEVICE (verification-mode decode ships 4 bytes/frame
    instead of raw YUV)."""
    from functools import lru_cache
    import jax
    import jax.numpy as jnp

    @lru_cache(maxsize=None)
    def fn(shape):
        def f(p):
            v = p.reshape(-1).astype(jnp.uint32)
            i = jnp.arange(v.shape[0], dtype=jnp.uint32)
            return jnp.sum(v * (2 * i + 1), dtype=jnp.uint32)
        return jax.jit(f)

    return fn(packed.shape)(packed)


def frame_digest_np(y, u, v):
    """Host twin of _frame_digest over (y, u, v) planes (the packed
    layout is y on top, u|v below)."""
    packed = np.vstack([y, np.hstack([u, v])])
    val = packed.reshape(-1).astype(np.uint32)
    i = np.arange(val.size, dtype=np.uint32)
    return np.uint32(np.sum(val * (2 * i + 1), dtype=np.uint32))


class _PackedFetch:
    """One device->host fetch shared by the three plane views of a
    frame. The tunnel link pays ~80 ms RTT per blocking transfer, so
    the fused program emits a single [3H/2, W] uint8 plane (Y on top,
    U|V below) and every plane view materializes from that one copy."""

    __slots__ = ("packed", "host")

    def __init__(self, packed):
        self.packed = packed
        self.host = None

    def start(self):
        if hasattr(self.packed, "copy_to_host_async"):
            self.packed.copy_to_host_async()

    def get(self):
        if self.host is None:
            self.host = np.asarray(self.packed)
            self.packed = None
        return self.host


class _PlaneView:
    """Duck-types the jax.Array surface decode_stream/np consumers use
    (__array__ / copy_to_host_async) while deferring to the shared
    packed fetch."""

    __slots__ = ("fetch", "plane", "H", "W")

    def __init__(self, fetch, plane, H, W):
        self.fetch = fetch
        self.plane = plane
        self.H = H
        self.W = W

    def copy_to_host_async(self):
        self.fetch.start()

    def __array__(self, dtype=None, copy=None):
        h = self.fetch.get()
        H, W = self.H, self.W
        a = (h[:H] if self.plane == 0 else
             h[H:, :W // 2] if self.plane == 1 else h[H:, W // 2:])
        return a.astype(dtype) if dtype is not None else a


class Decoder:
    def __init__(self, backend: str = "numpy", collect_stats: bool = False,
                 parse: str = "native"):
        self.backend = backend
        # detailed bit statistics need the instrumented Python parser
        if collect_stats:
            parse = "python"
        self.parse_mode = parse
        if parse == "native":
            try:
                from ..native import lib
                lib()
            except Exception:
                self.parse_mode = "python"
        self.seq: Optional[SequenceHeader] = None
        self.refs: List[Optional[RefFrame]] = [None] * MAX_REF_FRAMES
        self.interp_frame: Optional[RefFrame] = None
        self._jax_ctx = None
        # Lightweight bit_count_t analogue (dec/maindec.c:197-329)
        self.stats = ({"frame_type": {}, "mode": {}, "size": {},
                       "size_mode": {}, "frame_bits": {}, "cats": {},
                       "size_ref": {}, "bi_ref": {}, "super_stat": {},
                       "num_ref_max": 0,
                       "seq_header": 0} if collect_stats else None)

    def decode_stream(self, path: str, digest: bool = False):
        """Yield (y, u, v) frames in display order.

        With digest=True (native+jax pipelined path only) nothing is
        materialized to the host: each yielded item is a per-frame
        uint32 DEVICE checksum of the packed output plane
        (position-weighted sum mod 2^32), so verification runs never
        pay the raw-YUV device->host link cost (round-4 verdict, next
        item 8). frame_digest_np is the host twin for cross-checking
        against sha-validated output."""
        import os
        if (self.backend == "jax" and self.parse_mode == "native"
                and self.stats is None
                and os.environ.get("THOR_PIPELINE", "1") not in ("0", "")):
            from .reconstruct_jax import use_fused
            if use_fused():
                yield from self._decode_stream_pipelined(path, digest)
                return
        if digest:
            raise ValueError("digest mode requires the native+jax "
                             "pipelined path")
        frames = iter_frames(path)
        first = True
        reorder: dict = {}
        last_output = -1
        decoded = 0
        pending = None

        for payload in frames:
            br = BitReader(payload)
            if first:
                self.seq = SequenceHeader.read(br)
                if self.stats is not None:
                    self.stats["seq_header"] = br.pos
                self.refs = [RefFrame(
                    np.zeros((self.seq.height, self.seq.width), np.uint8),
                    np.zeros((self.seq.height // 2, self.seq.width // 2), np.uint8),
                    np.zeros((self.seq.height // 2, self.seq.width // 2), np.uint8),
                    0) for _ in range(MAX_REF_FRAMES)]
                first = False

            y, u, v, display_num = self.decode_frame(br)
            decoded += 1
            # start the device->host copy immediately (non-blocking);
            # by the time this frame is materialized a frame later the
            # bytes are already on the host side of the link
            for p in (y, u, v):
                if hasattr(p, "copy_to_host_async"):
                    p.copy_to_host_async()
            reorder[display_num % MAX_REORDER_BUFFER] = (y, u, v)
            # Materialize one frame behind the decode so the previous
            # frame's device->host transfer (started asynchronously by
            # the jax path) overlaps this frame's device compute.
            if pending is not None:
                yield tuple(np.asarray(p) for p in pending)
                pending = None
            nxt = (last_output + 1) % MAX_REORDER_BUFFER
            if nxt in reorder:
                last_output += 1
                pending = reorder.pop(nxt)

        if pending is not None:
            yield tuple(np.asarray(p) for p in pending)
        for i in range(1, MAX_REORDER_BUFFER + 1):
            nxt = (last_output + i) % MAX_REORDER_BUFFER
            if nxt in reorder:
                yield tuple(np.asarray(p) for p in reorder.pop(nxt))
            else:
                break

    def _decode_stream_pipelined(self, path: str,
                                 digest: bool = False):
        """Deep-pipelined native+fused decode (the production path).

        Three overlapped stages hide both the host work and the
        device->host transfer latency of a tunneled chip:
          - a parse thread runs the serial C entropy parse, tracking
            the reference frame-number window itself;
          - a worker pool builds the vectorized device inputs for
            parsed frames ahead of time (everything except the ref
            plane handles, which depend on in-flight dispatches);
          - the main thread inserts ref handles, dispatches the fused
            frame program, and materializes output frames
            THOR_PIPELINE_DEPTH (default 4) frames behind the dispatch
            front so each packed fetch has depth x frame-time to
            complete in the background.
        dec/maindec.c:167-195 is one serial loop; this isn't.
        """
        import os
        import queue
        import threading
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        from ..native import parse_frame
        from .native_adapter import seqhdr_from_python
        from .native_inputs import (build_frame_inputs_meta,
                                    insert_ref_planes)
        from .reconstruct_jax import _run_frame

        depth = int(os.environ.get("THOR_PIPELINE_DEPTH", "4"))
        payloads = iter_frames(path)
        first = next(payloads, None)
        if first is None:
            return
        br = BitReader(first)
        self.seq = SequenceHeader.read(br)
        seq = self.seq
        self.refs = [RefFrame(
            np.zeros((seq.height, seq.width), np.uint8),
            np.zeros((seq.height // 2, seq.width // 2), np.uint8),
            np.zeros((seq.height // 2, seq.width // 2), np.uint8),
            0) for _ in range(MAX_REF_FRAMES)]
        cs = seqhdr_from_python(seq)

        q: queue.Queue = queue.Queue(maxsize=depth + 2)
        stop = threading.Event()
        pool = ThreadPoolExecutor(max_workers=2)

        def producer():
            try:
                nums = [0] * MAX_REF_FRAMES
                payload, pos = first, br.pos
                while True:
                    nf = parse_frame(payload, pos, cs, nums)
                    fut = pool.submit(
                        build_frame_inputs_meta, nf, seq, list(nums),
                        nf.hdr.display_frame_num, seq.deblocking)
                    item = (nf, fut)
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.25)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
                    nums = [nf.hdr.display_frame_num] + nums[:-1]
                    nxt = next(payloads, None)
                    if nxt is None:
                        break
                    payload, pos = nxt, 0
                q.put(None)
            except BaseException as e:           # noqa: BLE001
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()

        reorder: dict = {}
        last_output = -1
        ready: deque = deque()
        W, H = seq.width, seq.height
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                nf, fut = item
                fh = nf.hdr
                if fh.interp_ref_frame and fh.num_ref > 2 \
                        and fh.ref_array[0] == -1:
                    self._make_interp_frame_native(fh)
                cfg, inp, slots = fut.result()
                insert_ref_planes(inp, slots, self.refs,
                                  self.interp_frame)
                yd, ud, vd, packed = _run_frame(cfg, inp)
                if digest:
                    views = _frame_digest(packed)
                else:
                    fetch = _PackedFetch(packed)
                    fetch.start()
                    views = tuple(_PlaneView(fetch, i, H, W)
                                  for i in range(3))
                self.refs = [_DeviceRef(yd, ud, vd,
                                        fh.display_frame_num,
                                        padded=True)] + self.refs[:-1]
                reorder[fh.display_frame_num % MAX_REORDER_BUFFER] = views
                while True:
                    nxt = (last_output + 1) % MAX_REORDER_BUFFER
                    if nxt not in reorder:
                        break
                    last_output += 1
                    ready.append(reorder.pop(nxt))
                while len(ready) > depth:
                    item_ = ready.popleft()
                    yield item_ if digest else tuple(
                        np.asarray(p) for p in item_)
            while ready:
                item_ = ready.popleft()
                yield item_ if digest else tuple(
                    np.asarray(p) for p in item_)
            for i in range(1, MAX_REORDER_BUFFER + 1):
                nxt = (last_output + i) % MAX_REORDER_BUFFER
                if nxt in reorder:
                    item_ = reorder.pop(nxt)
                    yield item_ if digest else tuple(
                        np.asarray(p) for p in item_)
                else:
                    break
        finally:
            stop.set()
            pool.shutdown(wait=False)

    def _make_interp_frame_native(self, fh):
        """Interp-ref resynthesis from the native frame header
        (dec/decode_frame.c:91-109).

        On real TPUs the whole pyramid runs on device by default - the
        round-5 Pallas whole-pass kernels (ops/pallas_interp.py,
        bit-exact vs the host oracle) - and the synthesized reference
        never crosses the link. THOR_DEVICE_INTERP picks the path
        explicitly: 0 = host C twin, 1 = XLA device pyramid
        (ops/device_interp.py), 2 = Pallas kernels (off-TPU implies
        interpret mode). Off-TPU the default stays the host C twin."""
        import os
        dfn = fh.display_frame_num
        r1 = self.refs[fh.ref_array[1]]
        r2 = self.refs[fh.ref_array[2]]
        off1 = r2.frame_num - dfn
        off2 = dfn - r1.frame_num
        if off1 < 0 and off2 < 0:
            off1, off2 = -off1, -off2
        if off1 == off2:
            off1 = off2 = 1

        mode = os.environ.get("THOR_DEVICE_INTERP")
        if mode is None:
            try:
                import jax
                on_tpu = jax.default_backend() == "tpu"
            except Exception:
                on_tpu = False
            # the Pallas ME kernels keep both padded pictures
            # VMEM-resident; beyond ~1440p that exceeds the 16 MB core
            # VMEM, so UHD falls back to the host C twin
            h, w = self.seq.height, self.seq.width
            fits = 2 * (h + 216) * (((w + 192) >> 7 << 7) + 384) \
                <= 14 * (1 << 20)
            mode = "2" if (on_tpu and self.backend == "jax"
                           and fits) else "0"
        if mode == "2":
            from ..ops.pallas_interp import interpolate_frames_pallas
            try:
                import jax
                interp = jax.default_backend() != "tpu"
            except Exception:
                interp = True
            out = interpolate_frames_pallas(r1, r2, off1 + off2, off2,
                                            interpret=interp)
            self.interp_frame = _DeviceRef(out[3], out[4], out[5], dfn,
                                           padded=True)
            return
        if mode == "1":
            from ..ops.device_interp import interpolate_frames_device
            out = interpolate_frames_device(r1, r2, off1 + off2, off2)
            self.interp_frame = _DeviceRef(out[3], out[4], out[5], dfn,
                                           padded=True)
            return

        from ..ops.temporal_interp import interpolate_frames

        class _HostRef:
            def __init__(self, r):
                self.frame_num = r.frame_num
                self.y = np.asarray(r.y)
                self.u = np.asarray(r.u)
                self.v = np.asarray(r.v)

        y, u, v = interpolate_frames(_HostRef(r1), _HostRef(r2),
                                     off1 + off2, off2)
        self.interp_frame = RefFrame(y, u, v, dfn)

    def decode_frame(self, br: BitReader):
        seq = self.seq
        ref_frame_nums = [r.frame_num for r in self.refs]
        if self.parse_mode == "native" and self.backend == "jax":
            # Fully vectorized fast path: C parse -> SoA -> device,
            # no per-block Python objects.
            return self._decode_frame_native_jax(br, ref_frame_nums)
        if self.parse_mode == "native":
            from .native_adapter import native_parse_to_syntax
            fs = native_parse_to_syntax(br.data, br.pos, seq,
                                        ref_frame_nums)
        else:
            parser = FrameParser(seq, br, ref_frame_nums)
            fs = parser.parse()

        if self.stats is not None:
            ft = {0: "I", 1: "P", 2: "B"}[fs.stat_frame_type]
            st = self.stats
            st["frame_type"][ft] = st["frame_type"].get(ft, 0) + 1
            st["frame_bits"][ft] = st["frame_bits"].get(ft, 0) + br.nbits
            if fs.bit_cats:
                for cat, v in fs.bit_cats.items():
                    st["cats"][(ft, cat)] = st["cats"].get((ft, cat), 0) + v
            st["num_ref_max"] = max(st["num_ref_max"], fs.num_ref)
            for b in fs.blocks:
                # counts in 8x8 units like bit_count_t (dec/maindec.c:240+)
                n8 = (b.bwidth // 8) * (b.bheight // 8)
                key = (ft, b.mode)
                st["mode"][key] = st["mode"].get(key, 0) + n8
                skey = (ft, b.size)
                st["size"][skey] = st["size"].get(skey, 0) + n8
                smkey = (ft, b.size, b.mode)
                st["size_mode"][smkey] = st["size_mode"].get(smkey, 0) + n8
                # size_and_ref_idx / bi_ref in block units
                # (dec/read_bits.c:389, :526)
                if b.mode == 2:     # MODE_INTER
                    rk = (ft, b.size, b.ref_idx0)
                    st["size_ref"][rk] = st["size_ref"].get(rk, 0) + 1
                elif b.mode == 3:   # MODE_BIPRED
                    bk = (ft, b.ref_idx0 * fs.num_ref + b.ref_idx1)
                    st["bi_ref"][bk] = st["bi_ref"].get(bk, 0) + 1
            for (sz, code) in (fs.super_stat or ()):
                sk = (ft, sz, code)
                st["super_stat"][sk] = st["super_stat"].get(sk, 0) + 1

        if fs.interp_ref_frame:
            self._make_interp_frame(fs)

        if self.backend == "jax":
            from .reconstruct_jax import reconstruct_frame_jax
            y, u, v = reconstruct_frame_jax(
                self, fs, self.refs, self.interp_frame, seq.width, seq.height,
                seq.bipred, seq.deblocking)
        else:
            y, u, v = reconstruct_frame(
                fs, self.refs, self.interp_frame, seq.width, seq.height,
                seq.bipred, seq.deblocking)
            apply_clpf(fs, y, u, v, seq.width, seq.height)

        # Sliding-window reference update (dec/decode_frame.c:135-147)
        self.refs = [RefFrame(y, u, v, fs.display_frame_num)] + self.refs[:-1]
        return y, u, v, fs.display_frame_num

    def _decode_frame_native_jax(self, br: BitReader, ref_frame_nums):
        import numpy as np
        from ..native import parse_frame
        from .native_adapter import seqhdr_from_python
        from .native_inputs import build_frame_inputs_native
        from .reconstruct_jax import _run_frame

        seq = self.seq
        cs = seqhdr_from_python(seq)
        nf = parse_frame(br.data, br.pos, cs, ref_frame_nums)
        fh = nf.hdr
        if fh.interp_ref_frame and fh.num_ref > 2 \
                and fh.ref_array[0] == -1:
            self._make_interp_frame_native(fh)
        cfg, inp = build_frame_inputs_native(
            nf, seq, self.refs, self.interp_frame, seq.deblocking)
        yd, ud, vd, packed = _run_frame(cfg, inp)
        if packed is not None:
            fetch = _PackedFetch(packed)
            W, H = seq.width, seq.height
            yout = _PlaneView(fetch, 0, H, W)
            uout = _PlaneView(fetch, 1, H, W)
            vout = _PlaneView(fetch, 2, H, W)
        else:
            yout, uout, vout = yd, ud, vd
            for a in (yd, ud, vd):
                if hasattr(a, "copy_to_host_async"):
                    a.copy_to_host_async()
        if self.stats is not None:
            ft = {0: "I", 1: "P", 2: "B"}[fh.stat_frame_type]
            st = self.stats
            st["frame_type"][ft] = st["frame_type"].get(ft, 0) + 1
            st["frame_bits"][ft] = st["frame_bits"].get(ft, 0) + br.nbits
            for m, c in zip(*np.unique(nf.mode, return_counts=True)):
                st["mode"][(ft, int(m))] = \
                    st["mode"].get((ft, int(m)), 0) + int(c)
            for sz, c in zip(*np.unique(nf.size, return_counts=True)):
                st["size"][(ft, int(sz))] = \
                    st["size"].get((ft, int(sz)), 0) + int(c)
        self.refs = [_DeviceRef(yd, ud, vd, fh.display_frame_num,
                                padded=packed is not None)] \
            + self.refs[:-1]
        return yout, uout, vout, fh.display_frame_num

    def _make_interp_frame(self, fs):
        """Re-synthesize the interpolated reference
        (dec/decode_frame.c:91-109)."""
        from ..ops.temporal_interp import interpolate_frames
        if not (fs.num_ref > 2 and fs.ref_array[0] == -1):
            return
        ref1 = self.refs[fs.ref_array[1]]
        ref2 = self.refs[fs.ref_array[2]]
        dfn = fs.display_frame_num
        off1 = ref2.frame_num - dfn
        off2 = dfn - ref1.frame_num
        if off1 < 0 and off2 < 0:
            off1, off2 = -off1, -off2
        if off1 == off2:
            off1 = off2 = 1
        y, u, v = interpolate_frames(ref1, ref2, off1 + off2, off2)
        self.interp_frame = RefFrame(y, u, v, dfn)


def decode_file(path: str, out_path: Optional[str] = None,
                backend: str = "numpy", parse: str = "native"):
    """Decode a bitstream; optionally write planar YUV output."""
    dec = Decoder(backend=backend, parse=parse)
    frames = []
    out = open(out_path, "wb") if out_path else None
    try:
        for (y, u, v) in dec.decode_stream(path):
            if out:
                out.write(y.tobytes())
                out.write(u.tobytes())
                out.write(v.tobytes())
            else:
                frames.append((y, u, v))
    finally:
        if out:
            out.close()
    return frames
