"""Device-only decode throughput on a real golden stream.

Stages every frame's production inputs on the device (including each
frame's REAL reference planes, captured from a first decode pass), then
re-dispatches all frame programs back-to-back and syncs once via a
1-byte fetch of the last output. This removes the host link from the
measurement: it is the number a non-tunneled (locally attached) chip
would sustain, the metric that matters for real deployment.

Usage: python tools/device_decode_fps.py [stream.bit] [reps]
"""

import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np

BIT = str(ROOT / "testdata" / "LDB_medium_complexity_1080.bit")
REPS = 3
if __name__ == "__main__":
    if len(sys.argv) > 1:
        BIT = sys.argv[1]
    if len(sys.argv) > 2:
        REPS = int(sys.argv[2])


def measure(bit=BIT, reps=REPS):
    import jax
    from thor_tpu.bitstream.reader import BitReader, iter_frames
    from thor_tpu.dec.decoder import Decoder, _DeviceRef
    from thor_tpu.dec import reconstruct_jax as RJ
    from thor_tpu.dec.native_inputs import build_frame_inputs_native
    from thor_tpu.native import parse_frame
    from thor_tpu.dec.native_adapter import seqhdr_from_python
    from thor_tpu.dec.parse import SequenceHeader
    from thor_tpu.codec.constants import MAX_REF_FRAMES
    from thor_tpu.dec.reconstruct_np import RefFrame

    # pass 1: real decode, capturing each frame's (cfg, device inputs)
    dec = Decoder(backend="jax", parse="native")
    staged = []
    first = True
    for payload in iter_frames(bit):
        br = BitReader(payload)
        if first:
            dec.seq = SequenceHeader.read(br)
            dec.refs = [RefFrame(
                np.zeros((dec.seq.height, dec.seq.width), np.uint8),
                np.zeros((dec.seq.height // 2, dec.seq.width // 2),
                         np.uint8),
                np.zeros((dec.seq.height // 2, dec.seq.width // 2),
                         np.uint8), 0) for _ in range(MAX_REF_FRAMES)]
            first = False
        seq = dec.seq
        cs = seqhdr_from_python(seq)
        nf = parse_frame(br.data, br.pos, cs,
                         [r.frame_num for r in dec.refs])
        cfg, inp = build_frame_inputs_native(
            nf, seq, dec.refs, dec.interp_frame, seq.deblocking)
        dinp = jax.device_put(inp)
        staged.append((cfg, dinp))
        yd, ud, vd, packed = RJ._run_frame(cfg, dinp)
        dec.refs = [_DeviceRef(yd, ud, vd, nf.hdr.display_frame_num,
                               padded=packed is not None)] \
            + dec.refs[:-1]
    # force everything resident (np.asarray is the reliable sync)
    for cfg, dinp in staged:
        jax.tree_util.tree_map(
            lambda a: a.block_until_ready() if hasattr(
                a, "block_until_ready") else a, dinp)
    n = len(staged)

    def run_all():
        out = None
        for cfg, dinp in staged:
            out = RJ._run_frame(cfg, dinp)
        # one tiny fetch syncs the whole queue (reliable through the
        # tunnel, unlike block_until_ready)
        last = out[3] if out[3] is not None else out[0]
        return np.asarray(last[:1, :1])

    run_all()                      # warm (all compiles already cached)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run_all()
        best = min(best, time.perf_counter() - t0)
    return n, best


if __name__ == "__main__":
    frames, best = measure()
    print(f"frames={frames} best={best:.3f}s "
          f"device_fps={frames / best:.2f}")
