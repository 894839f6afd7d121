"""Production-path (fused one-jit) decode profile.

Separates, per frame of a golden stream:
  parse       host C entropy parse
  build       host numpy input building
  dispatch    enqueue of the fused program with host-resident inputs
              (includes h2d transfer enqueue)
  device      pure device execution (inputs pre-uploaded, timed with
              block_until_ready on a second run of the same frame)
  d2h         fetch of the output planes

Unlike tools/profile_decode.py (staged, per-stage syncs) this measures
the path bench.py actually runs.
"""

import os
import sys
import time
from collections import defaultdict
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np

BIT = sys.argv[1] if len(sys.argv) > 1 else str(
    ROOT / "testdata" / "LDB_medium_complexity_1080.bit")


def main():
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

    t = defaultdict(float)
    n_frames = 0
    for p in range(2):
        if p == 1:
            t.clear()
        dec = Decoder(backend="jax", parse="native")
        first = True
        for payload in iter_frames(BIT):
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
            t0 = time.perf_counter()
            cs = seqhdr_from_python(seq)
            nf = parse_frame(br.data, br.pos, cs,
                             [r.frame_num for r in dec.refs])
            t1 = time.perf_counter()
            t["parse"] += t1 - t0
            cfg, inp = build_frame_inputs_native(
                nf, seq, dec.refs, dec.interp_frame, seq.deblocking)
            t2 = time.perf_counter()
            t["build"] += t2 - t1

            # dispatch with host inputs (enqueues h2d + program)
            yd, ud, vd, packed = RJ._run_frame(cfg, inp)
            t3 = time.perf_counter()
            t["dispatch"] += t3 - t2
            yd.block_until_ready()
            ud.block_until_ready()
            vd.block_until_ready()
            t4 = time.perf_counter()
            t["wait_exec"] += t4 - t3

            # pure device time: inputs resident, re-run same program
            dinp = jax.device_put(inp)
            jax.block_until_ready(dinp)
            t5 = time.perf_counter()
            y2, u2, v2, p2 = RJ._run_frame(cfg, dinp)
            jax.block_until_ready((y2, u2, v2))
            t6 = time.perf_counter()
            t["device_only"] += t6 - t5

            if packed is not None:
                ph = np.asarray(packed)
            else:
                yh, uh, vh = (np.asarray(yd), np.asarray(ud),
                              np.asarray(vd))
            t7 = time.perf_counter()
            t["d2h"] += t7 - t6

            dec.refs = [_DeviceRef(yd, ud, vd,
                                   nf.hdr.display_frame_num,
                                   padded=packed is not None)] \
                + dec.refs[:-1]
            jax.block_until_ready(dec.refs[0].y)
            t["ref_pad"] += time.perf_counter() - t7
            if p == 1:
                n_frames += 1

    crit = sum(t[k] for k in ("parse", "build", "dispatch", "wait_exec",
                              "d2h", "ref_pad"))
    print(f"frames={n_frames} serial-critical={crit:.3f}s "
          f"({n_frames / crit:.2f} fps equivalent)")
    for k, v in sorted(t.items(), key=lambda kv: -kv[1]):
        print(f"  {k:12s} {v:8.3f}s  {v / n_frames * 1000:7.1f} ms/frame")


if __name__ == "__main__":
    main()
