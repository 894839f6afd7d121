"""Per-stage wall-time profile of the real-stream device decode.

Times host parse, input building, and each device stage (with an
explicit device sync after each) for every frame of a golden stream.
Perturbs pipelining, so the totals exceed bench.py's; use the per-stage
ratios, not the sums.
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
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def main():
    import jax
    import jax.numpy as jnp
    from thor_tpu.bitstream.reader import BitReader, iter_frames
    from thor_tpu.dec.decoder import Decoder, _DeviceRef
    from thor_tpu.dec import reconstruct_jax as RJ
    from thor_tpu.dec.native_inputs import build_frame_inputs_native
    from thor_tpu.native import parse_frame
    from thor_tpu.dec.native_adapter import seqhdr_from_python
    from thor_tpu.dec.parse import SequenceHeader
    from thor_tpu.ops import jax_kernels as JK

    t_stage = defaultdict(float)
    n_frames = 0

    def sync(x):
        jax.tree_util.tree_map(
            lambda a: np.asarray(a) if hasattr(a, "device") else a,
            x)

    for p in range(PASSES):
        if p == PASSES - 1:
            t_stage.clear()
        dec = Decoder(backend="jax", parse="native")
        first = True
        for payload in iter_frames(BIT):
            br = BitReader(payload)
            if first:
                dec.seq = SequenceHeader.read(br)
                from thor_tpu.codec.constants import MAX_REF_FRAMES
                from thor_tpu.dec.reconstruct_np import RefFrame
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
            t_stage["parse"] += t1 - t0

            cfg, inp = build_frame_inputs_native(
                nf, seq, dec.refs, dec.interp_frame, seq.deblocking)
            t2 = time.perf_counter()
            t_stage["build_inputs"] += t2 - t1

            # staged execution with syncs
            H, W = cfg.H, cfg.W
            Hc, Wc = H // 2, W // 2
            ry = jnp.zeros((H, W), jnp.int32)
            rc = jnp.zeros((2, Hc, Wc), jnp.int32)
            for s, _ in cfg.groups_y:
                g = inp[f'gy{s}']
                ry = RJ._jit_resid_y(s)(ry, g['coeff'], g['f'], g['a'],
                                        g['sh'], g['y'], g['x'])
            for s, _ in cfg.groups_c:
                g = inp[f'gc{s}']
                rc = RJ._jit_resid_c(s)(rc, g['coeff'], g['f'], g['a'],
                                        g['sh'], g['y'], g['x'], g['pl'])
            ry.block_until_ready()
            _ = np.asarray(ry[0, 0])
            t3 = time.perf_counter()
            t_stage["residual"] += t3 - t2

            if cfg.R > 0:
                y, u, v = RJ._jit_mc(
                    H, W, cfg.bipred_filter, cfg.has_bi)(
                    inp['refY'], inp['refU'], inp['refV'],
                    inp['mv0x'], inp['mv0y'], inp['mv1x'],
                    inp['mv1y'], inp['slot0'], inp['slot1'],
                    inp['use_bi'], ry, rc)
            else:
                y = jnp.zeros((H, W), jnp.int32)
                u = jnp.zeros((Hc, Wc), jnp.int32)
                v = jnp.zeros((Hc, Wc), jnp.int32)
            _ = np.asarray(y[0, 0])
            t4 = time.perf_counter()
            t_stage["mc"] += t4 - t3

            if cfg.n_intra_y:
                wy = JK.schedule_wavefront(inp['tuy'])
                t4b = time.perf_counter()
                t_stage["wavefront_sched"] += t4b - t4
                y = RJ._jit_intra_y(H, W)(y, ry, wy)
                _ = np.asarray(y[0, 0])
                t4c = time.perf_counter()
                t_stage["intra_y"] += t4c - t4b
            if cfg.n_intra_c:
                t4c = time.perf_counter()
                wc_ = JK.schedule_wavefront(inp['tuc'])
                t4d = time.perf_counter()
                t_stage["wavefront_sched"] += t4d - t4c
                u, v = RJ._jit_intra_c(H, W)(u, v, rc, wc_)
                _ = np.asarray(u[0, 0])
                t_stage["intra_c"] += time.perf_counter() - t4d
            t5 = time.perf_counter()

            zero = np.int32(0)
            zmask = np.zeros((1, 1), bool)
            yd, ud, vd = RJ._jit_filters(H, W, cfg.deblocking, cfg.clpf)(
                y, u, v,
                inp.get('ddp', np.zeros((1, 1), np.uint8)),
                inp.get('beta', zero),
                inp.get('tc', zero), inp.get('tcC', zero),
                inp.get('m8y', zmask), inp.get('m8u', zmask),
                inp.get('m8v', zmask))
            _ = np.asarray(yd[0, 0])
            t6 = time.perf_counter()
            t_stage["filters"] += t6 - t5

            yh, uh, vh = np.asarray(yd), np.asarray(ud), np.asarray(vd)
            t7 = time.perf_counter()
            t_stage["d2h"] += t7 - t6

            dec.refs = [_DeviceRef(yd, ud, vd, nf.hdr.display_frame_num)] \
                + dec.refs[:-1]
            _ = np.asarray(dec.refs[0].y[0, 0])
            t_stage["ref_pad"] += time.perf_counter() - t7
            if p == PASSES - 1:
                n_frames += 1

    tot = sum(t_stage.values())
    print(f"frames={n_frames} total={tot:.3f}s "
          f"({n_frames / tot:.2f} fps staged)")
    for k, v in sorted(t_stage.items(), key=lambda kv: -kv[1]):
        print(f"  {k:16s} {v:8.3f}s  {100 * v / tot:5.1f}%")


if __name__ == "__main__":
    main()
