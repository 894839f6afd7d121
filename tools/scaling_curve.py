"""GOP-parallel decode scaling curve on a virtual device mesh.

Decodes a real golden bitstream through the sharded path
(thor_tpu.parallel.stream.ShardedDecoder) at increasing gop-axis mesh
sizes on the virtual 8-device CPU mesh (the same environment
`dryrun_multichip` and tests/test_parallel.py use), verifies every run
is bit-identical to the single-device decode, and prints frames/s plus
scaling efficiency vs the 1-device sharded run.

CPU-mesh absolute fps is meaningless for TPU projections - the point
is the parallel-efficiency curve of the sharded program (BASELINE.md
asks >=80% at 8 devices for GOP-parallel operation; RA dyadic GOPs
expose up to 8-frame levels).

Usage:
    python tools/scaling_curve.py [stream.bit] [mesh sizes...]
"""

import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(ROOT / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np  # noqa: E402


def main():
    # default: the 33-frame RA16 stream - two dyadic sub-GOPs, so the
    # dependency levels really contain multi-frame batches (the
    # 10-frame CIF goldens are below one sub-GOP and decode serially)
    bit = sys.argv[1] if len(sys.argv) > 1 else str(
        ROOT / "testdata" / "RA16_long.bit")
    sizes = [int(a) for a in sys.argv[2:]] or [1, 2, 4, 8]

    import jax
    # the axon TPU plugin overrides JAX_PLATFORMS; the config flag wins
    jax.config.update("jax_platforms", "cpu")
    from thor_tpu.parallel.stream import ShardedDecoder

    results = {}
    base_frames = None
    base_fps = None
    levels = None
    for g in sizes:
        dec = ShardedDecoder(gop=g, tile=1)
        frames = dec.decode_stream(bit)      # warm-up + compile
        t0 = time.perf_counter()
        frames = dec.decode_stream(bit)
        dt = time.perf_counter() - t0
        if base_frames is None:
            base_frames = frames
            base_fps = len(frames) / dt
        else:
            for a, b in zip(base_frames, frames):
                assert all(np.array_equal(x, y) for x, y in zip(a, b)), \
                    f"mesh gop={g} output differs from gop={sizes[0]}"
        levels = dec.last_level_sizes
        fps = len(frames) / dt
        # dependency-limited ceiling: with g gop-devices a level of L
        # frames takes ceil(L/g) steps
        ceil_steps = sum(-(-L // g) for L in levels)
        dep_speedup = sum(levels) / ceil_steps
        results[g] = (fps, fps / base_fps, dep_speedup)
        print(f"gop={g}: {fps:6.2f} frames/s   "
              f"speedup vs gop=1: {fps / base_fps:4.2f}x   "
              f"dependency-limited ceiling: {dep_speedup:4.2f}x")
    print(f"levels: {levels}")
    print("note: the virtual CPU mesh shares the same physical cores, "
          "so measured speedup saturates once one mesh size already "
          "uses every core; the ceiling column is what independent "
          "devices could reach given the stream's reference structure.")
    return results


if __name__ == "__main__":
    main()
