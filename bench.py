"""Benchmark: steady-state 1080p frame-reconstruction throughput of the
device decode program on one chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target is 1080p60 real-time (BASELINE.md north star), so
vs_baseline = fps / 60.
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    import jax
    from thor_tpu.dec.reconstruct_jax import _frame_fn
    from thor_tpu.utils.synth import build_synthetic_frame

    cfg, inp = build_synthetic_frame(W=1920, H=1080, R=2)
    inp = jax.device_put(inp)
    fn = jax.jit(partial(_frame_fn, cfg))

    import numpy as np
    import jax.numpy as jnp

    # Measure device throughput: fold the outputs into a scalar inside
    # the jitted program so each iteration syncs through a 4-byte
    # transfer (block_until_ready has been observed returning early on
    # tunneled backends, and full-frame host copies would measure link
    # bandwidth instead of the chip).
    gn = jax.jit(lambda i: sum(p.astype(jnp.int32).sum()
                               for p in fn(i)))
    _ = float(gn(inp))
    _ = float(gn(inp))

    iters = 8
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            _ = float(gn(inp))
        best = min(best, time.perf_counter() - t0)
    fps = iters / best

    print(json.dumps({
        "metric": "1080p_decode_device_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
