"""Measure the host<->device link and the e2e decode bandwidth floor.

The e2e 1080p decode number is bounded by the device->host link: every
decoded frame must ship W*H*3/2 raw bytes to the host. On a tunneled
chip the link runs at tens of MB/s, so the floor - not device compute
(see tools/device_decode_fps.py) - is the e2e ceiling. This tool
measures that floor with a methodology that avoids the two traps that
contaminate naive measurements through the axon tunnel:

  * jax.Array caches its host copy: fetching the same array twice is
    free the second time. Every sample here fetches a freshly
    generated device array.
  * block_until_ready() can return before the h2d transfer completes:
    staged arrays are synced by fetching a strided scalar reduction.

Usage: python tools/link_profile.py [W H]   (default 1920 1080)
Prints one JSON line with d2h/h2d bandwidth and the implied floor fps.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def measure_link(frame_bytes: int, reps: int = 4):
    import jax
    import jax.numpy as jnp
    import numpy as np

    mk = jax.jit(lambda k, n: jax.random.randint(k, (n,), 0, 256,
                                                 jnp.uint8),
                 static_argnums=1)
    sync = jax.jit(lambda a: a[::65536].astype(jnp.int32).sum())

    n = frame_bytes
    # warmup (compiles)
    d = mk(jax.random.PRNGKey(0), n)
    float(sync(d))
    np.asarray(d)

    d2h = []
    for i in range(reps):
        d = mk(jax.random.PRNGKey(i + 1), n)
        float(sync(d))                       # materialized on device
        t0 = time.perf_counter()
        np.asarray(d)                        # fresh array: real fetch
        d2h.append(time.perf_counter() - t0)

    h2d = []
    x = np.random.randint(0, 256, (n,), np.uint8)
    float(sync(jax.device_put(x)))
    for i in range(reps):
        x = np.random.randint(0, 256, (n,), np.uint8)
        t0 = time.perf_counter()
        float(sync(jax.device_put(x)))       # scalar fetch = true sync
        h2d.append(time.perf_counter() - t0)

    best_d2h = min(d2h)
    best_h2d = min(h2d)
    return {
        "frame_bytes": frame_bytes,
        "d2h_ms": round(best_d2h * 1e3, 1),
        "d2h_MBps": round(frame_bytes / best_d2h / 1e6, 1),
        "h2d_ms": round(best_h2d * 1e3, 1),
        "link_floor_fps": round(1.0 / best_d2h, 2),
    }


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 2 else 1920
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    out = measure_link(W * H * 3 // 2)
    out["resolution"] = f"{W}x{H}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
