"""Benchmark: end-to-end 1080p decode throughput on one chip.

Decodes the committed 17-frame LDB_medium_complexity 1080p golden
bitstream (testdata/LDB_medium_complexity_1080.bit) through the full
production path - native C entropy parse on the host, batched XLA/Pallas
reconstruction on the device, including the intra wavefront, deblocking
and CLPF - and verifies the output SHA-256 against the committed
reference-Thordec hash, so the number cannot silently exclude any stage.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline target is 1080p60 real-time (BASELINE.md north star), so
vs_baseline = fps / 60. Secondary numbers (synthetic inter-only device
microbench, encode fps when available) ride along as extra keys in the
same object.
"""

import hashlib
import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(ROOT))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

BIT = ROOT / "testdata" / "LDB_medium_complexity_1080.bit"
SHA = ROOT / "testdata" / "LDB_medium_complexity_1080_dec.sha256"


def decode_once(collect=False):
    from thor_tpu.dec.decoder import Decoder

    dec = Decoder(backend="jax", parse="native")
    h = hashlib.sha256() if collect else None
    n = 0
    for (y, u, v) in dec.decode_stream(str(BIT)):
        n += 1
        if collect:
            h.update(y.tobytes())
            h.update(u.tobytes())
            h.update(v.tobytes())
    return n, (h.hexdigest() if collect else None)


def synthetic_device_fps():
    """Secondary: steady-state synthetic inter-only device microbench
    (the round-1 metric, kept for continuity)."""
    from functools import partial

    import jax
    import jax.numpy as jnp
    from thor_tpu.dec.reconstruct_jax import _frame_fn
    from thor_tpu.utils.synth import build_synthetic_frame

    cfg, inp = build_synthetic_frame(W=1920, H=1080, R=2)
    inp = jax.device_put(inp)
    fn = jax.jit(partial(_frame_fn, cfg))
    gn = jax.jit(lambda i: sum(p.astype(jnp.int32).sum() for p in fn(i)))
    _ = float(gn(inp))
    _ = float(gn(inp))
    iters = 8
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            _ = float(gn(inp))
        best = min(best, time.perf_counter() - t0)
    return iters / best


def encode_fps_1080(n_frames=6):
    """Secondary: 1080p device-encode throughput (LDB low complexity,
    batched device ME + trial RDO P-frames, exact host syntax).

    Encodes the same frames twice in one process: the first pass pays
    every program compile, the second reuses them all and is the
    reported steady-state number."""
    import subprocess

    yuv = ROOT / "testdata" / "test_1080.yuv"
    if not yuv.exists():
        subprocess.run([sys.executable, "gen_input_1080.py"],
                       cwd=ROOT / "testdata", check=True)
    from thor_tpu.enc.encoder import (EncoderParams, Encoder,
                                      read_yuv_frames)
    frames = list(read_yuv_frames(str(yuv), 1920, 1080))[:n_frames]

    def run():
        p = EncoderParams.from_config_file(
            "/root/reference/config_LDB_low_complexity.txt",
            width=1920, height=1080, num_frames=len(frames),
            device_encode=1)
        enc = Encoder(p)
        t0 = time.perf_counter()
        enc.encode_sequence(frames, os.devnull)
        return len(frames) / (time.perf_counter() - t0)

    run()
    return run()


def main():
    # warmup pass: compiles every frame-shape class (cached across runs
    # via the persistent compilation cache) and checks bit-exactness.
    n, digest = decode_once(collect=True)
    want = SHA.read_text().split()[0]
    exact = digest == want

    t0 = time.perf_counter()
    n2, _ = decode_once(collect=False)
    dt = time.perf_counter() - t0
    fps = n2 / dt

    try:
        synth = round(synthetic_device_fps(), 2)
    except Exception:
        synth = None

    enc_fps = None
    if os.environ.get("THOR_BENCH_ENCODE", "1") != "0":
        try:
            enc_fps = round(encode_fps_1080(), 2)
        except Exception:
            enc_fps = None

    print(json.dumps({
        "metric": "1080p_decode_e2e_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 3),
        "bit_exact": exact,
        "frames": n2,
        "synthetic_inter_device_fps": synth,
        "1080p_device_encode_fps": enc_fps,
    }))


if __name__ == "__main__":
    main()
