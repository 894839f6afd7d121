"""4K (UHD) device-encode artifact - BASELINE.md config 5's geometry.

Runs a short RA 4K device encode on the attached chip, checks the
stream decodes bit-exactly to the encoder's reconstruction, replays
the pure device pipeline for a device-only throughput number, and
writes FOURK_r05.json. The GOP axis of the same encode is covered by
the ShardedEncoder byte-identity tests; this measures the single-chip
4K operating point those shards run at.

Run: python tools/encode_4k.py [n_frames] [config]
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

W, H = 3840, 2160


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cfg = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/reference/config_RA_low_complexity.txt"
    yuv = ROOT / "testdata" / "test_4k.yuv"
    if not yuv.exists():
        subprocess.run([sys.executable, "gen_input_4k.py"],
                       cwd=ROOT / "testdata", check=True)

    from thor_tpu.enc.encoder import (EncoderParams, Encoder,
                                      read_yuv_frames)
    from thor_tpu.enc.device_inter import replay_device_frame
    from thor_tpu.dec.decoder import decode_file

    frames = list(read_yuv_frames(str(yuv), W, H))[:n]
    p = EncoderParams.from_config_file(
        cfg, width=W, height=H, num_frames=len(frames), device_encode=1)
    enc = Encoder(p)
    enc._device_record = []
    bit = "/tmp/enc_4k.bit"
    t0 = time.perf_counter()
    recons = enc.encode_sequence(frames, bit)
    e2e = time.perf_counter() - t0

    dec = decode_file(bit, backend="jax")
    ok = all(np.array_equal(a, b)
             for r, d in zip(recons, dec) for a, b in zip(r, d))

    best = float("inf")
    nf = len(enc._device_record)
    if nf:
        for _ in range(2):
            refstate = {}
            t0 = time.perf_counter()
            last = None
            for rec in enc._device_record:
                last = replay_device_frame(rec, refstate)
            np.asarray(last)
            best = min(best, time.perf_counter() - t0)
    out = {
        "config": os.path.basename(cfg), "width": W, "height": H,
        "frames": len(frames), "bit_exact_roundtrip": bool(ok),
        "stream_bytes": os.path.getsize(bit),
        "encode_e2e_fps": round(len(frames) / e2e, 3),
        "encode_device_fps": (round(nf / best, 3) if nf else None),
        "note": "single-chip 4K operating point; GOP-parallel sharding "
                "of the same encode is byte-identity-tested in "
                "tests/test_parallel_encode.py",
    }
    (ROOT / "FOURK_r05.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
