"""RD comparison: device encoder vs the exact-mirror encoder, all 15 configs.

For every shipped reference config (5 GOP scenarios x 3 complexity
points) encode the same CIF frames twice - once through the exact
mirror of the C encoder (device_encode=0; byte-identical to Thorenc,
so its RD point IS the reference's) and once through the batched
device path (device_encode=1) - then report bits and PSNR for both and
the deltas. Every device stream is also decoded with the reference
Thordec (if .oracle/Thordec exists) and must reproduce the encoder's
own reconstruction exactly.

Writes RD_TABLE.md at the repo root and prints the table.

Usage:  python tools/rd_table.py [--configs LDB_low_complexity,...]
                                 [--frames-scale S]
"""

import argparse
import hashlib
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

REF = Path("/root/reference")
ORACLE_DEC = ROOT / ".oracle" / "Thordec"

# frame counts: each family exercises its full sub-GOP (matches the
# conformance matrix in tests/test_conformance.py)
FRAMES = {"LDB": 4, "RA": 9, "HDB": 9, "RA16": 17, "HDB16": 17}


def family_of(cfg):
    return cfg.split("_")[0]


def psnr_avg(frames, recons):
    from thor_tpu.utils.snr import snr_yuv
    import numpy as np
    ys, us, vs = [], [], []
    for f, r in zip(frames, recons):
        y, u, v = snr_yuv(f, r)
        ys.append(y); us.append(u); vs.append(v)
    return float(np.mean(ys)), float(np.mean(us)), float(np.mean(vs))


def thordec_check(bit_path, recons, w, h):
    """Decode with reference Thordec; compare YUV to the encoder's own
    reconstruction. Returns 'ok', 'MISMATCH' or 'n/a'."""
    import numpy as np
    if not ORACLE_DEC.exists():
        return "n/a"
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "dec.yuv")
        r = subprocess.run([str(ORACLE_DEC), str(bit_path), out],
                           capture_output=True, timeout=600)
        if r.returncode != 0:
            return "DECODE-FAIL"
        data = np.fromfile(out, np.uint8)
    fsz = w * h * 3 // 2
    if data.size != fsz * len(recons):
        return f"SIZE({data.size // fsz}!={len(recons)})"
    for i, (y, u, v) in enumerate(recons):
        f = data[i * fsz:(i + 1) * fsz]
        got = np.concatenate([y.ravel(), u.ravel(), v.ravel()])
        if not np.array_equal(f, got):
            return f"MISMATCH@{i}"
    return "ok"


def run_one(cfg, n, yuv, w, h, device):
    from thor_tpu.enc.encoder import encode_file, read_yuv_frames
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "out.bit")
        t0 = time.perf_counter()
        recons = encode_file(str(REF / f"config_{cfg}.txt"), yuv, out,
                             w, h, n, frame_rate=60.0,
                             device_encode=1 if device else 0)
        dt = time.perf_counter() - t0
        bits = os.path.getsize(out) * 8
        frames = list(read_yuv_frames(yuv, w, h))[:len(recons)]
        py, pu, pv = psnr_avg(frames, recons)
        dec = thordec_check(out, recons, w, h) if device else "-"
        sha = hashlib.sha256(open(out, "rb").read()).hexdigest()[:12]
    return dict(bits=bits, psnr_y=py, psnr_u=pu, psnr_v=pv, dt=dt,
                thordec=dec, sha=sha, n=len(recons))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=None)
    ap.add_argument("--out", default=str(ROOT / "RD_TABLE.md"))
    args = ap.parse_args()

    all_cfgs = sorted(p.stem[len("config_"):]
                      for p in REF.glob("config_*.txt"))
    cfgs = (args.configs.split(",") if args.configs else all_cfgs)
    yuv = str(ROOT / "testdata" / "test_cif.yuv")
    w, h = 352, 288

    rows = []
    for cfg in cfgs:
        n = FRAMES[family_of(cfg)]
        mir = run_one(cfg, n, yuv, w, h, device=False)
        dev = run_one(cfg, n, yuv, w, h, device=True)
        dbits = 100.0 * (dev["bits"] - mir["bits"]) / mir["bits"]
        dpsnr = dev["psnr_y"] - mir["psnr_y"]
        rows.append((cfg, n, mir, dev, dbits, dpsnr))
        print(f"{cfg:28s} n={n:2d} mirror {mir['bits']:8d}b "
              f"{mir['psnr_y']:6.2f}dB | device {dev['bits']:8d}b "
              f"{dev['psnr_y']:6.2f}dB | {dbits:+6.2f}% bits "
              f"{dpsnr:+5.2f} dB | thordec={dev['thordec']}",
              flush=True)

    lines = [
        "# RD table: device encoder vs exact mirror (= reference Thorenc)",
        "",
        f"Input: {w}x{h} CIF (testdata/test_cif.yuv), per-family frame "
        "counts covering a full sub-GOP. The mirror encoder is "
        "byte-identical to the reference Thorenc (tests/test_conformance"
        ".py), so its RD point is the reference's. `thordec` = the "
        "device stream decoded by the reference Thordec equals the "
        "encoder's own reconstruction.",
        "",
        "| config | frames | mirror bits | mirror PSNR-Y | device bits |"
        " device PSNR-Y | bits delta | PSNR delta | thordec |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for cfg, n, mir, dev, dbits, dpsnr in rows:
        lines.append(
            f"| {cfg} | {n} | {mir['bits']} | {mir['psnr_y']:.2f} | "
            f"{dev['bits']} | {dev['psnr_y']:.2f} | {dbits:+.2f}% | "
            f"{dpsnr:+.2f} dB | {dev['thordec']} |")
    lines.append("")
    Path(args.out).write_text("\n".join(lines))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
