"""BD-PSNR of the device encoder vs Thorenc (4-point QP sweep, CIF).

The exact-mirror encoder (device_encode=0) is byte-identical to the
reference Thorenc on every shipped config (tests/test_conformance.py),
so its RD curve IS the reference's: the Bjontegaard delta computed
here is the device encoder's BD-PSNR against Thorenc - the metric of
record in BASELINE.md. One sweep point = one (config family, QP,
encoder) CIF encode; points run in a small process pool.

Writes RD_r{N}.json at the repo root:
  {family: {"points": {...}, "bd_psnr_db": d, "bd_rate_pct": r}, ...}

Usage: python tools/bd_sweep.py [--out RD_r04.json] [--jobs 3]
       [--qps 27,32,37,42] [--families LDB,RA,HDB,RA16,HDB16]
"""

import argparse
import json
import math
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

# full-sub-GOP frame counts (tests/test_conformance.py)
FRAMES = {"LDB": 4, "RA": 9, "HDB": 9, "RA16": 17, "HDB16": 17}


def _child(cfg_name, qp, device, n):
    """Encode in a subprocess; print one JSON line with rate/PSNR."""
    code = f"""
import os, sys, json
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', r'{ROOT}/.jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
sys.path.insert(0, r'{ROOT}')
import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np
from thor_tpu.enc.encoder import EncoderParams, Encoder, read_yuv_frames
from thor_tpu.utils.snr import snr_yuv
frames = list(read_yuv_frames(r'{ROOT}/testdata/test_cif.yuv', 352, 288))[:{n}]
p = EncoderParams.from_config_file(
    '/root/reference/config_{cfg_name}.txt', width=352, height=288,
    num_frames={n}, qp={qp}, device_encode={int(device)})
enc = Encoder(p)
import tempfile
with tempfile.NamedTemporaryFile(suffix='.bit') as tf:
    recons = enc.encode_sequence(frames, tf.name)
    bits = os.path.getsize(tf.name) * 8
ys = []
for f, r in zip(frames, recons):
    ys.append(snr_yuv(f, r)[0])
kbps = p.frame_rate * bits / len(frames) / 1000.0
print(json.dumps({{'kbps': kbps, 'psnr_y': float(np.mean(ys))}}))
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=7200)
    if r.returncode != 0:
        raise RuntimeError(f"{cfg_name} qp={qp} dev={device}: "
                           + (r.stderr or "")[-400:])
    return json.loads(r.stdout.strip().splitlines()[-1])


def bd_psnr(ref_pts, test_pts):
    """Bjontegaard delta-PSNR (dB) of test vs ref: cubic fit of PSNR
    over log10(rate), integrated over the overlapping rate interval."""
    import numpy as np
    lr_r = np.log10([p[0] for p in ref_pts])
    ps_r = np.array([p[1] for p in ref_pts])
    lr_t = np.log10([p[0] for p in test_pts])
    ps_t = np.array([p[1] for p in test_pts])
    pr = np.polyfit(lr_r, ps_r, 3)
    pt = np.polyfit(lr_t, ps_t, 3)
    lo = max(lr_r.min(), lr_t.min())
    hi = min(lr_r.max(), lr_t.max())
    ir = np.polyval(np.polyint(pr), hi) - np.polyval(np.polyint(pr), lo)
    it = np.polyval(np.polyint(pt), hi) - np.polyval(np.polyint(pt), lo)
    return float((it - ir) / (hi - lo))


def bd_rate(ref_pts, test_pts):
    """Bjontegaard delta-rate (%): cubic fit of log10(rate) over PSNR."""
    import numpy as np
    lr_r = np.log10([p[0] for p in ref_pts])
    ps_r = np.array([p[1] for p in ref_pts])
    lr_t = np.log10([p[0] for p in test_pts])
    ps_t = np.array([p[1] for p in test_pts])
    pr = np.polyfit(ps_r, lr_r, 3)
    pt = np.polyfit(ps_t, lr_t, 3)
    lo = max(ps_r.min(), ps_t.min())
    hi = min(ps_r.max(), ps_t.max())
    ir = np.polyval(np.polyint(pr), hi) - np.polyval(np.polyint(pr), lo)
    it = np.polyval(np.polyint(pt), hi) - np.polyval(np.polyint(pt), lo)
    return float((10 ** ((it - ir) / (hi - lo)) - 1) * 100)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="RD_r04.json")
    ap.add_argument("--jobs", type=int, default=3)
    ap.add_argument("--qps", default="27,32,37,42")
    ap.add_argument("--families", default="LDB,RA,HDB,RA16,HDB16")
    ap.add_argument("--complexity", default="medium_complexity")
    args = ap.parse_args()
    qps = [int(q) for q in args.qps.split(",")]
    fams = args.families.split(",")

    jobs = {}
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=args.jobs) as ex:
        for fam in fams:
            cfg = f"{fam}_{args.complexity}"
            n = FRAMES[fam]
            for qp in qps:
                for dev in (0, 1):
                    jobs[(fam, qp, dev)] = ex.submit(
                        _child, cfg, qp, dev, n)
        results = {}
        for k, fut in jobs.items():
            results[k] = fut.result()
            fam, qp, dev = k
            r = results[k]
            print(f"{fam:6s} qp={qp} {'device' if dev else 'mirror'}: "
                  f"{r['kbps']:9.1f} kbps  {r['psnr_y']:.3f} dB "
                  f"[{time.time()-t0:.0f}s]", flush=True)

    out = {"qps": qps, "complexity": args.complexity,
           "input": "test_cif.yuv (CIF)", "families": {}}
    for fam in fams:
        ref = [(results[(fam, q, 0)]["kbps"],
                results[(fam, q, 0)]["psnr_y"]) for q in qps]
        test = [(results[(fam, q, 1)]["kbps"],
                 results[(fam, q, 1)]["psnr_y"]) for q in qps]
        out["families"][fam] = {
            "mirror_points": ref, "device_points": test,
            "bd_psnr_db": round(bd_psnr(ref, test), 4),
            "bd_rate_pct": round(bd_rate(ref, test), 2)}
        print(f"{fam}: BD-PSNR {out['families'][fam]['bd_psnr_db']:+.3f} dB, "
              f"BD-rate {out['families'][fam]['bd_rate_pct']:+.2f}%")
    (ROOT / args.out).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
