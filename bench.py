"""Benchmark: end-to-end 1080p decode/encode throughput on one chip.

Decodes the committed 17-frame LDB_medium_complexity 1080p golden
bitstream (testdata/LDB_medium_complexity_1080.bit) through the full
production path - native C entropy parse on the host, batched XLA/Pallas
reconstruction on the device, including the intra wavefront, deblocking
and CLPF - and verifies the output SHA-256 against the committed
reference-Thordec hash, so the number cannot silently exclude any stage.

Hardened after round 2 (BENCH_r02 rc=1: the axon TPU tunnel was down and
the first jax.default_backend() call raised through the bench): the
parent process never imports jax. It probes the backend in a subprocess
with a timeout and retries with backoff; if the TPU cannot be brought up
it falls back to JAX_PLATFORMS=cpu so the bench still produces real
(slower) numbers, and it ALWAYS prints exactly one JSON line - with an
"error" field describing any degradation - and exits 0.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline target is 1080p60 real-time (BASELINE.md north star), so
vs_baseline = fps / 60. Secondary numbers (synthetic inter-only device
microbench, device-encode fps) ride along as extra keys.
"""

import hashlib
import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(ROOT))

BIT = ROOT / "testdata" / "LDB_medium_complexity_1080.bit"
SHA = ROOT / "testdata" / "LDB_medium_complexity_1080_dec.sha256"

CACHE_ENV = {
    "JAX_COMPILATION_CACHE_DIR": str(ROOT / ".jax_cache"),
    "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "1",
    "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES": "0",
}


# ---------------------------------------------------------------------------
# child workloads (run in subprocesses; each prints one JSON line)
# ---------------------------------------------------------------------------

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


def child_probe():
    import jax
    dev = jax.devices()[0]
    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(dev.device_kind)}))


def child_decode():
    # warmup pass compiles every frame-shape class (cached across runs
    # via the persistent compilation cache) and checks bit-exactness.
    n, digest = decode_once(collect=True)
    want = SHA.read_text().split()[0]
    t0 = time.perf_counter()
    n2, _ = decode_once(collect=False)
    dt = time.perf_counter() - t0
    print(json.dumps({"fps": round(n2 / dt, 2), "frames": n2,
                      "bit_exact": digest == want}))


def child_decode_verify():
    """Verification-mode e2e decode: per-frame uint32 checksums are
    computed ON DEVICE and only 4 bytes/frame cross the link (round-4
    verdict, next item 8 - e2e was proven link-bound at ~96% of the
    raw-YUV d2h floor, so verification runs should track the
    device-only number). The warmup full decode validates vs the
    golden sha256 AND records the per-frame host-twin digests; the
    timed digest run must reproduce them exactly."""
    from thor_tpu.dec.decoder import Decoder, frame_digest_np

    dec = Decoder(backend="jax", parse="native")
    h = hashlib.sha256()
    want_digs = []
    n = 0
    for (y, u, v) in dec.decode_stream(str(BIT)):
        n += 1
        h.update(y.tobytes()); h.update(u.tobytes()); h.update(v.tobytes())
        want_digs.append(int(frame_digest_np(y, u, v)))
    sha_ok = h.hexdigest() == SHA.read_text().split()[0]

    dec = Decoder(backend="jax", parse="native")
    digs = list(dec.decode_stream(str(BIT), digest=True))   # warm
    import jax
    t0 = time.perf_counter()
    dec = Decoder(backend="jax", parse="native")
    digs = list(dec.decode_stream(str(BIT), digest=True))
    got = [int(x) for x in jax.device_get(digs)]
    dt = time.perf_counter() - t0
    print(json.dumps({"fps": round(len(digs) / dt, 2),
                      "frames": len(digs),
                      "verified": sha_ok and got == want_digs}))


def child_decode_ra16():
    """1080p RA16 (hierarchical-B + interpolated references) e2e decode
    throughput: exercises the device temporal-interpolation pipeline -
    on TPU the Pallas whole-pass pyramid kernels (ops/pallas_interp.py,
    the round-5 default; the synthesized reference stays
    device-resident) - on every interp-ref B frame, the
    high-efficiency config family the LDB headline number never
    touches (round-3 verdict, missing item 2)."""
    from thor_tpu.dec.decoder import Decoder

    bit = ROOT / "testdata" / "RA16_high_efficiency_1080.bit"
    sha = ROOT / "testdata" / "RA16_high_efficiency_1080_dec.sha256"

    def once(collect):
        dec = Decoder(backend="jax", parse="native")
        h = hashlib.sha256() if collect else None
        n = 0
        for (y, u, v) in dec.decode_stream(str(bit)):
            n += 1
            if collect:
                h.update(y.tobytes())
                h.update(u.tobytes())
                h.update(v.tobytes())
        return n, (h.hexdigest() if collect else None)

    n, digest = once(True)
    want = sha.read_text().split()[0]
    t0 = time.perf_counter()
    n2, _ = once(False)
    dt = time.perf_counter() - t0
    print(json.dumps({"fps": round(n2 / dt, 2), "frames": n2,
                      "bit_exact": digest == want}))


def child_decode_device():
    """Device-only decode throughput on the real stream (inputs staged
    on device, programs dispatched back-to-back, one tiny sync): the
    number a locally-attached chip sustains without the tunnel link."""
    from tools.device_decode_fps import measure
    n, best = measure(str(BIT), reps=3)
    print(json.dumps({"fps": round(n / best, 2), "frames": n}))


def child_link():
    """Host<->device link bandwidth + the implied e2e floor: decoding
    1080p to host YUV must ship W*H*3/2 bytes per frame over the
    device->host link, so floor_fps = d2h_bandwidth / frame_bytes.
    Through the axon tunnel this - not device compute - caps e2e."""
    from tools.link_profile import measure_link
    print(json.dumps(measure_link(1920 * 1080 * 3 // 2)))


def child_synth():
    """Steady-state synthetic inter-only device microbench (the round-1
    metric, kept for continuity)."""
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
    print(json.dumps({"fps": round(iters / best, 2)}))


def child_encode_device(n_frames=6):
    """Device-only 1080p encode throughput: the replayed pure device
    pipeline (phases+ME+trials+intra search+final+filters) dispatched
    back-to-back with the reference chain device-resident and one sync
    at the end - the encode twin of child_decode_device."""
    from tools.device_encode_fps import measure
    yuv = ROOT / "testdata" / "test_1080.yuv"
    if not yuv.exists():
        subprocess.run([sys.executable, "gen_input_1080.py"],
                       cwd=ROOT / "testdata", check=True)
    n, best = measure(str(yuv), 1920, 1080, n_frames,
                      "/root/reference/config_LDB_low_complexity.txt")
    print(json.dumps({"fps": round(n / best, 2), "frames": n}))


def child_encode(n_frames=6):
    """1080p device-encode throughput (LDB low complexity, batched
    device ME + trial RDO P-frames, exact host syntax).

    Encodes the same frames twice in one process: the first pass pays
    every program compile, the second reuses them all and is the
    reported steady-state number."""
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
    print(json.dumps({"fps": round(run(), 2)}))


# ---------------------------------------------------------------------------
# parent orchestrator (never imports jax; survives hangs and crashes)
# ---------------------------------------------------------------------------

def _run_child(name, timeout, env):
    """Run `python bench.py --child <name>`; return (obj, err)."""
    try:
        r = subprocess.run(
            [sys.executable, str(ROOT / "bench.py"), "--child", name],
            capture_output=True, text=True, timeout=timeout, env=env,
            cwd=str(ROOT))
    except subprocess.TimeoutExpired:
        return None, f"{name}: timeout after {timeout}s"
    if r.returncode != 0:
        tail = (r.stderr or r.stdout or "").strip().splitlines()[-3:]
        return None, f"{name}: rc={r.returncode}: " + " | ".join(tail)
    for line in reversed((r.stdout or "").strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line), None
            except json.JSONDecodeError:
                continue
    return None, f"{name}: no JSON in output"


def _probe_backend(base_env):
    """Try to bring up the default (TPU) backend in a subprocess, with
    retries and backoff. Returns (probe_obj|None, errors)."""
    errors = []
    for attempt, (tmo, backoff) in enumerate([(240, 20), (300, 60),
                                              (420, 0)]):
        obj, err = _run_child("probe", tmo, base_env)
        if obj is not None:
            return obj, errors
        errors.append(f"probe attempt {attempt + 1}: {err}")
        if backoff:
            time.sleep(backoff)
    return None, errors


def main():
    base_env = dict(os.environ)
    base_env.update(CACHE_ENV)

    out = {"metric": "1080p_decode_e2e_fps", "value": None,
           "unit": "frames/s", "vs_baseline": None}
    notes = []

    if os.environ.get("THOR_BENCH_FORCE_CPU"):
        probe = None
        notes.append("forced cpu via THOR_BENCH_FORCE_CPU")
    else:
        probe, perrs = _probe_backend(base_env)
        notes.extend(perrs)

    if probe is not None and probe.get("backend") not in (None, "cpu"):
        env = base_env
        on_tpu = True
        out["backend"] = probe.get("backend")
        out["device"] = probe.get("device")
    else:
        # TPU unreachable: degrade to CPU so the bench still measures
        # the real code path end-to-end instead of producing nothing.
        env = dict(base_env)
        env["JAX_PLATFORMS"] = "cpu"
        on_tpu = False
        out["backend"] = "cpu"
        if probe is None:
            notes.append("tpu backend unavailable; cpu fallback numbers")

    dec, err = _run_child("decode", 2400 if on_tpu else 5400, env)
    if dec is not None:
        out["value"] = dec["fps"]
        out["vs_baseline"] = round(dec["fps"] / 60.0, 3)
        out["bit_exact"] = dec["bit_exact"]
        out["frames"] = dec["frames"]
    else:
        notes.append(err)

    if os.environ.get("THOR_BENCH_VERIFY", "1") != "0":
        vf, err = _run_child("decode_verify", 2400 if on_tpu else 5400,
                             env)
        if vf is not None:
            out["decode_e2e_verify_fps"] = vf["fps"]
            out["decode_verify_ok"] = vf["verified"]
        else:
            notes.append(err)

    if os.environ.get("THOR_BENCH_RA16", "1") != "0":
        ra, err = _run_child("decode_ra16", 2400 if on_tpu else 5400,
                             env)
        if ra is not None:
            out["ra16_1080_decode_fps"] = ra["fps"]
            out["ra16_1080_bit_exact"] = ra["bit_exact"]
        else:
            notes.append(err)

    if os.environ.get("THOR_BENCH_DEVICE", "1") != "0":
        dd_, err = _run_child("decode_device", 1200 if on_tpu else 3600,
                              env)
        if dd_ is not None:
            out["decode_device_fps"] = dd_["fps"]
            out["decode_device_vs_baseline"] = round(dd_["fps"] / 60.0, 3)
        else:
            notes.append(err)

    if on_tpu and os.environ.get("THOR_BENCH_LINK", "1") != "0":
        lk, err = _run_child("link", 900, env)
        if lk is not None:
            out["link_floor_fps"] = lk["link_floor_fps"]
            out["d2h_MBps"] = lk["d2h_MBps"]
            if out.get("value"):
                out["e2e_pct_of_link_floor"] = round(
                    100.0 * out["value"] / lk["link_floor_fps"], 1)
        else:
            notes.append(err)

    if os.environ.get("THOR_BENCH_SYNTH", "1") != "0":
        syn, err = _run_child("synth", 900 if on_tpu else 2400, env)
        if syn is not None:
            out["synthetic_inter_device_fps"] = syn["fps"]
        else:
            notes.append(err)

    if os.environ.get("THOR_BENCH_ENCODE", "1") != "0":
        enc, err = _run_child("encode", 2400 if on_tpu else 7200, env)
        if enc is not None:
            out["1080p_encode_e2e_fps"] = enc["fps"]
        else:
            notes.append(err)
        enc, err = _run_child("encode_device", 2400 if on_tpu else 7200,
                              env)
        if enc is not None:
            out["encode_device_fps"] = enc["fps"]
            out["encode_device_vs_baseline"] = round(enc["fps"] / 60.0,
                                                     3)
        else:
            notes.append(err)

    if notes:
        out["error"] = "; ".join(notes)
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        for k, v in CACHE_ENV.items():
            os.environ.setdefault(k, v)
        {"probe": child_probe, "decode": child_decode,
         "decode_ra16": child_decode_ra16,
         "decode_verify": child_decode_verify,
         "decode_device": child_decode_device, "link": child_link,
         "synth": child_synth, "encode": child_encode,
         "encode_device": child_encode_device}[sys.argv[2]]()
    else:
        main()
