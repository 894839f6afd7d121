"""Multi-process sharded-decode worker.

One process of an N-process jax.distributed run (the reference is
single-threaded C; this is the TPU build's multi-host path - SURVEY.md
§2.5/§5). Each process owns one 'gop' row of the global mesh: frames of
a dependency level are data-parallel across processes (DCN axis) while
frame rows are spatially sharded across that process's devices (ICI
axis). The host VLC parse - per-frame serial work - is replicated on
every process; reconstructed frames are exchanged through XLA's
cross-process collectives (the reference-plane all-gather).

Usage (each process):
  python tools/dist_decode_worker.py <coordinator> <nproc> <pid> \
      <bitstream> <golden_yuv> [devices_per_proc]

Prints "DIST_OK <sha256>" when the decoded stream is bit-exact against
the committed reference-Thordec golden.
"""

import hashlib
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    coord, nproc, pid, bit, gold = sys.argv[1:6]
    nproc, pid = int(nproc), int(pid)
    dpp = int(sys.argv[6]) if len(sys.argv) > 6 else 4

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={dpp}")
    os.environ["XLA_FLAGS"] = " ".join(flags)

    import jax
    # the axon TPU plugin overrides JAX_PLATFORMS; the config flag wins
    jax.config.update("jax_platforms", "cpu")

    from thor_tpu.parallel.mesh import init_distributed
    pi, pc = init_distributed(coord, nproc, pid)
    assert (pi, pc) == (pid, nproc), (pi, pc)
    devs = jax.devices()
    assert len(devs) == nproc * dpp, devs

    import numpy as np
    from thor_tpu.parallel.stream import ShardedDecoder
    # gop rows = processes (frames over DCN), tiles within a process
    sd = ShardedDecoder(gop=nproc, tile=dpp, devices=np.asarray(devs))
    frames = sd.decode_stream(bit)

    h = hashlib.sha256()
    for (y, u, v) in frames:
        h.update(y.tobytes())
        h.update(u.tobytes())
        h.update(v.tobytes())
    want = hashlib.sha256(Path(gold).read_bytes()).hexdigest()
    if h.hexdigest() != want:
        print(f"DIST_MISMATCH {h.hexdigest()} != {want}", flush=True)
        sys.exit(1)
    print(f"DIST_OK {h.hexdigest()}", flush=True)


if __name__ == "__main__":
    main()
