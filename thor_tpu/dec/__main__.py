"""Thordec-equivalent CLI (dec/maindec.c:91-345).

Usage: python -m thor_tpu.dec str.bit out.yuv [--backend numpy|jax]
                                              [--mesh GxT]
Prints per-sequence mode/size statistics like the reference's
bit_count_t report (dec/maindec.c:197-329). --mesh decodes through the
gop x tile sharded device program (parallel/stream.py), e.g.
--mesh 2x4 over 8 devices.
"""

from __future__ import annotations

import sys
import time
from collections import Counter


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    backend = "numpy"
    mesh = None
    args = []
    i = 0
    while i < len(argv):
        if argv[i] == "--backend":
            backend = argv[i + 1]
            i += 2
        elif argv[i] == "--mesh":
            mesh = argv[i + 1]
            i += 2
        else:
            args.append(argv[i])
            i += 1
    if len(args) < 2:
        print("usage: python -m thor_tpu.dec str.bit out.yuv "
              "[--backend numpy|jax] [--mesh GxT]", file=sys.stderr)
        return 1

    if mesh is not None:
        from ..parallel.stream import ShardedDecoder
        gop, tile = (int(x) for x in mesh.split("x"))
        sd = ShardedDecoder(gop=gop, tile=tile)
        t0 = time.time()
        frames = sd.decode_stream(args[0])
        dt = time.time() - t0
        with open(args[1], "wb") as out:
            for (y, u, v) in frames:
                out.write(y.tobytes() + u.tobytes() + v.tobytes())
        print(f"decoded {len(frames)} frames in {dt:.2f}s "
              f"({len(frames)/dt:.2f} frames/s, mesh={gop}x{tile}, "
              f"gop-level batches={sd.last_level_sizes})")
        return 0

    from .decoder import Decoder
    from ..codec.constants import (
        MODE_SKIP, MODE_INTRA, MODE_INTER, MODE_BIPRED, MODE_MERGE)

    dec = Decoder(backend=backend, collect_stats=True)
    nframes = 0
    t0 = time.time()
    with open(args[1], "wb") as out:
        for (y, u, v) in dec.decode_stream(args[0]):
            out.write(y.tobytes() + u.tobytes() + v.tobytes())
            nframes += 1
    dt = time.time() - t0

    print(f"decoded {nframes} frames in {dt:.2f}s "
          f"({nframes/dt:.2f} frames/s, backend={backend})")
    st = dec.stats
    mode_names = {MODE_SKIP: "skip", MODE_INTRA: "intra",
                  MODE_INTER: "inter", MODE_BIPRED: "bipred",
                  MODE_MERGE: "merge"}
    print("\nFrame types:   ",
          "  ".join(f"{k}:{v}" for k, v in sorted(st["frame_type"].items())))
    print("Bits by type:  ",
          "  ".join(f"{k}:{v}" for k, v in sorted(st["frame_bits"].items())))
    # per-category bit report (dec/maindec.c:219-238)
    cats = ("frame_header", "super_mode", "intra_mode", "mv", "skip_idx",
            "coeff_y", "coeff_u", "coeff_v", "cbp", "clpf")
    nf = {ft: st["frame_type"].get(ft, 0) for ft in ("I", "P", "B")}
    print("\nBIT STATISTICS:")
    print(f"Sequence header: {st['seq_header']:6d}")
    print(f"{'':22s}" + "".join(
        f"{ft + ' pictures:':>22s}" for ft in ("I", "P", "B")))
    print(f"{'':22s}" + "      total    average" * 3)
    tot = {ft: 0 for ft in ("I", "P", "B")}
    for cat in cats:
        row = f"{cat:<22s}"
        for ft in ("I", "P", "B"):
            v = st["cats"].get((ft, cat), 0)
            tot[ft] += v
            row += f"{v:11d}{v // max(nf[ft], 1):11d}"
        print(row)
    row = f"{'Total:':<22s}"
    tot["I"] += st["seq_header"]
    for ft in ("I", "P", "B"):
        row += f"{tot[ft]:11d}{tot[ft] // max(nf[ft], 1):11d}"
    print(row)

    # size x mode cross tables (dec/maindec.c:253-266)
    from ..codec.constants import (
        MODE_SKIP as _SK, MODE_INTRA as _IN, MODE_INTER as _IR,
        MODE_BIPRED as _BI, MODE_MERGE as _MG)
    for ft in ("P", "B"):
        if not any(f == ft for (f, _, _) in st["size_mode"]):
            continue
        print(f"\nMode and size distribution for {ft} pictures:")
        print(f"{'':22s}{'SKIP':>9s}  {'INTRA':>9s}  {'INTER':>9s}  "
              f"{'BIPRED':>9s}  {'MERGE':>9s}")
        for sz in (8, 16, 32, 64):
            row = f"{sz}x{sz}-blocks (8x8):"
            row = f"{row:<22s}"
            for md in (_SK, _IN, _IR, _BI, _MG):
                row += f"{st['size_mode'].get((ft, sz, md), 0):9d}  "
            print(row.rstrip())

    # super-mode distribution (dec/maindec.c:268-291)
    nref = max(st.get("num_ref_max", 1), 1)
    sm_cols = ["SKIP", "SPLIT", "INTERr0", "MERGE", "BIPRED", "INTRA"] \
        + [f"INTERr{i}" for i in range(1, nref)]
    for ft in ("P", "B"):
        if not any(f == ft for (f, _, _) in st["super_stat"]):
            continue
        print(f"\nSuper-mode distribution for {ft} pictures:")
        print(f"{'':16s}" + "".join(f"{c:>9s}" for c in sm_cols))
        for sz in (8, 16, 32, 64):
            row = f"{sz:2d} x {sz:2d}-blocks:"
            row = f"{row:<16s}"
            for c in range(len(sm_cols)):
                row += f"{st['super_stat'].get((ft, sz, c), 0):9d}"
            print(row)

    # ref_idx x size distribution (dec/maindec.c:293-315)
    for ft in ("P", "B"):
        if not any(f == ft for (f, _, _) in st["size_ref"]):
            continue
        print(f"\nRef_idx and size distribution for {ft} pictures:")
        for sz in (8, 16, 32, 64):
            row = f"{sz:2d} x {sz:2d}-blocks:"
            row = f"{row:<16s}"
            for r in range(nref):
                row += f"{st['size_ref'].get((ft, sz, r), 0):6d}"
            print(row)

    # bi-ref pair counts (dec/maindec.c:316-325)
    for ft in ("P", "B"):
        if any(f == ft for (f, _) in st["bi_ref"]):
            row = f"bi-ref-{ft}:  "
            for j in range(16):
                row += f"{st['bi_ref'].get((ft, j), 0):7d}"
            print(row)

    print("\nPARAMETER STATISTICS (8x8 units):")
    for ft in ("I", "P", "B"):
        modes = {mode_names[m]: c for (f, m), c in st["mode"].items()
                 if f == ft}
        sizes = {s: c for (f, s), c in st["size"].items() if f == ft}
        if modes:
            print(f"{ft}-frame modes: ",
                  "  ".join(f"{k}:{v}" for k, v in sorted(modes.items())))
            print(f"{ft}-frame sizes: ",
                  "  ".join(f"{k}:{v}" for k, v in sorted(sizes.items())))
    return 0


if __name__ == "__main__":
    sys.exit(main())
