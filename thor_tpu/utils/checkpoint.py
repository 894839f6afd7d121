"""Checkpoint / resume for codec state.

The reference has none (SURVEY.md §5): it restarts from scratch and
relies on intra frames for random access. Here the complete decoder (or
encoder reference-side) state is {reference planes, frame counter,
stream byte offset} - explicitly serializable, enabling mid-stream
resume and failure recovery at frame granularity (the 4-byte length
prefix gives the resync points, enc/putbits.c:57-74).
"""

from __future__ import annotations

import numpy as np


def save_decoder_state(dec, path: str):
    """Snapshot a Decoder after any number of frames."""
    arrs = {}
    meta = {"n_refs": 0}
    for i, r in enumerate(dec.refs):
        if r is None:
            continue
        arrs[f"ref{i}_y"] = r.y
        arrs[f"ref{i}_u"] = r.u
        arrs[f"ref{i}_v"] = r.v
        arrs[f"ref{i}_num"] = np.int64(r.frame_num)
        meta["n_refs"] = max(meta["n_refs"], i + 1)
    if dec.interp_frame is not None:
        arrs["interp_y"] = dec.interp_frame.y
        arrs["interp_u"] = dec.interp_frame.u
        arrs["interp_v"] = dec.interp_frame.v
        arrs["interp_num"] = np.int64(dec.interp_frame.frame_num)
    seq = dec.seq
    arrs["seq"] = np.array(
        [seq.width, seq.height, seq.pb_split, seq.tb_split_enable,
         seq.max_num_ref, seq.interp_ref, seq.max_delta_qp,
         seq.deblocking, seq.clpf, seq.use_block_contexts, seq.bipred],
        np.int64)
    np.savez_compressed(path, **arrs)


def load_decoder_state(dec, path: str):
    """Restore a Decoder to a saved state; decoding can continue from
    the matching stream offset."""
    from ..dec.parse import SequenceHeader
    from ..dec.reconstruct_np import RefFrame

    z = np.load(path)
    s = z["seq"]
    dec.seq = SequenceHeader(*(int(x) for x in s))
    refs = [None] * len(dec.refs)
    for i in range(len(refs)):
        if f"ref{i}_y" in z:
            r = RefFrame.__new__(RefFrame)
            r.y, r.u, r.v = z[f"ref{i}_y"], z[f"ref{i}_u"], z[f"ref{i}_v"]
            r.frame_num = int(z[f"ref{i}_num"])
            refs[i] = r
    dec.refs = refs
    if "interp_y" in z:
        r = RefFrame.__new__(RefFrame)
        r.y, r.u, r.v = z["interp_y"], z["interp_u"], z["interp_v"]
        r.frame_num = int(z["interp_num"])
        dec.interp_frame = r
    return dec
