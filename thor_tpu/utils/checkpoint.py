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


def save_encoder_state(enc, path: str, loop: dict):
    """Snapshot an Encoder at a sub-GOP boundary (between frames).

    loop: the sequence-loop counters {frame_num0, num_encoded,
    last_PorI, last_intra_frame_num, sub_gop, num_reorder_pics,
    HQperiod, stream_bytes}. Together with the reference ring this is
    the complete inter-frame state (SURVEY.md §5) - resuming from it
    reproduces the remaining stream byte-identically."""
    arrs = {}
    for i, r in enumerate(enc.refs):
        if r is None:
            continue
        arrs[f"ref{i}_y"] = r.y
        arrs[f"ref{i}_u"] = r.u
        arrs[f"ref{i}_v"] = r.v
        arrs[f"ref{i}_num"] = np.int64(r.frame_num)
    arrs["loop"] = np.array(
        [loop["frame_num0"], loop["num_encoded"], loop["last_PorI"],
         loop["last_intra_frame_num"], loop["sub_gop"],
         loop["num_reorder_pics"], loop["HQperiod"],
         loop["stream_bytes"]], np.int64)
    np.savez_compressed(path, **arrs)


def load_encoder_state(enc, path: str) -> dict:
    """Restore an Encoder's reference ring; returns the loop counters
    to continue encode_sequence from."""
    from ..enc.encoder import RefFrame

    z = np.load(path)
    refs = [None] * len(enc.refs)
    for i in range(len(refs)):
        if f"ref{i}_y" in z:
            # planes were saved already padded - bypass __init__
            r = RefFrame.__new__(RefFrame)
            r.y, r.u, r.v = (z[f"ref{i}_y"], z[f"ref{i}_u"],
                             z[f"ref{i}_v"])
            r.frame_num = int(z[f"ref{i}_num"])
            refs[i] = r
    enc.refs = refs
    lo = z["loop"]
    keys = ["frame_num0", "num_encoded", "last_PorI",
            "last_intra_frame_num", "sub_gop", "num_reorder_pics",
            "HQperiod", "stream_bytes"]
    return {k: int(v) for k, v in zip(keys, lo)}


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
