"""Multi-chip parallel decomposition of Thor frame processing.

The reference is single-threaded C (SURVEY.md §2.5); the parallel
structure here is introduced TPU-first per BASELINE.json's north star:

- 'gop' mesh axis: frames/GOPs are data-parallel (the codec's DP/PP
  hybrid - each frame's pixel program is independent given its parsed
  parameter planes and reference frames).
- 'tile' mesh axis: rows within a frame are spatial/sequence-parallel.
  Reference planes are replicated across 'tile' (the "reference-plane
  all-gather": a reconstructed frame becomes a reference for every tile
  of the next frame); per-pixel parameter planes, residual planes and
  outputs are row-sharded. Cross-row dependencies (6-tap MC reach,
  deblock filter reach, CLPF 64-block locality) are expressed as plain
  shifted tensor ops, so the XLA SPMD partitioner inserts the halo
  collective-permutes over ICI - exactly the "annotate shardings, let
  XLA insert collectives" recipe.

The serial stages (host VLC parse per frame, intra TU scan) stay
per-frame work on the 'gop' axis.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..dec.reconstruct_jax import FrameConfig, _frame_fn


def init_distributed(coordinator: str = None, num_processes: int = None,
                     process_id: int = None):
    """Multi-host bring-up: initialize jax.distributed so
    make_decode_mesh sees every host's chips (jax.devices() is then
    global). On TPU pods the three arguments are auto-detected from the
    environment; pass them explicitly elsewhere (coordinator =
    'host:port' of process 0). Lay the 'gop' axis across hosts (DCN)
    and 'tile' within a host (ICI): frames exchange no data, so only
    reference-plane broadcasts cross the host boundary.
    Idempotent - safe to call when already initialized."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes, process_id=process_id)
    except RuntimeError:
        pass  # already initialized (or single-process run)
    return jax.process_index(), jax.process_count()


def make_decode_mesh(devices=None, gop: int = 0, tile: int = 0) -> Mesh:
    """Mesh over ('gop', 'tile'). Default: split devices 2 x N/2."""
    if devices is None:
        devices = jax.devices()
        if gop and tile and len(devices) < gop * tile:
            # axon plugin exposes a single TPU regardless of
            # JAX_PLATFORMS; fall back to the virtual CPU mesh.
            devices = jax.devices("cpu")
    devices = np.asarray(devices)
    n = devices.size
    if not gop:
        gop = 2 if n % 2 == 0 and n > 1 else 1
        tile = n // gop
    return Mesh(devices[:gop * tile].reshape(gop, tile), ("gop", "tile"))


def _batched_frame_fn(cfg: FrameConfig, binp):
    """vmap of the per-frame reconstruction over a leading batch axis."""
    return jax.vmap(partial(_frame_fn, cfg))(binp)


def _input_specs(cfg: FrameConfig, binp):
    """PartitionSpecs: batch axis -> 'gop'; frame row dims -> 'tile' for
    per-pixel/cell planes; references + TU batches replicated in 'tile'."""
    specs = {}
    row_sharded = {"mv0x", "mv0y", "mv1x", "mv1y", "slot0", "slot1",
                   "use_bi", "m8y", "m8u", "m8v", "ddp"}
    for k, v in binp.items():
        if isinstance(v, dict):
            specs[k] = {kk: P("gop") for kk in v}
        elif k in row_sharded:
            specs[k] = P("gop", "tile", None)
        elif k in ("refY", "refU", "refV"):
            specs[k] = P("gop", None, None, None)
        else:
            specs[k] = P("gop")
    return specs


def _my_gop_rows(mesh: Mesh):
    """gop-axis rows of the mesh owned by this process. Requires every
    row to live on a single process (the 'gop across hosts, tile within
    a host' layout init_distributed prescribes)."""
    rows = []
    me = jax.process_index()
    for r in range(mesh.devices.shape[0]):
        procs = {d.process_index for d in mesh.devices[r].flat}
        if len(procs) != 1:
            raise ValueError(
                "multi-process mesh must not split a gop row across "
                f"processes (row {r} spans {sorted(procs)})")
        if procs == {me}:
            rows.append(r)
    return rows


def _globalize(mesh: Mesh, in_shardings, binp):
    """Multi-process promotion of the (replicated) host-parsed batch:
    each process contributes the batch chunks of its own gop rows and
    the result is one global jax.Array per leaf, already laid out in
    the target sharding (the host parse is per-frame serial work
    replicated on every process; only pixels are sharded)."""
    from jax.experimental import multihost_utils as mhu

    gop = mesh.devices.shape[0]
    rows = _my_gop_rows(mesh)

    def one(sh, v):
        v = np.asarray(v)
        B = v.shape[0]
        assert B % gop == 0
        c = B // gop
        local = np.concatenate([v[r * c:(r + 1) * c] for r in rows])
        return mhu.host_local_array_to_global_array(local, mesh, sh.spec)

    return jax.tree_util.tree_map(
        one, in_shardings, binp,
        is_leaf=lambda x: isinstance(x, NamedSharding))


def fetch_to_host(x, mesh: Mesh = None):
    """Materialize a (possibly cross-process) sharded array on every
    host as numpy."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils as mhu
        return np.asarray(mhu.process_allgather(x, tiled=True))
    return np.asarray(x)


def sharded_reconstruct(mesh: Mesh, cfg: FrameConfig, binp):
    """Jit the batched frame reconstruction over the mesh with real
    gop x tile shardings; returns device arrays (y, u, v) sharded
    [batch -> 'gop', rows -> 'tile']. Works on single-process meshes
    and on multi-process meshes brought up via init_distributed (gop
    rows across processes)."""
    in_specs = _input_specs(cfg, binp)
    in_shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), in_specs,
        is_leaf=lambda x: isinstance(x, P))
    out_shardings = NamedSharding(mesh, P("gop", "tile", None))
    if jax.process_count() > 1:
        binp = _globalize(mesh, in_shardings, binp)
    fn = jax.jit(partial(_batched_frame_fn, cfg),
                 in_shardings=(in_shardings,),
                 out_shardings=(out_shardings,) * 3)
    return fn(binp)
