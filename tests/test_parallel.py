"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Shard-invariance (SURVEY.md §4): the gop x tile sharded reconstruction
must produce the same pixels as the single-device program regardless of
mesh shape.
"""

import numpy as np
import jax
import pytest


@pytest.mark.parametrize("gop,tile", [(2, 4), (1, 8), (4, 2)])
def test_sharded_reconstruct_matches_single_device(gop, tile):
    from functools import partial
    from thor_tpu.dec.reconstruct_jax import _frame_fn
    from thor_tpu.parallel.mesh import make_decode_mesh, sharded_reconstruct
    from thor_tpu.utils.synth import build_synthetic_frame

    devs = jax.devices()
    if len(devs) < 8:
        devs = jax.devices("cpu")   # plugin may override JAX_PLATFORMS
    assert len(devs) >= 8, "conftest must provide 8 virtual devices"
    cfg, inp = build_synthetic_frame(W=128, H=128, R=2, seed=11)

    cpu0 = devs[0]
    inp = jax.device_put(inp, cpu0)
    ref = jax.jit(partial(_frame_fn, cfg), device=cpu0)(inp)
    ref = tuple(np.asarray(p) for p in ref)

    mesh = make_decode_mesh(devs[:gop * tile], gop=gop, tile=tile)
    binp = jax.tree_util.tree_map(lambda x: np.stack([x] * gop), inp)
    y, u, v = sharded_reconstruct(mesh, cfg, binp)
    for b in range(gop):
        assert np.array_equal(np.asarray(y[b]), ref[0])
        assert np.array_equal(np.asarray(u[b]), ref[1])
        assert np.array_equal(np.asarray(v[b]), ref[2])
