"""thor_tpu: a TPU-native implementation of the Thor video codec.

Decoder: host-side serial bitstream parse -> batched JAX/Pallas frame
reconstruction. Encoder: batched analysis/RDO on device, serial VLC emit
on host. Multi-device scaling via jax.sharding over frames/tiles.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache for every entry point (CLIs, bench,
# library use): first-compile through a TPU tunnel costs minutes, and
# the codec's programs are keyed on frame geometry so they recur across
# runs. Opt out by setting JAX_COMPILATION_CACHE_DIR=''.
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), ".jax_cache"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
