"""thor_tpu: a TPU-native implementation of the Thor video codec.

Decoder: host-side serial bitstream parse -> batched JAX/Pallas frame
reconstruction. Encoder: batched analysis/RDO on device, serial VLC emit
on host. Multi-device scaling via jax.sharding over frames/tiles.
"""

__version__ = "0.1.0"
