"""radtts_tpu — a TPU-native (JAX/XLA/Pallas) re-implementation of the RADTTS
normalizing-flow text-to-speech framework.

Capability reference: duj12/radtts (PyTorch). This package is a from-scratch
re-design for TPU: channels-last static-shape tensors, masked (not packed)
sequences, `lax.scan` recurrences, on-device monotonic-alignment-search, and
`jax.sharding` data/tensor parallelism over ICI instead of NCCL.
"""

__version__ = "0.1.0"
