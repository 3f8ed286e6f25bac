"""geoformer_tpu: TPU-native few-shot 3D point-cloud instance segmentation.

A ground-up JAX/XLA/Pallas rebuild of GeoFormer (ECCV 2022,
"Geodesic-Former: a Geodesic-Guided Few-shot 3D Point Cloud Instance
Segmenter"). The reference implementation is CUDA/PyTorch; this framework
re-designs every component TPU-first: static shapes, sort/searchsorted
rulebooks, implicit-GEMM sparse convolution, vmapped per-scene math, and
SPMD data parallelism over a jax.sharding.Mesh.
"""

__version__ = "0.1.0"
