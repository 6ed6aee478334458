"""nic — TPU-native neural image/LUT compression framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the
reference repo 21K1113/Neural_Image_Compression_V2 (PyTorch), redesigned
TPU-first:

- ``nic.core``     quantization / positional encodings / metrics (pure fns)
- ``nic.grids``    multiresolution feature pyramid (G0/G1) + vectorized sampling
- ``nic.kernels``  Pallas fused decode kernels (coords → PE → gather → MLP → RGB)
- ``nic.models``   tiny-MLP decoder + conv autoencoders (2D/3D)
- ``nic.train``    jitted train loops (QAT schedule, LOD sampling, crops)
- ``nic.parallel`` device-mesh sharding (data/pixel parallel via jax.sharding)
- ``nic.data``     host-side asset I/O (images, video, npy LUTs, mip chains)
- ``nic.io``       compressed artifact format, checkpoints, versioned names
- ``nic.obs``      logging, TensorBoard scalars, span timers, tensor audits
- ``nic.cli``      entry points mirroring the reference workloads
"""

__version__ = "0.1.0"
