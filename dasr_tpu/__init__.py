"""dasr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) unsupervised real-world
super-resolution framework with the capabilities of ShuhangGu/DASR
(CVPR 2021, "Unsupervised Real-world Image Super Resolution via
Domain-distance Aware Training").

Three-stage pipeline (reference: /root/reference/codes/Auto_Reproduce.py:30-40):
  1. DSN  — GAN-train an HR->LR degradation generator on unpaired data.
  2. Dataset generation — pseudo-paired LRs + domain-distance maps (DDMs).
  3. SRN  — train an ESRGAN/RRDB SR generator with DDM-weighted losses.

Everything here is a fresh TPU-first design: NHWC layouts, functional jitted
train steps, SPMD data parallelism over a jax.sharding.Mesh, XLA-fusible
fixed-filter ops (Haar DWT, gaussian/avg-pool banks, MATLAB-parity bicubic as
matrix products on the MXU), and tiled large-image inference with optional
spatial sharding.
"""

__version__ = "0.1.0"
