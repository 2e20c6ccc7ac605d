"""dat_segmentation_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
Vision Transformer with Deformable Attention (DAT / DAT++) semantic
segmentation and classification.

Built from scratch against the behavior of the reference repo
hehe717/DAT-Segmentation (PyTorch/CUDA); the compute path is JAX + Pallas,
the data path is numpy/cv2 with an optional C++ fast path, and scale-out is
jax.sharding Mesh + pjit over ICI/DCN.

Layout conventions
------------------
* Activations are **NHWC** end-to-end (TPU-friendly; feeds the MXU with the
  channel dim in lanes). The torch reference is NCHW; the checkpoint
  converter (utils/torch_convert.py) performs all layout transposes once at
  load time.
* Parameters follow flax.linen conventions (conv kernels HWIO, dense IO).
* All dropout/droppath take explicit RNG keys; modules are pure functions of
  (params, inputs, rng).
"""

__version__ = "0.1.0"
