"""VisualRWKV-TPU: a TPU-native (JAX/XLA/Pallas/pjit) VisualRWKV framework.

A from-scratch reimplementation of the capability set of howard-hou/VisualRWKV
(LLaVA-style visual language models built on the RWKV-6/RWKV-7 recurrent LM),
designed TPU-first:

- the WKV recurrences are chunked, matmul-dominant scans that ride the MXU
  (``visualrwkv_tpu.ops``) instead of per-channel CUDA loops;
- models are pure-functional parameter pytrees compiled under ``jax.jit``
  (``visualrwkv_tpu.models``);
- parallelism is expressed with ``jax.sharding`` over a device Mesh
  (``visualrwkv_tpu.parallel``), with XLA inserting the collectives;
- inference is a true O(1)-state RNN engine (``visualrwkv_tpu.infer``).
"""

__version__ = "0.1.0"
