"""Proto-CLIP TPU: a TPU-native JAX/XLA/Pallas reimplementation of Proto-CLIP.

Proto-CLIP (IROS 2024, arXiv 2307.03073) is a few-shot image-classification
method built on frozen CLIP encoders: a *visual memory bank* of K-shot support
features per class and a *textual memory bank* of prompt-ensemble class
embeddings yield class prototypes; a query feature is classified by the
probability mix

    p = alpha * softmax(-beta * d^2(q, img_protos))
        + (1 - alpha) * softmax(-beta * d^2(q, text_protos))

This package is a ground-up TPU-first rebuild (reference behavior documented in
SURVEY.md; reference implementation: /root/reference, PyTorch/CUDA):

- ``protoclip_tpu.models``   -- CLIP ViT / ModifiedResNet / text towers in pure
  functional JAX (bf16 weights, fp32 LayerNorm), plus the query adapters.
- ``protoclip_tpu.ops``      -- compute kernels: fused attention, LayerNorm,
  the alpha/beta prototype classifier, InfoNCE losses.  Pallas TPU kernels for
  the hot paths with XLA reference fallbacks.
- ``protoclip_tpu.tokenizer``-- CLIP-compatible byte-pair-encoding tokenizer.
- ``protoclip_tpu.io``       -- pure-Python torch ``.pt`` checkpoint reader
  (no torch dependency) for OpenAI CLIP weights and ``pretrained_ckpt/``.
- ``protoclip_tpu.data``     -- 12 dataset adapters, few-shot sampling,
  CLIP image preprocessing.
- ``protoclip_tpu.memory``   -- visual/textual memory-bank construction and
  prototype math, with on-disk caching.
- ``protoclip_tpu.train``    -- Proto-CLIP-F episodic trainer and the
  F-Q^T trainer, jit/pjit compiled with optax.
- ``protoclip_tpu.eval``     -- vmapped alpha/beta grid sweep and metrics.
- ``protoclip_tpu.parallel`` -- jax.sharding mesh helpers for multi-chip
  batch-sharded encoding and training.
- ``protoclip_tpu.toolkit``  -- deployment classifier API, OOD eval, t-SNE.
"""

__version__ = "0.1.0"
