"""deepsvg_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for deep learning
on SVG vector graphics, with the full capabilities of alexandre01/deepsvg.

Built from scratch, array-first and batch-first:

- ``deepsvg_tpu.svgtensor``  — the core data contract: fixed-shape command/argument
  arrays, masks, SOS/EOS/pad semantics, relative<->absolute coordinates.
- ``deepsvg_tpu.difflib``    — differentiable geometry: batched Bézier sampling,
  Chamfer / EMD / length / continuity losses (pure JAX, jit/vmap-friendly).
- ``deepsvg_tpu.models``     — the hierarchical SVG Transformer-VAE family
  (one/two-stage x one-shot/autoregressive x ordered/Hungarian, label-conditioned),
  as flax.linen modules with KV-cached ``lax.scan`` decoding.
- ``deepsvg_tpu.ops``        — TPU kernels (Pallas fused attention, Hungarian matching).
- ``deepsvg_tpu.parallel``   — mesh / sharding utilities (pjit over ICI, DP batch axis).
- ``deepsvg_tpu.svglib``     — CPU SVG library: parsing, canonicalization,
  RDP + Schneider simplification, rasterization, augmentation, tensorization.
- ``deepsvg_tpu.data``       — dataset loaders (icons/fonts tensor datasets, raw SVGs).
- ``deepsvg_tpu.training``   — config-driven training runtime: stats, checkpointing,
  schedulers, visualization, CLI.
- ``deepsvg_tpu.serving``    — ahead-of-time ``jax.export`` of the inference
  graphs: one StableHLO artifact per batch bucket, weights baked in,
  deserializable without model code.

Reference capability map: see /root/repo/SURVEY.md.
"""

__version__ = "0.1.0"
