"""headct_foundation_tpu — TPU-native 3D head-CT foundation-model framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
headCT_foundation reference stack (MAE + DINO self-supervised pretraining of a
3D ViT on head-CT volumes, downstream fine-tune / linear-probe / few-shot
classification, retrieval evaluation, and feature extraction), designed
TPU-first: SPMD over a `jax.sharding.Mesh`, bfloat16 MXU compute, fused
device-side preprocessing, and a single jitted train step per engine.
"""

__version__ = "0.1.0"
