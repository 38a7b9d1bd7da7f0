"""kstar_tpu — TPU-native framework for multimodal tokamak disruption prediction.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
ZINZINBIN/Disruption-Prediction-based-on-Multimodal-Deep-Learning
(KSTAR IVIS video + 0D diagnostics -> disruption probability), designed
TPU-first: static shapes, batched sliding-window inference, pjit/shard_map
data parallelism over a device mesh, and Pallas kernels on the hot paths.

Layout (mirrors SURVEY.md section 7):
    config      — dataclass configs + KSTAR signal schema
    data        — ETL, window/label generation, loaders, augmentation
    models      — flax.linen encoders (video, 0D, multimodal fusion)
    losses      — CE / Focal / LDAM / DRW / Gradient Blending (pure fns)
    train       — jitted train loops, checkpointing, metrics, HPO
    infer       — continuous sliding-window sweep + latency harness
    eval        — threshold evaluation, reports, feature importance
    parallel    — mesh construction + sharded train steps
    ops         — pallas kernels (fused preprocess, attention) w/ XLA fallbacks
    viz         — probability curves, latent space, Grad-CAM, attention rollout
"""

__version__ = "0.1.0"
