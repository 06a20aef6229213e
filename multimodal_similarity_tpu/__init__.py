"""TPU-native framework for semi-supervised multimodal deep metric learning.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of the TF1
research codebase ``johndpope/multimodal_similarity`` (NeurIPS-2018-era
semi-supervised multimodal metric learning on Honda HDD driving videos and
CUB-200-2011): temporal encoders over pre-extracted multimodal features,
learned pairwise-similarity heads (PairSim / PDDM) producing pseudo-labels,
online triplet / batch-hard / lifted / n-pairs / weighted-triplet mining and
losses, DCCA / modality-hallucination / cross-modal-prediction multitask
objectives, and leave-one-out retrieval evaluation.

Architecture (TPU-first, not a port):
  ops/       pure-JAX distance/loss/mining math + fused Pallas kernels
  models/    flax.linen encoder zoo and similarity heads (LSTMs as lax.scan)
  data/      host-side loaders honoring the reference on-disk contract
  train/     jitted train steps, TrainState, optimizers, checkpointing
  eval/      retrieval metrics (mAP / Recall@K / mPrec@recall) — exact NumPy
             oracle + fast on-device versions
  parallel/  jax.sharding meshes, data-parallel pjit, sharded-gallery eval
"""

__version__ = "0.1.0"

# Optional platform override: MSIM_PLATFORM=cpu forces the CPU backend even
# in environments whose site configuration pins jax_platforms elsewhere
# (useful for running CLIs while the accelerator is occupied).
import os as _os

if _os.environ.get("MSIM_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["MSIM_PLATFORM"])
