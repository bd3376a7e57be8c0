"""hippie_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the HIPPIE framework.

HIPPIE (High-dimensional Interpretation for Physiological Patterns in
Intercellular Electrophysiology) is a conditional-VAE framework for multimodal
neuron classification and clustering: it embeds extracellular action-potential
waveforms and spike-timing (ISI-distribution) features into a shared latent
space and evaluates the embeddings with KNN classification and clustering.

This package re-designs the reference (see /root/reference, a PyTorch +
PyTorch-Lightning research pipeline) TPU-first:

- data:      whole-dataset device residency; preprocessing (log1p, min-max,
             z-score, linear resampling) as one vectorized XLA call instead of
             per-item Python (reference: hippie/dataloading.py:27-56).
- models:    pure-functional 1-D ResNet18 cVAE with explicit parameter pytrees
             whose structure mirrors the reference state_dict for checkpoint
             interop (reference: hippie/backbones.py, hippie/model.py).
- train:     a single jit-compiled fused fwd+bwd train step (recon MSE +
             beta-weighted KL + reparameterization), optax AdamW with
             torch-matching semantics, epoch-as-scan loops.
- parallel:  jax.sharding.Mesh data/model-parallel execution via GSPMD.
- evaluate:  on-device KNN, balanced accuracy, confusion matrices, k-means/GMM.
"""

__version__ = "0.1.0"

from hippie_tpu import nn, ops, models, data, train, evaluate, parallel, utils  # noqa: F401
