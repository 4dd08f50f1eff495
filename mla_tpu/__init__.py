"""mla_tpu — TPU-native Multimodal Learning with Alternating Unimodal Adaptation.

A ground-up JAX/XLA/Pallas/pjit framework with the capabilities of the CVPR 2024
MLA reference (Cecile-hi/Multimodal-Learning-with-Alternating-Unimodal-Adaptation):
multimodal classifiers (audio/visual/text) on CREMA-D, Food-101, MVSA and IEMOCAP
under four training regimes — joint fusion (Normal), OGM/OGM-GE gradient
modulation, QMF quality-aware fusion, and MLA alternating unimodal adaptation
with orthogonal gradient correction and entropy-gated test-time dynamic fusion.

Layout:
  core/      typed config (same CLI surface as reference main.py:18-63), registry
  ops/       Pallas + jitted kernels: fbank, log-STFT, image pipeline, SpecAug,
             sin-cos positional embeddings, masked flash attention
  data/      datalist parsing, dataset adapters, host loader, ETL CLI
  models/    Flax modules: ResNet-18, M3AE, CAV-MAE-FT, fusion heads, classifiers
  train/     pure jitted step functions: joint / MLA alternating / OGM / QMF
  evals/     on-device metrics + entropy-gated dynamic fusion
  parallel/  device mesh + sharding (data-parallel over ICI)
  runtime/   driver: epoch loop, checkpointing (Orbax), TensorBoard, CLI
"""

__version__ = "0.1.0"
