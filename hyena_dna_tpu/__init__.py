"""hyena_dna_tpu: a TPU-native (JAX/XLA/Pallas/pjit) long-context genomic
language-model framework with the capabilities of HazyResearch/hyena-dna.

Layout (bottom-up):
  ops/       numerical kernels: FFT long convolution, short depthwise conv,
             Pallas fusions of the Hyena gating chain.
  models/    flax.linen modules: HyenaFilter/HyenaOperator, attention, blocks,
             LM backbones and heads.
  data/      tokenizers, fasta access, genomic datasets, host->device pipeline.
  tasks/     loss/metric/task glue (LM, classification).
  train/     TrainState, optimizers with per-parameter hyperparams, schedulers,
             jitted train/eval steps, checkpointing, curricula.
  parallel/  device mesh construction and sharding rules (dp/tp/sp via GSPMD).
  utils/     registries, config system, logging.
"""

__version__ = "0.1.0"
