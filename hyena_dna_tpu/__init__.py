"""hyena_dna_tpu: a TPU-native (JAX/XLA/Pallas/pjit) long-context genomic
language-model framework with the capabilities of HazyResearch/hyena-dna.

Layout (bottom-up):
  ops/       numerical kernels: FFT long convolution (pow2-padded, chunked,
             sequence-sharded), short depthwise conv, Pallas fused front end,
             legacy toeplitz/krylov/vandermonde.
  models/    flax.linen modules: HyenaFilter/HyenaOperator, attention, blocks,
             LM backbones and heads, generic SequenceModel, LongConv,
             adaptive softmax, DCT, block FFT.
  data/      tokenizers, fasta access, genomic datasets, datamodule registry,
             fault-tolerant loader, native C++ fast path.
  tasks/     loss/metric/task glue (LM, classification), encoders.
  train/     TrainState, optimizers with per-parameter hyperparams, schedulers,
             jitted train/eval steps, Trainer, callbacks, Orbax checkpointing.
  parallel/  device mesh construction and sharding rules (dp/tp/sp via GSPMD),
             multihost launch helpers.
  evals/     hg38 inference, soft prompting, instruction tuning.
  utils/     registries, config system, torch importer, profiling.

Entry points:
  python -m hyena_dna_tpu.train experiment=hg38/hg38_hyena   # training CLI
  from hyena_dna_tpu.pretrained import from_pretrained       # load HF weights
  from hyena_dna_tpu.generation import generate              # sampling
"""

__version__ = "0.2.0"
