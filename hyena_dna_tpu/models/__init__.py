from hyena_dna_tpu.models.attention import MHA
from hyena_dna_tpu.models.blocks import Block, Mlp
from hyena_dna_tpu.models.embeddings import GPT2Embeddings
from hyena_dna_tpu.models.filters import HyenaFilter
from hyena_dna_tpu.models.heads import NDDecoder, SequenceDecoder, TokenDecoder
from hyena_dna_tpu.models.hyena import HyenaOperator
from hyena_dna_tpu.models.lm import ConvLMHeadModel, DNAEmbeddingModel, LMBackbone
from hyena_dna_tpu.models.long_conv import LongConv, LongConvKernel
from hyena_dna_tpu.models.sequence_model import (
    FF,
    SequenceIdentity,
    SequenceModel,
    SequenceResidualBlock,
)

__all__ = [
    "MHA",
    "Block",
    "Mlp",
    "GPT2Embeddings",
    "HyenaFilter",
    "HyenaOperator",
    "ConvLMHeadModel",
    "DNAEmbeddingModel",
    "LMBackbone",
    "LongConv",
    "LongConvKernel",
    "FF",
    "SequenceIdentity",
    "SequenceModel",
    "SequenceResidualBlock",
    "SequenceDecoder",
    "TokenDecoder",
    "NDDecoder",
]
