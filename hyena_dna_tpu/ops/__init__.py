from hyena_dna_tpu.ops.fftconv import (
    fftconv,
    fftconv_chunked,
    fftconv_gated,
    fftconv_ref,
    fftconv_h3,
)
from hyena_dna_tpu.ops.short_conv import short_conv_1d, short_conv_1d_with_halo

__all__ = [
    "fftconv",
    "fftconv_chunked",
    "fftconv_gated",
    "fftconv_ref",
    "fftconv_h3",
    "short_conv_1d",
    "short_conv_1d_with_halo",
]
