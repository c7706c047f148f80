"""Pallas TPU kernels — the native-kernel surface of the framework.

The reference's FLOPs run in cuDNN/cuBLAS (SURVEY.md #21); the TPU-native
equivalent built here: s8 x s8 -> s32 MXU matmuls with a fused dequant +
bias + ReLU + requant epilogue, conv lowered to GEMM (im2col / shifted-matmul
decomposition), and int4 weight-only variants.
"""

from quantized_tpu.ops.int8_matmul import (
    int8_matmul,
    int8_matmul_requant,
    matmul_epilogue_params,
)
from quantized_tpu.ops.int8_conv import im2col_int8, int8_conv_gemm, int8_conv_xla
from quantized_tpu.ops.int4 import pack_int4, unpack_int4, int4_matmul
