"""Bit-exact affine quantization core.

Reproduces, as pure functional JAX, the numeric semantics of the reference's
``models/modules/quantize.py`` (UniformQuantize / quantize(), QuantMeasure,
UniformQuantizeGrad / quantize_grad(), conv2d_biprec / linear_biprec, RangeBN
— SURVEY.md section 2, components #1-#7). Everything here is traced-and-jitted
JAX; observer state is threaded explicitly (functional-state idiom) instead of
mutating module buffers.
"""

from quantized_tpu.quantcore.affine import (
    chunked_min_max,
    dequantize,
    fake_quant_array,
    nudged_qparams,
    qparams_from_range,
    quantize_int,
)
from quantized_tpu.quantcore.observers import (
    QuantMeasureState,
    batch_min_max_stat,
    ema_update,
    quant_measure,
)
from quantized_tpu.quantcore.ste import (
    fake_quant,
    quantize_grad,
    conv_biprec,
    linear_biprec,
)
from quantized_tpu.quantcore.rangebn import (
    RANGE_BN_NUM_CHUNKS,
    range_bn_apply,
    range_bn_scale_fix,
    range_bn_stats,
)
