"""True-integer inference engine.

Converts calibrated fake-quant models (frozen QuantMeasure observers) into
integer-executing models: BN folded into conv weights, per-channel symmetric
int8 weights, activations quantized to the observers' uint8 grids at each conv
input, s8 x s8 -> s32 MXU matmuls with fused dequant+bias+ReLU epilogues
(BASELINE.json north star). Serving (continuous batching) lives in
``quantized_tpu.engine.batching`` / ``server``; the multi-host form
(per-host admission queues over one global SPMD forward) in
``quantized_tpu.engine.multihost``.
"""

from quantized_tpu.engine.convert import convert_to_int
from quantized_tpu.engine.strict import (
    StrictIntConv2d,
    StrictIntLinear,
    convert_to_int_strict,
)
from quantized_tpu.engine.int_layers import IntConv2d, IntLinear, Identity
from quantized_tpu.engine.int8_resident import build_int8_resident, Int8ResNet
from quantized_tpu.engine.int8_alexnet import build_int8_alexnet, Int8AlexNet
from quantized_tpu.engine.int8_mobilenet import build_int8_mobilenet, Int8MobileNet
from quantized_tpu.engine.autotune import autotune_resident, apply_cached_backends
from quantized_tpu.engine.executor import IntExecutor
from quantized_tpu.engine.multihost import (
    HostShardedExecutor,
    MultiHostBatcher,
    serve_multihost,
)
