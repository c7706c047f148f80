"""Checkpoint ingestion: reference ``.pth.tar`` -> NNX state / int artifacts.

Reference checkpoint format (SURVEY.md section 3.4, utils.py ~L95-115):
``torch.save({'epoch', 'model', 'config', 'state_dict', 'regime',
'best_prec1'})`` where state_dict carries conv/fc weights (OIHW / (out,in)),
BN buffers, and the QuantMeasure observer buffers
(``<layer>.quantize_input.running_min/max``) — the calibration source of truth.
"""

from quantized_tpu.ingest.torch_loader import (
    load_reference_checkpoint,
    state_dict_to_nnx,
    load_into_model,
)
from quantized_tpu.ingest.bn_fold import fold_bn_into_conv, fold_rangebn_into_conv
from quantized_tpu.ingest.calibrate import (
    activation_qparams_from_observer,
    weight_qparams_per_channel,
    weight_qparams_per_tensor,
)
