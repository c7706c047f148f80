"""Utilities (reference utils.py, SURVEY.md #16-#19): logging/results,
meters/metrics, checkpointing, optimizer regimes."""

from quantized_tpu.utils.meters import AverageMeter, accuracy
from quantized_tpu.utils.logging_utils import ResultsLog, setup_logging
from quantized_tpu.utils.profiling import trace, start_server, annotate
from quantized_tpu.utils.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    wait_for_checkpoints,
    export_reference_checkpoint,
)
