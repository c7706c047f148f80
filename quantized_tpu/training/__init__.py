"""QAT training (reference main.py train loop + utils.py regime engine)."""

from quantized_tpu.training.regime import build_optimizer, regime_settings
from quantized_tpu.training.qat import Trainer
