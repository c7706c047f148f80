"""quantized_tpu — a TPU-native quantized CNN inference & QAT framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
repo ``amishacorns/quantized.pytorch`` (PyTorch fake-quant QAT for
ResNet/AlexNet-class CNNs; see SURVEY.md). The compute path is TPU-first:

- ``quantcore``  — bit-exact affine fake-quant math (reference:
  models/modules/quantize.py) as pure functional JAX.
- ``models``     — Flax NNX model zoo (float + quantized ResNet/AlexNet/
  MobileNet/MNIST; reference: models/*.py).
- ``ingest``     — PyTorch ``.pth.tar`` checkpoint ingestion, BN folding,
  calibration (observer stats -> scales/zero-points), packed int8/int4
  artifacts (reference: utils.py save_checkpoint / main.py --resume).
- ``ops``        — Pallas TPU kernels: int8 MXU matmul/conv with fused
  dequant epilogue, int4 weight-only variants (reference: implicit
  cuDNN/cuBLAS surface, SURVEY.md section 2 #21).
- ``parallel``   — mesh/sharding/collectives: DP batch sharding + TP weight
  sharding over ICI (reference: torch.nn.DataParallel, SURVEY.md #22/#23).
- ``engine``     — true-integer inference executor + continuous batching
  serving engine (new capability per BASELINE.json north star).
- ``training``   — QAT training loop with straight-through estimators,
  gradient quantization and optimizer regimes (reference: main.py, utils.py
  adjust_optimizer).
- ``data``       — dataset registry + torchvision-equivalent preprocessing
  (reference: data.py, preprocess.py).
- ``utils``      — logging, meters, metrics, checkpointing (reference:
  utils.py).
"""

__version__ = "0.1.0"
