"""Data layer: dataset registry + preprocessing (reference data.py /
preprocess.py, SURVEY.md #14/#15)."""

from quantized_tpu.data.datasets import ArrayDataset, get_dataset
from quantized_tpu.data.preprocess import Transform, get_transform
