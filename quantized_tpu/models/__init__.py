"""Model registry (reference ``models/__init__.py`` star-imports, SURVEY.md #13).

``get_model(name)(**config)`` replaces the reference's
``models.__dict__[args.model](**model_config)`` lookup.
"""

from quantized_tpu.models.alexnet import alexnet
from quantized_tpu.models.alexnet_quantized import alexnet_quantized
from quantized_tpu.models.mnist import mnist
from quantized_tpu.models.mobilenet import mobilenet, mobilenet_quantized
from quantized_tpu.models.resnet import resnet
from quantized_tpu.models.resnet_quantized import resnet_quantized
from quantized_tpu.models.resnet_quantized_float_bn import resnet_quantized_float_bn

MODEL_REGISTRY = {
    "alexnet": alexnet,
    "alexnet_quantized": alexnet_quantized,
    "mnist": mnist,
    "mobilenet": mobilenet,
    "mobilenet_quantized": mobilenet_quantized,
    "resnet": resnet,
    "resnet_quantized": resnet_quantized,
    "resnet_quantized_float_bn": resnet_quantized_float_bn,
}


def get_model(name: str):
    """Look up a model factory by its reference-compatible name."""
    try:
        return MODEL_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}"
        ) from None
