"""Packed int4 conv weights (BASELINE config #4 — int4-W storage halving)."""

import jax.numpy as jnp
import numpy as np
from flax import nnx

from quantized_tpu.engine import build_int8_resident, convert_to_int
from quantized_tpu.models import get_model
from quantized_tpu.models.layers import QuantMeasure
from quantized_tpu.ops.int4 import pack_int4_conv, unpack_int4_conv


def _calibrated():
    m = get_model("resnet_quantized_float_bn")(dataset="cifar10", depth=20, rngs=nnx.Rngs(0))
    for _, mod in nnx.iter_modules(m):
        if isinstance(mod, QuantMeasure):
            mod.running_min.set_value(jnp.full((1,), -4.0, jnp.float32))
            mod.running_max.set_value(jnp.full((1,), 4.0, jnp.float32))
    m.eval()
    return m


def test_pack_unpack_conv_roundtrip(rng):
    for shape in [(7, 7, 3, 64), (3, 3, 64, 64), (1, 1, 256, 64)]:  # incl. odd K
        q = jnp.asarray(rng.integers(-7, 8, shape), jnp.int8)
        packed, s = pack_int4_conv(q)
        assert packed.shape[0] == (shape[0] * shape[1] * shape[2] + 1) // 2
        np.testing.assert_array_equal(np.asarray(unpack_int4_conv(packed, s)), np.asarray(q))


def test_int4_packed_conv_engine_bitexact(rng):
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    unpacked = convert_to_int(_calibrated(), weight_bits=4, int4_pack_conv=False)(x)
    packed = convert_to_int(_calibrated(), weight_bits=4, int4_pack_conv=True)(x)
    np.testing.assert_array_equal(np.asarray(unpacked), np.asarray(packed))


def test_int4_resident_runs(rng):
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    out = build_int8_resident(_calibrated(), weight_bits=4)(x)
    assert out.shape == (4, 10)
    assert bool(jnp.all(jnp.isfinite(out)))
