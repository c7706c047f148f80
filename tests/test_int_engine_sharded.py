"""Int8 engine tensor-sharded over a virtual mesh (BASELINE config #5 on the
8-CPU-device stand-in — SURVEY.md section 4 'multi-host without a cluster').

The int8-resident model's weights shard over the model axis, activations over
the data axis; the sharded forward must match the single-device forward."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from jax.sharding import NamedSharding, PartitionSpec as P

from quantized_tpu.engine import build_int8_resident
from quantized_tpu.models import get_model
from quantized_tpu.models.layers import QuantMeasure
from quantized_tpu.parallel import (
    DATA_AXIS,
    create_mesh,
    shard_int_engine_state,
)


def _calibrated(depth=20):
    m = get_model("resnet_quantized_float_bn")(dataset="cifar10", depth=depth, rngs=nnx.Rngs(0))
    for _, mod in nnx.iter_modules(m):
        if isinstance(mod, QuantMeasure):
            mod.running_min.set_value(jnp.full((1,), -4.0, jnp.float32))
            mod.running_max.set_value(jnp.full((1,), 4.0, jnp.float32))
    m.eval()
    return m


def test_int8_resident_sharded_matches_single_device(rng):
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32)

    ref_model = build_int8_resident(_calibrated())
    ref = np.asarray(ref_model(x))

    mesh = create_mesh(num_devices=8)  # (data, model) factorization
    model = build_int8_resident(_calibrated())
    graphdef, state = nnx.split(model)
    state = shard_int_engine_state(state, mesh)

    xs = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS, None, None, None)))

    @jax.jit
    def fwd(state, xx):
        return nnx.merge(graphdef, state)(xx)

    out = np.asarray(fwd(state, xs))
    # integer accumulations are exact; only f32 epilogue order may drift
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-5)

    # weights really are distributed: find a sharded conv kernel
    sharded = [
        leaf for leaf in jax.tree.leaves(state)
        if getattr(leaf, "ndim", 0) == 4 and not leaf.sharding.is_fully_replicated
    ]
    assert sharded, "no conv kernel ended up tensor-sharded"


def test_int8_alexnet_sharded_matches_single_device(rng):
    """Int8AlexNet under the same DP/TP rules (shape-based specs cover its
    conv/fc tree, including the fc1 9216->4096 column shard)."""
    from quantized_tpu.engine import build_int8_alexnet

    def calibrated():
        m = get_model("alexnet_quantized")(rngs=nnx.Rngs(0))
        for _, mod in nnx.iter_modules(m):
            if isinstance(mod, QuantMeasure):
                mod.running_min.set_value(jnp.full((1,), -4.0, jnp.float32))
                mod.running_max.set_value(jnp.full((1,), 4.0, jnp.float32))
        m.eval()
        return m

    x = jnp.asarray(rng.standard_normal((8, 224, 224, 3)), jnp.float32)
    ref = np.asarray(build_int8_alexnet(calibrated())(x))

    mesh = create_mesh(num_devices=8)
    model = build_int8_alexnet(calibrated())
    graphdef, state = nnx.split(model)
    state = shard_int_engine_state(state, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS, None, None, None)))

    @jax.jit
    def fwd(s, v):
        return nnx.merge(graphdef, s)(v)

    got = np.asarray(fwd(state, xs))
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=0)


def test_int8_mobilenet_sharded_matches_single_device(rng):
    """Int8MobileNet under DP/TP — includes grouped/depthwise kernels
    ((3,3,1,C) HWIO shards its out-channel axis; GSPMD handles the grouped
    conv partitioning)."""
    from quantized_tpu.engine import build_int8_mobilenet

    def calibrated():
        m = get_model("mobilenet_quantized")(rngs=nnx.Rngs(0))
        for _, mod in nnx.iter_modules(m):
            if isinstance(mod, QuantMeasure):
                mod.running_min.set_value(jnp.full((1,), -4.0, jnp.float32))
                mod.running_max.set_value(jnp.full((1,), 4.0, jnp.float32))
        m.eval()
        return m

    x = jnp.asarray(rng.standard_normal((8, 224, 224, 3)), jnp.float32)
    ref = np.asarray(build_int8_mobilenet(calibrated())(x))

    mesh = create_mesh(num_devices=8)
    model = build_int8_mobilenet(calibrated())
    graphdef, state = nnx.split(model)
    state = shard_int_engine_state(state, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS, None, None, None)))

    @jax.jit
    def fwd(s, v):
        return nnx.merge(graphdef, s)(v)

    np.testing.assert_array_equal(np.asarray(fwd(state, xs)), ref)
