"""Model zoo tests: construction, forward shapes, observer train/eval
semantics, quantized-vs-float closeness (SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from quantized_tpu.models import MODEL_REGISTRY, get_model


def _make(name, **cfg):
    return get_model(name)(rngs=nnx.Rngs(0), **cfg)


@pytest.mark.parametrize(
    "name,cfg,in_shape,out_dim",
    [
        ("resnet", dict(dataset="cifar10", depth=20), (2, 32, 32, 3), 10),
        ("resnet_quantized", dict(dataset="cifar10", depth=20), (2, 32, 32, 3), 10),
        ("resnet_quantized_float_bn", dict(dataset="cifar10", depth=20), (2, 32, 32, 3), 10),
        ("mnist", dict(), (2, 28, 28, 1), 10),
    ],
)
def test_forward_shapes_small(name, cfg, in_shape, out_dim):
    model = _make(name, **cfg)
    model.eval()
    x = jax.random.normal(jax.random.PRNGKey(0), in_shape)
    y = model(x)
    assert y.shape == (in_shape[0], out_dim)
    assert bool(jnp.all(jnp.isfinite(y)))


@pytest.mark.parametrize(
    "name,cfg",
    [
        ("resnet", dict(dataset="imagenet", depth=18)),
        ("resnet_quantized_float_bn", dict(dataset="imagenet", depth=50)),
        ("alexnet", dict()),
        ("alexnet_quantized", dict()),
        ("mobilenet", dict()),
        ("mobilenet_quantized", dict()),
    ],
)
def test_forward_shapes_imagenet(name, cfg):
    model = _make(name, **cfg)
    model.eval()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 224, 224, 3))
    y = model(x)
    assert y.shape == (1, 1000)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_registry_covers_reference_factories():
    # reference factory names (SURVEY.md section 2 #8-#13) must all resolve
    for name in [
        "resnet",
        "resnet_quantized",
        "resnet_quantized_float_bn",
        "alexnet",
        "mobilenet",
        "mnist",
    ]:
        assert name in MODEL_REGISTRY
    with pytest.raises(ValueError, match="unknown model"):
        get_model("nope")


def test_model_metadata():
    m = _make("resnet", dataset="imagenet", depth=18)
    assert m.regime[0]["lr"] == 0.1 and 30 in m.regime
    assert m.input_size == 224
    c = _make("resnet", dataset="cifar10", depth=20)
    assert 81 in c.regime and c.input_size == 32


def test_observers_update_in_train_freeze_in_eval():
    model = _make("resnet_quantized_float_bn", dataset="cifar10", depth=20)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3)) * 2.0
    model.train()
    before = float(model.conv1.quantize_input.running_max.value[0])
    model(x)
    after = float(model.conv1.quantize_input.running_max.value[0])
    assert after != before  # EMA moved
    model.eval()
    model(x)
    frozen = float(model.conv1.quantize_input.running_max.value[0])
    assert frozen == after  # eval does not touch buffers


def test_quantized_close_to_float_at_8bit():
    # 8-bit fake-quant of a random-init net should stay close to its float
    # twin when sharing identical parameters.
    import copy

    qm = _make("resnet_quantized_float_bn", dataset="cifar10", depth=20)
    fm = _make("resnet", dataset="cifar10", depth=20)
    # copy q params into float twin (same tree structure for kernel/bn)
    qstate = nnx.state(qm, nnx.Param)
    fstate = nnx.state(fm, nnx.Param)
    qflat = dict(nnx.to_flat_state(qstate))
    fflat = dict(nnx.to_flat_state(fstate))
    for k in fflat:
        assert k in qflat, f"param tree mismatch at {k}"
        fflat[k].set_value(qflat[k].get_value())
    nnx.update(fm, nnx.from_flat_state(fflat))
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 32, 32, 3))
    qm.train()
    qout = qm(x)  # train mode: observers use batch stats (ranges are sane)
    fm.eval()
    # float twin: BN must use batch stats too for apples-to-apples
    fm.train()
    fout = fm(x)
    # 8-bit QAT forward stays within a tight band of fp32
    rel = float(jnp.linalg.norm(qout - fout) / (jnp.linalg.norm(fout) + 1e-9))
    assert rel < 0.35, rel


def test_jit_eval_forward():
    model = _make("resnet_quantized_float_bn", dataset="cifar10", depth=20)
    model.eval()
    # give observers a plausible range first
    model.train()
    model(jax.random.normal(jax.random.PRNGKey(3), (4, 32, 32, 3)))
    model.eval()

    @nnx.jit
    def fwd(m, x):
        return m(x)

    x = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 32, 3))
    y1 = fwd(model, x)
    y2 = model(x)
    # jit fuses/reorders float math; tiny pre-round deltas can cross fake-quant
    # rounding boundaries, so allow a small logit-level band.
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-2, atol=5e-3)
