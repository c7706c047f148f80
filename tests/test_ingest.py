"""Checkpoint ingestion tests: reference-format .pth.tar round-trip into NNX
models, BN folding correctness, calibration math (SURVEY.md section 4
cross-framework oracle strategy)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from flax import nnx

from quantized_tpu.ingest import (
    activation_qparams_from_observer,
    fold_bn_into_conv,
    fold_rangebn_into_conv,
    load_into_model,
    load_reference_checkpoint,
    weight_qparams_per_channel,
)
from quantized_tpu.models import get_model


def _nnx_state_to_reference_state_dict(model) -> dict:
    """Inverse of the ingest mapping: build a torch state_dict with the
    reference's key names/layouts from an NNX model (test-only helper)."""
    flat = nnx.to_flat_state(nnx.state(model))
    out = {}
    for path, var in flat:
        parts = [str(p) for p in path]
        path_str = ".".join(parts)
        if "rng" in path_str.lower() or "dropout" in path_str.lower():
            continue
        val = np.asarray(var.get_value())
        leaf = parts[-1]
        prefix = parts[:-1]
        # downsample named children -> Sequential indices
        prefix = ["0" if (p == "conv" and i > 0 and prefix[i - 1] == "downsample") else p for i, p in enumerate(prefix)]
        prefix = ["1" if (p == "bn" and i > 0 and prefix[i - 1] == "downsample") else p for i, p in enumerate(prefix)]
        if leaf == "kernel":  # HWIO -> OIHW
            out[".".join(prefix + ["weight"])] = torch.from_numpy(val.transpose(3, 2, 0, 1).copy())
        elif leaf in ("scale", "mean", "var") and val.ndim == 1:
            name = {"scale": "weight", "mean": "running_mean", "var": "running_var"}[leaf]
            out[".".join(prefix + [name])] = torch.from_numpy(val.copy())
        else:
            out[".".join(prefix + [leaf])] = torch.from_numpy(val.copy())
    return out


@pytest.mark.parametrize(
    "name,cfg,in_shape",
    [
        ("resnet_quantized_float_bn", dict(dataset="cifar10", depth=20), (2, 32, 32, 3)),
        ("resnet_quantized", dict(dataset="cifar10", depth=20), (2, 32, 32, 3)),
        ("resnet", dict(dataset="cifar10", depth=20), (2, 32, 32, 3)),
    ],
)
def test_checkpoint_roundtrip(tmp_path, name, cfg, in_shape):
    # source model with non-trivial observer/BN state
    src = get_model(name)(rngs=nnx.Rngs(7), **cfg)
    src.train()
    src(jax.random.normal(jax.random.PRNGKey(0), in_shape))
    src.eval()

    # save in the reference's checkpoint.pth.tar format (utils.py ~L95-115)
    ckpt_path = os.path.join(tmp_path, "checkpoint.pth.tar")
    torch.save(
        {
            "epoch": 3,
            "model": name,
            "config": cfg,
            "state_dict": _nnx_state_to_reference_state_dict(src),
            "best_prec1": 55.5,
        },
        ckpt_path,
    )

    loaded = load_reference_checkpoint(ckpt_path)
    assert loaded["meta"]["epoch"] == 3 and loaded["meta"]["best_prec1"] == 55.5

    dst = get_model(name)(rngs=nnx.Rngs(99), **cfg)  # different init
    load_into_model(dst, ckpt_path)
    dst.eval()

    x = jax.random.normal(jax.random.PRNGKey(1), in_shape)
    np.testing.assert_allclose(np.asarray(src(x)), np.asarray(dst(x)), rtol=1e-5, atol=1e-5)


def test_dataparallel_prefix_stripped(tmp_path):
    src = get_model("resnet")(dataset="cifar10", depth=20, rngs=nnx.Rngs(1))
    sd = _nnx_state_to_reference_state_dict(src)
    sd = {f"module.{k}": v for k, v in sd.items()}
    p = os.path.join(tmp_path, "dp.pth.tar")
    torch.save({"state_dict": sd}, p)
    dst = get_model("resnet")(dataset="cifar10", depth=20, rngs=nnx.Rngs(2))
    load_into_model(dst, p)
    src.eval(), dst.eval()
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))
    np.testing.assert_allclose(np.asarray(src(x)), np.asarray(dst(x)), rtol=1e-5, atol=1e-5)


def test_bn_fold_exact(rng):
    from quantized_tpu.models.layers import conv2d_nhwc

    cin, cout = 8, 16
    w = rng.standard_normal((3, 3, cin, cout), dtype=np.float32) * 0.1
    b = rng.standard_normal(cout).astype(np.float32) * 0.1
    gamma = rng.random(cout, dtype=np.float32) + 0.5
    beta = rng.standard_normal(cout).astype(np.float32) * 0.2
    mean = rng.standard_normal(cout).astype(np.float32) * 0.3
    var = rng.random(cout, dtype=np.float32) + 0.1
    eps = 1e-5

    x = jnp.asarray(rng.standard_normal((2, 8, 8, cin)).astype(np.float32))
    y_ref = conv2d_nhwc(x, jnp.asarray(w), 1, 1) + b
    y_ref = (y_ref - mean) / np.sqrt(var + eps) * gamma + beta

    wf, bf = fold_bn_into_conv(w, b, gamma, beta, mean, var, eps)
    y_fold = conv2d_nhwc(x, jnp.asarray(wf), 1, 1) + bf
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref), rtol=1e-4, atol=1e-5)


def test_rangebn_fold_matches_module(rng):
    """Folded conv+RangeBN must equal conv -> RangeBN eval forward (with the
    RangeBN input observer wide-open so only the BN affine matters)."""
    from quantized_tpu.models.layers import RangeBN, conv2d_nhwc

    cin, cout = 4, 8
    w = rng.standard_normal((3, 3, cin, cout), dtype=np.float32) * 0.2
    x = jnp.asarray(rng.standard_normal((2, 8, 8, cin)).astype(np.float32))
    z = conv2d_nhwc(x, jnp.asarray(w), 1, 1)

    bn = RangeBN(cout, rngs=nnx.Rngs(0))
    bn.running_mean.set_value(jnp.asarray(rng.standard_normal(cout).astype(np.float32) * 0.1))
    bn.running_var.set_value(jnp.asarray(rng.random(cout, dtype=np.float32) + 0.5))
    # keep the observer out of the comparison: huge symmetric range ~ identity
    # is impossible (grid step grows), so instead use the exact z range
    bn.quantize_input.running_min.set_value(jnp.full((1,), float(z.min())))
    bn.quantize_input.running_max.set_value(jnp.full((1,), float(z.max())))
    bn.eval()
    y_mod = bn(z)

    wf, bf = fold_rangebn_into_conv(
        w,
        None,
        np.asarray(bn.weight.get_value()),
        np.asarray(bn.bias.get_value()),
        np.asarray(bn.running_mean.get_value()),
        np.asarray(bn.running_var.get_value()),
    )
    # fold cannot reproduce the observer fake-quant of z (the engine requants
    # at the conv output instead); quantize z the same way, then apply the
    # folded conv: conv(x, W*f) + b' == z*f + b' for the same z
    from quantized_tpu.quantcore import fake_quant_array

    zq = fake_quant_array(z, 8, float(z.min()), float(z.max()), num_chunks=16)
    y_fold = np.asarray(zq) * (wf[0, 0, 0, :] / w[0, 0, 0, :]) + bf
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_mod), rtol=1e-3, atol=1e-4)


def test_activation_qparams_nudged():
    qp = activation_qparams_from_observer(-1.0, 3.0)
    assert 0 <= qp.zero_point <= 255
    # zero must be exactly representable
    z = qp.dequantize(np.asarray([[qp.zero_point]], np.uint8))
    assert abs(float(z)) < 1e-9
    # round trip error bounded by scale/2
    x = np.linspace(-1, 3, 1001, dtype=np.float32)
    err = np.abs(qp.dequantize(qp.quantize(x)) - x).max()
    assert err <= qp.scale / 2 + 1e-7


def test_weight_qparams_per_channel(rng):
    w = rng.standard_normal((3, 3, 8, 16)).astype(np.float32)
    qp = weight_qparams_per_channel(w)
    q = qp.quantize(w)
    assert q.dtype == np.int8 and q.min() >= -127
    err = np.abs(qp.dequantize(q) - w)
    # per-channel bound: scale_c / 2
    assert np.all(err <= qp.scale[None, None, None, :] / 2 + 1e-7)


def test_alexnet_export_matches_torch_reference_semantics(tmp_path):
    """Cross-framework oracle for the AlexNet layout conversions: export our
    NHWC model to a reference-format .pth.tar, load it into a torch
    re-statement of reference models/alexnet.py (NCHW, conv->pool->BN->ReLU,
    NCHW flatten), and require the two forwards to agree. This pins the
    OIHW<->HWIO conv transpose, the BN name mapping, AND the fc1
    (C,H,W)<->(H,W,C) flatten permutation semantically."""
    import torch
    import torch.nn.functional as TF
    from flax import nnx

    from quantized_tpu.models import get_model
    from quantized_tpu.utils.checkpoint import export_reference_checkpoint

    model = get_model("alexnet")(num_classes=10, rngs=nnx.Rngs(3))
    model.eval()
    # give BN stats non-trivial values so the mapping is actually exercised
    rng = np.random.default_rng(0)
    for _, mod in nnx.iter_modules(model):
        if isinstance(mod, nnx.BatchNorm):
            n = mod.mean.get_value().shape[0]
            mod.mean.set_value(jnp.asarray(rng.standard_normal(n) * 0.1, jnp.float32))
            mod.var.set_value(jnp.asarray(rng.uniform(0.5, 1.5, n), jnp.float32))

    path = str(tmp_path / "alexnet_ref.pth.tar")
    export_reference_checkpoint(model, path, {"model": "alexnet"})
    sd = torch.load(path, weights_only=False)["state_dict"]

    class TorchRefAlexNet(torch.nn.Module):
        """Reference models/alexnet.py semantics (eval mode)."""

        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(3, 64, 11, 4, 2, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(64)
            self.conv2 = torch.nn.Conv2d(64, 192, 5, 1, 2, bias=False)
            self.bn2 = torch.nn.BatchNorm2d(192)
            self.conv3 = torch.nn.Conv2d(192, 384, 3, 1, 1, bias=False)
            self.bn3 = torch.nn.BatchNorm2d(384)
            self.conv4 = torch.nn.Conv2d(384, 256, 3, 1, 1, bias=False)
            self.bn4 = torch.nn.BatchNorm2d(256)
            self.conv5 = torch.nn.Conv2d(256, 256, 3, 1, 1, bias=False)
            self.bn5 = torch.nn.BatchNorm2d(256)
            self.fc1 = torch.nn.Linear(256 * 6 * 6, 4096, bias=False)
            self.bnf1 = torch.nn.BatchNorm1d(4096)
            self.fc2 = torch.nn.Linear(4096, 4096, bias=False)
            self.bnf2 = torch.nn.BatchNorm1d(4096)
            self.fc3 = torch.nn.Linear(4096, 10)

        def forward(self, x):
            pool = lambda v: TF.max_pool2d(v, 3, 2)
            x = TF.relu(self.bn1(pool(self.conv1(x))))
            x = TF.relu(self.bn2(pool(self.conv2(x))))
            x = TF.relu(self.bn3(self.conv3(x)))
            x = TF.relu(self.bn4(self.conv4(x)))
            x = TF.relu(self.bn5(pool(self.conv5(x))))
            x = x.reshape(x.size(0), -1)  # NCHW flatten (reference order)
            x = TF.relu(self.bnf1(self.fc1(x)))
            x = TF.relu(self.bnf2(self.fc2(x)))
            return self.fc3(x)

    tm = TorchRefAlexNet().eval()
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in k for k in missing), missing

    x = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    ours = np.asarray(model(jnp.asarray(x)))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-3)


def test_mnist_export_matches_torch_reference_semantics(tmp_path):
    """Same cross-framework oracle for the MNIST toy net (conv->pool x2 ->
    NCHW flatten -> fc): pins its flatten_linear permutation."""
    import torch
    import torch.nn.functional as TF
    from flax import nnx

    from quantized_tpu.models import get_model
    from quantized_tpu.utils.checkpoint import export_reference_checkpoint

    m = get_model("mnist")(rngs=nnx.Rngs(1))
    m.eval()
    path = str(tmp_path / "mnist.pth.tar")
    export_reference_checkpoint(m, path, {})
    sd = torch.load(path, weights_only=False)["state_dict"]

    class TorchRefMnist(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(1, 10, 5)
            self.conv2 = torch.nn.Conv2d(10, 20, 5)
            self.fc1 = torch.nn.Linear(320, 50)
            self.fc2 = torch.nn.Linear(50, 10)

        def forward(self, x):
            x = TF.relu(TF.max_pool2d(self.conv1(x), 2))
            x = TF.relu(TF.max_pool2d(self.conv2(x), 2))
            x = x.reshape(x.size(0), -1)
            return self.fc2(TF.relu(self.fc1(x)))

    tm = TorchRefMnist().eval()
    tm.load_state_dict(sd)
    x = np.random.default_rng(0).standard_normal((2, 28, 28, 1)).astype(np.float32)
    ours = np.asarray(m(jnp.asarray(x)))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


def test_resnet_cifar_export_matches_torch_reference_semantics(tmp_path):
    """Cross-framework oracle for the ResNet CIFAR geometry: export our
    depth-20 model, load into a torch re-statement of reference
    ResNet_cifar10 (incl. downsample Sequential index mapping), compare
    forwards."""
    import torch
    import torch.nn.functional as TF
    from flax import nnx

    from quantized_tpu.models import get_model
    from quantized_tpu.utils.checkpoint import export_reference_checkpoint

    model = get_model("resnet")(dataset="cifar10", depth=20, rngs=nnx.Rngs(5))
    model.eval()
    rng = np.random.default_rng(0)
    for _, mod in nnx.iter_modules(model):
        if isinstance(mod, nnx.BatchNorm):
            n = mod.mean.get_value().shape[0]
            mod.mean.set_value(jnp.asarray(rng.standard_normal(n) * 0.1, jnp.float32))
            mod.var.set_value(jnp.asarray(rng.uniform(0.5, 1.5, n), jnp.float32))
    path = str(tmp_path / "r20.pth.tar")
    export_reference_checkpoint(model, path, {})
    sd = torch.load(path, weights_only=False)["state_dict"]

    class TBlock(torch.nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(cout)
            self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = torch.nn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = torch.nn.Sequential(
                    torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
                    torch.nn.BatchNorm2d(cout),
                )

        def forward(self, x):
            res = x if self.downsample is None else self.downsample(x)
            out = TF.relu(self.bn1(self.conv1(x)))
            return TF.relu(self.bn2(self.conv2(out)) + res)

    class TResNet20(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(3, 16, 3, 1, 1, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(16)
            self.layer1 = torch.nn.Sequential(*[TBlock(16, 16, 1) for _ in range(3)])
            self.layer2 = torch.nn.Sequential(TBlock(16, 32, 2), TBlock(32, 32, 1), TBlock(32, 32, 1))
            self.layer3 = torch.nn.Sequential(TBlock(32, 64, 2), TBlock(64, 64, 1), TBlock(64, 64, 1))
            self.fc = torch.nn.Linear(64, 10)

        def forward(self, x):
            x = TF.relu(self.bn1(self.conv1(x)))
            x = self.layer3(self.layer2(self.layer1(x)))
            x = x.mean(dim=(2, 3))
            return self.fc(x)

    tm = TResNet20().eval()
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in k for k in missing), missing

    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(model(jnp.asarray(x)))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_torch_authored_qat_checkpoint_ingest(tmp_path):
    """Ingest a checkpoint whose observer/BN buffers were produced by a TORCH
    training loop (VERDICT r3 missing #4): every prior interop test either
    exported JAX->torch or ingested JAX-written .pth.tars, leaving the
    reference's actual artifact — running_min/max EMAs and BN stats authored
    by torch autograd steps — untested. Here a torch re-statement of the
    reference's QConv2d/QuantMeasure/QLinear modules (quantize.py ~L15-110,
    ~L200-330 semantics: per-sample-extrema-mean batch stats, inverted EMA,
    per-forward per-tensor weight min/max, STE) trains a depth-20 CIFAR
    float-BN quantized ResNet for a few SGD steps, saves the
    reference-shaped dict, and the ingested JAX model + int engine must
    agree with the torch model's fake-quant eval."""
    import torch
    import torch.nn.functional as TF

    MOMENTUM = 0.1

    def t_fq(x, num_bits=8, mn=None, mx=None):
        # reference UniformQuantize without noise; STE via detach
        qmin, qmax = 0.0, 2.0**num_bits - 1.0
        if mn is None:
            mn = x.detach().min()
        if mx is None:
            mx = x.detach().max()
        scale = torch.clamp((mx - mn) / (qmax - qmin), min=1e-8)
        q = ((x.detach() - mn) / scale + qmin).clamp(qmin, qmax).round()
        y = (q - qmin) * scale + mn
        return x + (y - x).detach()

    class TQuantMeasure(torch.nn.Module):
        def __init__(self, num_bits=8):
            super().__init__()
            self.num_bits = num_bits
            self.register_buffer("running_min", torch.zeros(1))
            self.register_buffer("running_max", torch.zeros(1))

        def forward(self, x):
            if self.training:
                f = x.detach().reshape(x.shape[0], -1)
                mn, mx = f.min(-1)[0].mean(), f.max(-1)[0].mean()
                # inverted EMA: new value gets weight (1 - momentum) = 0.9
                self.running_min.mul_(MOMENTUM).add_(mn * (1 - MOMENTUM))
                self.running_max.mul_(MOMENTUM).add_(mx * (1 - MOMENTUM))
            else:
                mn, mx = self.running_min[0], self.running_max[0]
            return t_fq(x, self.num_bits, mn, mx)

    class TQConv2d(torch.nn.Conv2d):
        def __init__(self, cin, cout, k, stride=1, padding=0):
            super().__init__(cin, cout, k, stride, padding, bias=False)
            self.quantize_input = TQuantMeasure()

        def forward(self, x):
            qx = self.quantize_input(x)
            qw = t_fq(self.weight)  # per-tensor min/max, every forward
            return TF.conv2d(qx, qw, None, self.stride, self.padding)

    class TQLinear(torch.nn.Linear):
        def __init__(self, cin, cout):
            super().__init__(cin, cout, bias=True)
            self.quantize_input = TQuantMeasure()

        def forward(self, x):
            return TF.linear(self.quantize_input(x), t_fq(self.weight), t_fq(self.bias))

    class TBlock(torch.nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = TQConv2d(cin, cout, 3, stride, 1)
            self.bn1 = torch.nn.BatchNorm2d(cout)
            self.conv2 = TQConv2d(cout, cout, 3, 1, 1)
            self.bn2 = torch.nn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = torch.nn.Sequential(
                    TQConv2d(cin, cout, 1, stride, 0), torch.nn.BatchNorm2d(cout)
                )

        def forward(self, x):
            res = x if self.downsample is None else self.downsample(x)
            out = TF.relu(self.bn1(self.conv1(x)))
            return TF.relu(self.bn2(self.conv2(out)) + res)

    class TQResNet20(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = TQConv2d(3, 16, 3, 1, 1)
            self.bn1 = torch.nn.BatchNorm2d(16)
            self.layer1 = torch.nn.Sequential(*[TBlock(16, 16, 1) for _ in range(3)])
            self.layer2 = torch.nn.Sequential(TBlock(16, 32, 2), TBlock(32, 32, 1), TBlock(32, 32, 1))
            self.layer3 = torch.nn.Sequential(TBlock(32, 64, 2), TBlock(64, 64, 1), TBlock(64, 64, 1))
            self.fc = TQLinear(64, 10)

        def forward(self, x):
            x = TF.relu(self.bn1(self.conv1(x)))
            x = self.layer3(self.layer2(self.layer1(x)))
            return self.fc(x.mean(dim=(2, 3)))

    torch.manual_seed(0)
    tm = TQResNet20()
    rng = np.random.default_rng(5)
    opt = torch.optim.SGD(tm.parameters(), lr=0.05, momentum=0.9)
    tm.train()
    for _ in range(6):  # torch autograd QAT steps author the buffers
        xb = torch.from_numpy(rng.standard_normal((16, 3, 32, 32)).astype(np.float32))
        yb = torch.from_numpy(rng.integers(0, 10, 16))
        opt.zero_grad()
        TF.cross_entropy(tm(xb), yb).backward()
        opt.step()
    tm.eval()

    path = str(tmp_path / "torch_qat.pth.tar")
    torch.save({"epoch": 6, "model": "resnet_quantized_float_bn",
                "state_dict": tm.state_dict(), "best_prec1": 0.0}, path)

    ours = get_model("resnet_quantized_float_bn")(dataset="cifar10", depth=20,
                                                  rngs=nnx.Rngs(42))
    load_into_model(ours, path)
    ours.eval()

    # torch-authored EMA values must land verbatim in the JAX observers
    np.testing.assert_array_equal(
        np.asarray(ours.conv1.quantize_input.running_min.value),
        tm.conv1.quantize_input.running_min.numpy())
    np.testing.assert_array_equal(
        np.asarray(getattr(ours.layer2, "0").downsample.conv.quantize_input.running_max.value),
        tm.layer2[0].downsample[0].quantize_input.running_max.numpy())

    xv = rng.standard_normal((32, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        theirs = tm(torch.from_numpy(xv.transpose(0, 3, 1, 2))).numpy()
    mine = np.asarray(ours(jnp.asarray(xv)))
    # fake-quant eval equality: f32 drift near round() boundaries can flip
    # single int steps that propagate, so bound the bulk and the decisions
    assert np.abs(mine - theirs).max() < 0.05, np.abs(mine - theirs).max()
    assert (np.abs(mine - theirs) > 1e-3).mean() < 0.05
    assert (mine.argmax(-1) == theirs.argmax(-1)).mean() >= 0.95

    # the int engine built from the torch-authored artifact must agree too.
    # Strict mode is the designed exact twin of fake-quant eval (per-tensor
    # weight grid); the barely-trained model's logits are near-flat, so the
    # per-channel resident engine's (better) grid legitimately flips the
    # near-tied argmax — strict is the right parity target here.
    import copy

    from quantized_tpu.engine import convert_to_int_strict

    eng = convert_to_int_strict(copy.deepcopy(ours))
    got = np.asarray(eng(jnp.asarray(xv)))
    assert np.abs(got - mine).max() < 0.02, np.abs(got - mine).max()
    assert (got.argmax(-1) == mine.argmax(-1)).mean() >= 0.95
