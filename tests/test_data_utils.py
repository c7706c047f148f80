"""Data registry, preprocessing, meters, results log, checkpoint tests."""

import os

import numpy as np
import pytest

from quantized_tpu.data import get_dataset, get_transform
from quantized_tpu.utils import AverageMeter, ResultsLog, accuracy


def test_real_data_dropin_cifar_and_mnist(tmp_path, monkeypatch):
    """The QTPU_DATA_DIR drop-in path (VERDICT standing item): plant REAL
    on-disk formats — CIFAR-10 python pickles and MNIST idx files — and the
    registry must load those bytes (synthetic=False), so real datasets work
    the moment they land in the sandbox."""
    import pickle

    from quantized_tpu.data import datasets as D

    rng = np.random.default_rng(0)
    # CIFAR-10: 5 train pickles + test_batch, torchvision's exact layout
    # (N,3072) uint8 rows in CHW order, byte-keyed dict)
    cdir = tmp_path / "cifar-10-batches-py"
    cdir.mkdir()
    train_rows, train_labels = [], []
    for i in range(1, 6):
        data = rng.integers(0, 256, (4, 3072), dtype=np.uint8)
        labels = rng.integers(0, 10, 4).tolist()
        with open(cdir / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)
        train_rows.append(data)
        train_labels.extend(labels)
    with open(cdir / "test_batch", "wb") as f:
        pickle.dump({b"data": rng.integers(0, 256, (4, 3072), dtype=np.uint8),
                     b"labels": rng.integers(0, 10, 4).tolist()}, f)
    # MNIST: idx3/idx1 with their 16/8-byte headers
    mdir = tmp_path / "MNIST" / "raw"
    mdir.mkdir(parents=True)
    mnist_imgs = rng.integers(0, 256, (6, 28, 28), dtype=np.uint8)
    (mdir / "train-images-idx3-ubyte").write_bytes(b"\x00" * 16 + mnist_imgs.tobytes())
    (mdir / "train-labels-idx1-ubyte").write_bytes(b"\x00" * 8 + bytes(range(6)))

    monkeypatch.setattr(D, "DATA_DIR", str(tmp_path))
    cifar = get_dataset("cifar10", "train", None)
    assert not cifar.synthetic and len(cifar) == 20
    want = np.concatenate(train_rows).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(cifar.images, want)
    assert list(cifar.labels) == train_labels
    mnist = get_dataset("mnist", "train", None)
    assert not mnist.synthetic and len(mnist) == 6
    np.testing.assert_array_equal(mnist.images[:, :, :, 0], mnist_imgs)
    assert list(mnist.labels) == list(range(6))


def test_dataset_registry_and_synthetic_fallback():
    ds = get_dataset("cifar10", "val", get_transform("cifar10"))
    assert len(ds) > 0
    img, label = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert 0 <= label < 10
    with pytest.raises(ValueError, match="unknown dataset"):
        get_dataset("nope")
    with pytest.raises(FileNotFoundError):
        get_dataset("imagenet", allow_synthetic=False)


def test_synthetic_class_signatures_shared_across_splits():
    tr = get_dataset("synthetic", "train")
    va = get_dataset("synthetic", "val")
    # per-class mean images must correlate strongly across splits
    def class_means(ds):
        return np.stack([
            ds.images[ds.labels == c].mean(axis=0).ravel() for c in range(10)
        ])
    m_tr, m_va = class_means(tr), class_means(va)
    for c in range(10):
        r = np.corrcoef(m_tr[c], m_va[c])[0, 1]
        assert r > 0.9, (c, r)


def test_batches_shapes_and_determinism():
    ds = get_dataset("synthetic", "val", get_transform("cifar10"))
    b1 = list(ds.batches(64, shuffle=True, seed=1, drop_remainder=True))
    b2 = list(ds.batches(64, shuffle=True, seed=1, drop_remainder=True))
    assert all(x.shape == (64, 32, 32, 3) for x, _ in b1)
    np.testing.assert_array_equal(b1[0][1], b2[0][1])


def test_transform_eval_path_matches_torchvision_semantics():
    # Resize(256 shorter side) -> CenterCrop(224) -> /255 -> normalize
    from quantized_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD

    tf = get_transform("imagenet", augment=False)
    img = np.random.default_rng(0).integers(0, 256, (300, 400, 3)).astype(np.uint8)
    out = tf(img)
    assert out.shape == (224, 224, 3)
    # un-normalize a pixel and check it lies in [0,1]
    back = out * IMAGENET_STD + IMAGENET_MEAN
    assert back.min() >= -1e-5 and back.max() <= 1 + 1e-5


def test_transform_train_augment_is_random_but_seeded():
    tf = get_transform("cifar10", augment=True)
    img = np.random.default_rng(0).integers(0, 256, (32, 32, 3)).astype(np.uint8)
    a = tf(img, np.random.default_rng(7))
    b = tf(img, np.random.default_rng(7))
    c = tf(img, np.random.default_rng(8))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_meters_and_accuracy():
    m = AverageMeter()
    m.update(1.0, 2)
    m.update(2.0, 2)
    assert m.avg == 1.5 and m.count == 4
    logits = np.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    t1, t2 = accuracy(logits, np.asarray([1, 1]), topk=(1, 2))
    assert t1 == 50.0 and t2 == 100.0


def test_results_log_roundtrip(tmp_path):
    rl = ResultsLog(os.path.join(tmp_path, "res.csv"))
    rl.plot("epoch", ["loss"], title="loss")
    rl.add(epoch=0, loss=1.0)
    rl.add(epoch=1, loss=0.5)
    rl.save("t")
    assert os.path.exists(rl.path) and os.path.exists(rl.plot_path)
    assert os.path.exists(rl.jsonl_path)
    import pandas as pd

    df = pd.read_csv(rl.path)
    assert list(df["loss"]) == [1.0, 0.5]


def test_native_checkpoint_roundtrip(tmp_path):
    import jax
    from flax import nnx

    from quantized_tpu.models import get_model
    from quantized_tpu.utils import load_checkpoint, save_checkpoint

    m = get_model("resnet")(dataset="cifar10", depth=20, rngs=nnx.Rngs(3))
    save_checkpoint(m, str(tmp_path), meta={"epoch": 7, "best_prec1": 12.3}, is_best=True)
    m2 = get_model("resnet")(dataset="cifar10", depth=20, rngs=nnx.Rngs(9))
    meta = load_checkpoint(m2, str(tmp_path))
    assert meta["epoch"] == 7
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    m.eval(), m2.eval()
    np.testing.assert_allclose(np.asarray(m(x)), np.asarray(m2(x)), rtol=1e-6, atol=1e-6)
    # best copy exists
    assert any("model_best" in f for f in os.listdir(tmp_path))


def test_async_checkpoint_save_all_roundtrip(tmp_path):
    """Async (Orbax background) saves: pipelined one deep, drained by
    wait_for_checkpoints; --save_all per-epoch copies land after the drain."""
    import jax
    from flax import nnx

    from quantized_tpu.models import get_model
    from quantized_tpu.utils import load_checkpoint, save_checkpoint, wait_for_checkpoints

    m = get_model("resnet")(dataset="cifar10", depth=20, rngs=nnx.Rngs(3))
    for epoch in (1, 2):
        save_checkpoint(
            m, str(tmp_path), meta={"epoch": epoch}, is_best=(epoch == 2),
            save_all=True, async_save=True,
        )
    wait_for_checkpoints()
    files = os.listdir(tmp_path)
    assert any("checkpoint_epoch_1" in f for f in files), files
    assert any("checkpoint_epoch_2" in f for f in files), files
    assert any("model_best" in f for f in files), files
    m2 = get_model("resnet")(dataset="cifar10", depth=20, rngs=nnx.Rngs(9))
    meta = load_checkpoint(m2, str(tmp_path))
    assert meta["epoch"] == 2
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    m.eval(), m2.eval()
    np.testing.assert_allclose(np.asarray(m(x)), np.asarray(m2(x)), rtol=1e-6, atol=1e-6)


def test_reference_export_then_ingest_roundtrip(tmp_path):
    import jax
    from flax import nnx

    from quantized_tpu.ingest import load_into_model
    from quantized_tpu.models import get_model
    from quantized_tpu.utils.checkpoint import export_reference_checkpoint

    m = get_model("resnet_quantized_float_bn")(dataset="cifar10", depth=20, rngs=nnx.Rngs(3))
    m.train()
    m(jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3)))
    m.eval()
    p = os.path.join(tmp_path, "exp.pth.tar")
    export_reference_checkpoint(m, p, {"epoch": 2})
    m2 = get_model("resnet_quantized_float_bn")(dataset="cifar10", depth=20, rngs=nnx.Rngs(8))
    load_into_model(m2, p)
    m2.eval()
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    np.testing.assert_allclose(np.asarray(m(x)), np.asarray(m2(x)), rtol=1e-5, atol=1e-5)


def test_color_jitter_matches_reference_formulas():
    """Grayscale/Saturation/Brightness/Contrast (reference preprocess.py
    ~L100-200) vs an independent torch re-statement of the same lerp math
    on CHW tensors."""
    import torch

    from quantized_tpu.data.preprocess import (
        brightness_jitter,
        contrast_jitter,
        grayscale,
        saturation_jitter,
    )

    rng = np.random.default_rng(7)
    img = rng.random((9, 11, 3)).astype(np.float32)  # HWC [0,1]
    t = torch.from_numpy(img.transpose(2, 0, 1)).double()  # CHW like the reference

    # Grayscale: luma replicated to 3 channels
    gs_t = 0.299 * t[0] + 0.587 * t[1] + 0.114 * t[2]
    np.testing.assert_allclose(
        grayscale(img), np.stack([gs_t.numpy()] * 3, -1), rtol=0, atol=1e-6
    )

    # each jitter with a pinned alpha (feed a deterministic one-value rng)
    class FixedRng:
        def __init__(self, a):
            self.a = a

        def uniform(self, lo, hi):
            assert lo == 0.0
            return self.a * hi

    alpha = 0.3 * 0.4  # U(0, 0.4) drawn at 0.3 of the range
    sat = t.lerp(torch.stack([gs_t] * 3), alpha)
    np.testing.assert_allclose(
        saturation_jitter(img, 0.4, FixedRng(0.3)),
        sat.numpy().transpose(1, 2, 0), rtol=0, atol=1e-6)
    bri = t.lerp(torch.zeros_like(t), alpha)
    np.testing.assert_allclose(
        brightness_jitter(img, 0.4, FixedRng(0.3)),
        bri.numpy().transpose(1, 2, 0), rtol=0, atol=1e-6)
    con = t.lerp(torch.full_like(t, float(gs_t.mean())), alpha)
    np.testing.assert_allclose(
        contrast_jitter(img, 0.4, FixedRng(0.3)),
        con.numpy().transpose(1, 2, 0), rtol=0, atol=1e-5)


def test_inception_color_pipeline():
    """imagenet_inception_color = RandomSizedCrop + flip + ColorJitter +
    PCA lighting + normalize (reference inception_color_preproccess)."""
    from quantized_tpu.data.preprocess import color_jitter

    tr = get_transform("imagenet_inception_color", augment=True)
    assert tr.jitter == 0.4 and tr.lighting_std == 0.1 and tr.inception
    img = np.random.default_rng(0).integers(0, 256, (300, 280, 3), np.uint8)
    out1 = tr(img, np.random.default_rng(5))
    out2 = tr(img, np.random.default_rng(5))
    out3 = tr(img, np.random.default_rng(6))
    assert out1.shape == (224, 224, 3) and out1.dtype == np.float32
    np.testing.assert_array_equal(out1, out2)
    assert np.abs(out1 - out3).max() > 1e-3  # different seed -> different aug

    # zero-strength jitter is the identity
    x = np.random.default_rng(1).random((8, 8, 3)).astype(np.float32)
    np.testing.assert_array_equal(color_jitter(x, 0, 0, 0, np.random.default_rng(0)), x)
