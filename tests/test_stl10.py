"""STL-10 binary loader (reference data.py registers torchvision STL10)."""

import numpy as np

from quantized_tpu.data import datasets


def test_stl10_binary_roundtrip(rng, tmp_path, monkeypatch):
    d = tmp_path / "STL10" / "stl10_binary"
    d.mkdir(parents=True)
    n = 5
    # STL-10 stores CHW with column-major planes: write W,H transposed
    images_nhwc = rng.integers(0, 256, (n, 96, 96, 3), dtype=np.uint8)
    raw = images_nhwc.transpose(0, 3, 2, 1)  # N,C,W,H on disk
    (d / "test_X.bin").write_bytes(raw.tobytes())
    labels = rng.integers(1, 11, n, dtype=np.uint8)  # 1-based on disk
    (d / "test_y.bin").write_bytes(labels.tobytes())

    monkeypatch.setattr(datasets, "DATA_DIR", str(tmp_path))
    ds = datasets.get_dataset("stl10", "val", allow_synthetic=False)
    assert not ds.synthetic and len(ds.labels) == n
    np.testing.assert_array_equal(ds.images[0], images_nhwc[0])
    np.testing.assert_array_equal(ds.labels, labels.astype(np.int64) - 1)


def test_stl10_synthetic_fallback():
    ds = datasets.get_dataset("stl10", "train")
    assert ds.synthetic and ds.images.shape[1:] == (96, 96, 3)
