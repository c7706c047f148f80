"""bf16 per-layer backend + autotuner plumbing (CPU)."""

import json

import jax.numpy as jnp
import numpy as np
from flax import nnx

from quantized_tpu.engine import build_int8_resident
from quantized_tpu.engine.autotune import (
    apply_cached_backends,
    conv_signature,
    _fc_signature,
    _record_shapes,
    _sig_key,
)
from quantized_tpu.engine.int_layers import IntConv2d, IntLinear
from quantized_tpu.models import get_model
from quantized_tpu.models.layers import QuantMeasure


def _calibrated(depth=20):
    m = get_model("resnet_quantized_float_bn")(dataset="cifar10", depth=depth, rngs=nnx.Rngs(0))
    for _, mod in nnx.iter_modules(m):
        if isinstance(mod, QuantMeasure):
            mod.running_min.set_value(jnp.full((1,), -4.0, jnp.float32))
            mod.running_max.set_value(jnp.full((1,), 4.0, jnp.float32))
    m.eval()
    return m


def test_bf16_backend_close_to_int8(rng):
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    ref_model = build_int8_resident(_calibrated())
    ref = ref_model(x)

    bf_model = build_int8_resident(_calibrated())
    n_switched = 0
    for _, m in nnx.iter_modules(bf_model):
        if isinstance(m, IntConv2d):
            m.set_backend("bf16")
            n_switched += 1
    assert n_switched > 10
    out = bf_model(x)
    # bf16 weight rounding shifts logits slightly; decisions must agree
    assert jnp.mean((jnp.argmax(out, -1) == jnp.argmax(ref, -1)).astype(jnp.float32)) == 1.0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.35)


def test_apply_cached_backends_roundtrip(rng, tmp_path):
    import jax

    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    model = build_int8_resident(_calibrated())
    _record_shapes(model, x)

    # fabricate a cache: convs -> bf16, fc -> tuned blocks, one block -> fused
    from quantized_tpu.engine.autotune import _block_signature
    from quantized_tpu.engine.fused import (
        FusedInt8BasicBlock,
        FusedInt8BasicBlockDS,
        fusable,
    )

    table = {}
    for _, m in nnx.iter_modules(model):
        if isinstance(m, IntConv2d) and hasattr(m, "last_input_shape"):
            table[_sig_key(conv_signature(m))] = "bf16"
        elif isinstance(m, IntLinear) and hasattr(m, "last_input_shape"):
            table[_fc_signature(m)] = "pallas:128,256,512"
    fusable_sigs = []
    for i in range(model.num_stages):
        stage = getattr(model, f"layer{i + 1}")
        for j in range(stage.num_blocks):
            blk = getattr(stage, str(j))
            if fusable(blk) and hasattr(blk.conv1, "last_input_shape"):
                fusable_sigs.append(_block_signature(blk))
    assert fusable_sigs, "CIFAR resnet20 should have fusable identity blocks"
    for sig in fusable_sigs:  # several blocks share a signature -> one entry
        table[sig] = "fused"
    cache_path = str(tmp_path / "autotune.json")
    with open(cache_path, "w") as f:
        json.dump({jax.devices()[0].device_kind: table}, f)

    model2 = build_int8_resident(_calibrated())
    assert apply_cached_backends(model2, x, cache_path=cache_path)
    backends = {
        m.backend for _, m in nnx.iter_modules(model2) if isinstance(m, IntConv2d)
    }
    assert backends == {"bf16"}
    fc_backends = {
        m.backend for _, m in nnx.iter_modules(model2) if isinstance(m, IntLinear)
    }
    assert fc_backends == {"pallas:128,256,512"}
    fused_blocks = [
        m for _, m in nnx.iter_modules(model2)
        if isinstance(m, (FusedInt8BasicBlock, FusedInt8BasicBlockDS))
    ]
    assert len(fused_blocks) == len(fusable_sigs)  # every cached "fused" applied
    out = model2(x)
    assert out.shape == (2, 10)


def test_fc_backends_bit_exact(rng):
    """Every fc backend form (xla dot, default Pallas, tuned-block Pallas)
    computes the identical f32 output — the autotuner's race is free to pick
    any of them."""
    K, N, M = 320, 136, 48
    w = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    alpha = jnp.asarray(rng.uniform(0.01, 0.1, N), jnp.float32)
    beta = jnp.asarray(rng.uniform(-1, 1, N), jnp.float32)
    lin = IntLinear(w, alpha, beta, 0.05, 100, relu=True)
    x_q = jnp.asarray(rng.integers(-128, 128, (M, K)), jnp.int8)
    ref = lin.run_q(x_q)
    for b in ("xla", "pallas:128,256,512", "pallas:512,512,512"):
        lin.set_backend(b)
        np.testing.assert_array_equal(np.asarray(lin.run_q(x_q)), np.asarray(ref))


def test_stem_bf16_backend_close_to_int8(rng):
    """Int8SpaceToDepthStem 'bf16' path vs its s8 path: same decisions,
    logits within bf16 weight-rounding tolerance."""
    from quantized_tpu.engine.int8_resident import Int8SpaceToDepthStem

    def build():
        m = get_model("resnet_quantized_float_bn")(
            dataset="imagenet", depth=18, rngs=nnx.Rngs(0))
        for _, mod in nnx.iter_modules(m):
            if isinstance(mod, QuantMeasure):
                mod.running_min.set_value(jnp.full((1,), -4.0, jnp.float32))
                mod.running_max.set_value(jnp.full((1,), 4.0, jnp.float32))
        m.eval()
        return build_int8_resident(m)

    x = jnp.asarray(rng.standard_normal((2, 224, 224, 3)), jnp.float32)
    ref_model = build()
    assert isinstance(ref_model.stem, Int8SpaceToDepthStem)
    ref = ref_model(x)

    bf_model = build()
    bf_model.stem.set_backend("bf16")
    assert bf_model.stem.backend == "bf16"
    out = bf_model(x)
    assert jnp.mean((jnp.argmax(out, -1) == jnp.argmax(ref, -1)).astype(jnp.float32)) == 1.0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.35)


def test_split_backends_match_fused(rng):
    """'xla-split' must be bit-identical to 'xla' (same ops, different
    fusion boundary); 'bf16-split' must match 'bf16' the same way. Whole-net
    check: identical int8 activations at every layer -> identical logits."""
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    ref_model = build_int8_resident(_calibrated())
    ref = ref_model(x)

    split_model = build_int8_resident(_calibrated())
    n = 0
    for _, m in nnx.iter_modules(split_model):
        if isinstance(m, IntConv2d):
            m.set_backend("xla-split")
            n += 1
    assert n > 10
    np.testing.assert_array_equal(np.asarray(split_model(x)), np.asarray(ref))

    bf_model = build_int8_resident(_calibrated())
    bfs_model = build_int8_resident(_calibrated())
    for model, backend in ((bf_model, "bf16"), (bfs_model, "bf16-split")):
        for _, m in nnx.iter_modules(model):
            if isinstance(m, IntConv2d):
                m.set_backend(backend)
    np.testing.assert_array_equal(np.asarray(bfs_model(x)), np.asarray(bf_model(x)))


def test_bf16_backend_at_construction(rng):
    """CLI --resident --backend bf16 constructs IntConv2d with backend='bf16'
    directly; the dequantized weight copy must materialize in __init__
    (regression: it was only created in set_backend, crashing first forward)."""
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    model = build_int8_resident(_calibrated(), backend="bf16")
    out = model(x)
    assert out.shape == (2, 10)
    ref = build_int8_resident(_calibrated())
    for _, m in nnx.iter_modules(ref):
        if isinstance(m, IntConv2d):
            m.set_backend("bf16")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref(x)))


def test_frozen_fused_race_defaults_unfused(rng, monkeypatch):
    """Round-4 freeze: unseen block signatures default to 'unfused' WITHOUT
    timing (the fused kernels lose for the structural ~327 GB/s DMA-cap
    reason on every raced signature); QTPU_TUNE_FUSED=1 re-enables racing."""
    import quantized_tpu.engine.autotune as at

    monkeypatch.delenv("QTPU_TUNE_FUSED", raising=False)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    model = build_int8_resident(_calibrated())
    _record_shapes(model, x)

    timed = []
    monkeypatch.setattr(at, "_time_block", lambda *a, **k: timed.append(a) or 1.0)
    table = {}
    measured = at._tune_blocks(model, table, verbose=False)
    assert measured > 0
    assert not timed, "frozen policy must not race"
    assert set(table.values()) == {"unfused"}
    assert all(k.startswith("block:") for k in table)

    # opt-in re-race: with the env set, unseen signatures are timed again
    monkeypatch.setenv("QTPU_TUNE_FUSED", "1")
    model2 = build_int8_resident(_calibrated())
    _record_shapes(model2, x)
    at._tune_blocks(model2, {}, verbose=False)
    assert timed, "QTPU_TUNE_FUSED=1 must measure"
