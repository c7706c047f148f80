"""Integer-engine tests: conversion correctness vs fake-quant semantics
(SURVEY.md section 7 step 3 requantization check) and executor behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from quantized_tpu.engine import IntExecutor, convert_to_int
from quantized_tpu.engine.int_layers import Identity, IntConv2d, IntLinear
from quantized_tpu.models import get_model
from quantized_tpu.models.layers import QConv2d, conv2d_nhwc


def _calibrated(name, key=0, shape=(8, 32, 32, 3), **cfg):
    model = get_model(name)(rngs=nnx.Rngs(0), **cfg)
    model.train()
    model(jax.random.normal(jax.random.PRNGKey(key), shape) * 1.5)
    model.eval()
    return model


def test_single_conv_int_vs_fakequant_one_ulp(rng):
    """A lone QConv2d + BN converted to int must match the float composition
    of (observer fake-quant -> conv -> BN) within ~1 activation quant step."""
    cin, cout = 8, 16
    conv = QConv2d(cin, cout, 3, padding=1, use_bias=False, rngs=nnx.Rngs(0))
    bn = nnx.BatchNorm(cout, momentum=0.9, rngs=nnx.Rngs(0))
    # calibrate
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, cin))
    conv.train() if hasattr(conv, "train") else None
    conv.quantize_input.use_running_average = False
    bn.use_running_average = False
    _ = bn(conv(x))
    conv.quantize_input.use_running_average = True
    bn.use_running_average = True

    # reference float path with *float* weights (per-channel engine upgrade
    # replaces the reference's per-tensor weight grid; compare against float
    # weights and budget the weight-quant error separately)
    ref = bn(conv2d_nhwc(conv.quantize_input(x), conv.kernel.get_value(), 1, 1))

    class Holder(nnx.Module):
        def __init__(self):
            self.conv1 = conv
            self.bn1 = bn

        def __call__(self, v):
            return self.bn1(self.conv1(v))

    h = Holder()
    convert_to_int(h)
    assert isinstance(h.conv1, IntConv2d) and isinstance(h.bn1, Identity)
    got = h(x)
    act_step = h.conv1.act_scale
    err = np.abs(np.asarray(got) - np.asarray(ref))
    # bound: input-quant is shared; weight-quant residual ~ |W|*eps_w; allow a
    # few activation steps
    assert err.max() < 5 * act_step, (err.max(), act_step)


@pytest.mark.parametrize("name,cfg,shape", [
    ("resnet_quantized_float_bn", dict(dataset="cifar10", depth=20), (8, 32, 32, 3)),
    ("resnet_quantized", dict(dataset="cifar10", depth=20), (8, 32, 32, 3)),
])
def test_full_model_int_close_to_fakequant(name, cfg, shape):
    model = _calibrated(name, shape=shape, **cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), shape)
    ref_logits = np.asarray(model(x))

    convert_to_int(model)
    got_logits = np.asarray(model(x))

    # logits drift (different weight grids + folded BN) but ranking must agree
    ref_top1 = ref_logits.argmax(-1)
    got_top1 = got_logits.argmax(-1)
    agree = (ref_top1 == got_top1).mean()
    rel = np.linalg.norm(got_logits - ref_logits) / (np.linalg.norm(ref_logits) + 1e-9)
    assert agree >= 0.75, (agree, rel)
    assert rel < 0.5, rel


def test_int4_weight_only_mode():
    model = _calibrated("resnet_quantized_float_bn", dataset="cifar10", depth=20)
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 32, 32, 3))
    ref_logits = np.asarray(model(x))
    convert_to_int(model, weight_bits=4)
    # fc is int4-packed
    assert model.fc.int4 and model.fc.w_q.get_value().dtype == jnp.int8
    got = np.asarray(model(x))
    rel = np.linalg.norm(got - ref_logits) / (np.linalg.norm(ref_logits) + 1e-9)
    assert rel < 1.0  # int4 is lossier; just sanity-bound it
    assert np.isfinite(got).all()


def test_executor_jit_and_results_stable():
    model = _calibrated("resnet_quantized_float_bn", dataset="cifar10", depth=20)
    convert_to_int(model)
    ex = IntExecutor(model)
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 32, 32, 3))
    y1 = np.asarray(ex(x))
    y2 = np.asarray(ex(x))
    np.testing.assert_array_equal(y1, y2)
    assert y1.shape == (4, 10)


def test_gemm_backend_matches_xla_backend():
    model_x = _calibrated("resnet_quantized_float_bn", dataset="cifar10", depth=20)
    model_g = _calibrated("resnet_quantized_float_bn", dataset="cifar10", depth=20)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 32, 32, 3))
    convert_to_int(model_x, backend="xla")
    convert_to_int(model_g, backend="gemm")
    yx = np.asarray(model_x(x))
    yg = np.asarray(model_g(x))
    # int accumulators are exact in both backends; residual deltas come from
    # f32 epilogue op ordering crossing a requant bin boundary at some layer
    # (one activation step), so allow a small logit band.
    np.testing.assert_allclose(yg, yx, rtol=1e-2, atol=2e-2)


def test_mobilenet_grouped_conv_conversion():
    # structural conversion + finite output. (A tight fake-quant-vs-int logit
    # bound is not meaningful here: the reference's per-TENSOR weight grid and
    # the engine's per-CHANNEL upgrade diverge strongly on random-init
    # depthwise layers; real-accuracy parity is covered by the accuracy
    # harness against the float twin.)
    model = _calibrated("mobilenet_quantized", key=2, shape=(2, 224, 224, 3))
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 224, 224, 3))
    convert_to_int(model)
    assert isinstance(model.block0.dw, IntConv2d) and model.block0.dw.groups > 1
    got = np.asarray(model(x))
    assert np.isfinite(got).all()


def test_grouped_conv_integer_contract_exact(rng):
    """Depthwise int8 conv must equal float conv on the dequantized grids
    (the zero-point/colsum correction must be group-correct)."""
    from quantized_tpu.ops.int8_conv import int8_conv_xla
    from quantized_tpu.ops.int8_matmul import matmul_epilogue_params

    c = 16
    s_a, zp = 0.03, 21
    w = rng.standard_normal((3, 3, 1, c)).astype(np.float32) * 0.2
    s_w = np.max(np.abs(w.reshape(-1, c)), axis=0) / 127.0
    w_q = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
    colsum = w_q.astype(np.int32).reshape(-1, c).sum(0)
    bias = rng.standard_normal(c).astype(np.float32) * 0.1

    u = rng.integers(0, 256, (2, 8, 8, c))
    x_q = (u - 128).astype(np.int8)
    alpha, beta = matmul_epilogue_params(s_a, zp, jnp.asarray(s_w), jnp.asarray(colsum), jnp.asarray(bias))
    got = np.asarray(
        int8_conv_xla(jnp.asarray(x_q), jnp.asarray(w_q), alpha, beta, 1, 1, zp - 128, groups=c)
    )
    # float reference on dequantized values with zp padding semantics
    x_hat = (u - zp).astype(np.float32) * s_a
    w_hat = w_q.astype(np.float32) * s_w
    from quantized_tpu.models.layers import conv2d_nhwc

    want = np.asarray(conv2d_nhwc(jnp.asarray(x_hat), jnp.asarray(w_hat), 1, 1, groups=c)) + bias
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_alexnet_conversion_runs():
    model = _calibrated("alexnet_quantized", key=3, shape=(2, 224, 224, 3))
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 224, 224, 3))
    ref = np.asarray(model(x))
    convert_to_int(model)
    assert isinstance(model.fc1, IntLinear) and isinstance(model.bnf1, Identity)
    got = np.asarray(model(x))
    assert np.isfinite(got).all()
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree >= 0.5  # random init; just structural sanity


def test_multihost_batcher_single_process(rng):
    """MultiHostBatcher's degenerate single-process path: the coordinated
    scheduler over a data-sharded virtual mesh must match the plain engine
    (the 2-process DCN form is tests/test_multiprocess_distributed.py)."""
    from quantized_tpu.engine import build_int8_resident
    from quantized_tpu.engine.multihost import serve_multihost
    from quantized_tpu.models.layers import QuantMeasure
    from quantized_tpu.parallel import create_mesh

    def calibrated():
        m = get_model("resnet_quantized_float_bn")(dataset="cifar10", depth=20,
                                                   rngs=nnx.Rngs(0))
        for _, mod in nnx.iter_modules(m):
            if isinstance(mod, QuantMeasure):
                mod.running_min.set_value(jnp.full((1,), -4.0, jnp.float32))
                mod.running_max.set_value(jnp.full((1,), 4.0, jnp.float32))
        m.eval()
        return m

    images = rng.standard_normal((6, 32, 32, 3)).astype(np.float32)
    ref = np.asarray(build_int8_resident(calibrated())(jnp.asarray(images)))

    mesh = create_mesh(num_devices=8, model_parallel=4)  # data=2 x model=4
    batcher = serve_multihost(
        build_int8_resident(calibrated()), mesh,
        batch_sizes=(2, 4), input_shape=(32, 32, 3),
    )
    try:
        futures = [batcher.submit(img) for img in images]
        for i, f in enumerate(futures):
            np.testing.assert_allclose(f.result(timeout=120), ref[i],
                                       atol=1e-4, rtol=1e-5)
    finally:
        batcher.stop()
    assert batcher.stats()["requests"] == len(images)


def test_multihost_idle_heartbeat(rng):
    """With no traffic anywhere, every host must still reach the count
    allgather on a fixed heartbeat (round-3 advisor high finding: an
    unbounded drain parks an idle host and stalls its peers)."""
    import time

    from quantized_tpu.engine.multihost import MultiHostBatcher

    coordinations = []

    class Counting(MultiHostBatcher):
        def _coordinate(self, n_local, done_local, err_local=False):
            coordinations.append(n_local)
            return super()._coordinate(n_local, done_local, err_local)

    batcher = Counting(lambda b: np.zeros((b.shape[0], 10), np.float32),
                       (8, 8, 3), batch_sizes=(2, 4)).start()
    try:
        time.sleep(0.5)
        # heartbeat is ~50 ms -> several empty coordination rounds while idle
        assert len(coordinations) >= 3, len(coordinations)
        assert batcher.steps == 0
        # a late request is still served after the idle stretch
        f = batcher.submit(rng.standard_normal((8, 8, 3)).astype(np.float32))
        assert f.result(timeout=30).shape == (10,)
    finally:
        batcher.stop()


def test_multihost_executor_failure_is_fatal(rng):
    """An executor failure fails the step's futures AND everything queued,
    then exits the loop — continuing would desynchronize the allgather counts
    across hosts (round-3 advisor medium finding)."""
    from quantized_tpu.engine.multihost import MultiHostBatcher

    def bad_executor(batch):
        raise RuntimeError("injected device failure")

    batcher = MultiHostBatcher(bad_executor, (8, 8, 3), batch_sizes=(2,)).start()
    img = rng.standard_normal((8, 8, 3)).astype(np.float32)
    f1 = batcher.submit(img)
    with pytest.raises(RuntimeError, match="injected device failure"):
        f1.result(timeout=30)
    # the loop must terminate on its own (stop flag set by _fail_all)
    batcher._thread.join(timeout=10)
    assert not batcher._thread.is_alive()
    # late submissions are not silently parked: queue is already stopped, and
    # anything that made it into the queue before the break was failed
    assert batcher._stop.is_set()


def test_multihost_batcher_u8_ingest(rng):
    """HostShardedExecutor's fused uint8 ingest path (4x smaller request
    payloads) through the coordinated batcher, single-process mesh form."""
    from quantized_tpu.engine import build_int8_resident
    from quantized_tpu.engine.multihost import serve_multihost
    from quantized_tpu.models.layers import QuantMeasure
    from quantized_tpu.parallel import create_mesh

    def calibrated():
        m = get_model("resnet_quantized_float_bn")(dataset="cifar10", depth=20,
                                                   rngs=nnx.Rngs(0))
        for _, mod in nnx.iter_modules(m):
            if isinstance(mod, QuantMeasure):
                mod.running_min.set_value(jnp.full((1,), -4.0, jnp.float32))
                mod.running_max.set_value(jnp.full((1,), 4.0, jnp.float32))
        m.eval()
        return m

    images = rng.integers(0, 256, (4, 32, 32, 3)).astype(np.uint8)
    ref_model = build_int8_resident(calibrated())
    ref = np.asarray(ref_model.run_u8(jnp.asarray(images)))

    mesh = create_mesh(num_devices=8, model_parallel=4)
    batcher = serve_multihost(
        build_int8_resident(calibrated()), mesh,
        batch_sizes=(2, 4), input_shape=(32, 32, 3), ingest="u8",
    )
    try:
        futures = [batcher.submit(img) for img in images]
        for i, f in enumerate(futures):
            np.testing.assert_allclose(f.result(timeout=120), ref[i],
                                       atol=1e-4, rtol=1e-5)
    finally:
        batcher.stop()


def test_warm_start_skips_recompiles(tmp_path):
    """Cold-start regression (VERDICT r4 next-step #6): with the persistent
    compilation cache enabled, a server restart (fresh in-memory jit caches)
    must LOAD the engine executable from disk, not recompile it. Asserted via
    jax's own cache counters: second bring-up records cache_hits and zero
    cache_misses, and writes no new cache files."""
    import os as _os

    import jax

    from quantized_tpu.engine import build_int8_resident
    from quantized_tpu.models import get_model
    from quantized_tpu.models.layers import QuantMeasure

    prev_dir = jax.config.jax_compilation_cache_dir
    events = []
    active = [True]
    jax.monitoring.register_event_listener(
        lambda name, *a, **kw: events.append(name) if active[0] else None)
    try:
        jax.config.update("jax_compilation_cache_dir", str(tmp_path))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        # the cache object is a lazily-initialized singleton: if an earlier
        # test already touched the repo cache, the dir change above would
        # silently not take effect without a reset
        from jax.experimental.compilation_cache import compilation_cache as _cc

        _cc.reset_cache()

        def bring_up():
            m = get_model("resnet_quantized_float_bn")(dataset="cifar10", depth=20,
                                                       rngs=nnx.Rngs(0))
            for _, mod in nnx.iter_modules(m):
                if isinstance(mod, QuantMeasure):
                    mod.running_min.set_value(jnp.full((1,), -4.0, jnp.float32))
                    mod.running_max.set_value(jnp.full((1,), 4.0, jnp.float32))
            m.eval()
            eng = build_int8_resident(m)
            graphdef, state = nnx.split(eng)
            fwd = jax.jit(lambda s, x: nnx.merge(graphdef, s)(x))
            return np.asarray(fwd(state, jnp.zeros((4, 32, 32, 3), jnp.float32)))

        # drop every in-memory executable BEFORE the first bring-up: aux
        # computations compiled by earlier tests (pre-dir-switch) would
        # otherwise skip run 1, never land in the tmp cache, and read as
        # spurious misses in run 2
        jax.clear_caches()
        out1 = bring_up()
        files1 = sum(len(fs) for _, _, fs in _os.walk(tmp_path))
        assert files1 > 0, "first bring-up wrote nothing to the persistent cache"
        events.clear()

        jax.clear_caches()  # simulate the restart: in-memory caches gone
        out2 = bring_up()
        files2 = sum(len(fs) for _, _, fs in _os.walk(tmp_path))
        np.testing.assert_array_equal(out1, out2)
        hits = sum(1 for e in events if e.endswith("cache_hits"))
        misses = sum(1 for e in events if e.endswith("cache_misses"))
        assert hits >= 1, events
        assert misses == 0, f"warm start recompiled: {misses} misses"
        assert files2 == files1, "warm start wrote new executables"
    finally:
        active[0] = False
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        from jax.experimental.compilation_cache import compilation_cache as _cc

        _cc.reset_cache()  # re-point the singleton at the restored dir


def test_rangebn_observer_clamp_in_folded_engines():
    """Round-5 fix: folding RangeBN into the conv must PRESERVE the RangeBN
    input observer's range clip (a saturating nonlinearity the QAT network
    trains against — dropping it cost 17 top-1 pt on the trained flagship:
    91.02 -> 73.44, clip-only ablation recovered 90.62, measured 2026-08-21).
    Regression form: narrow the observers so the clip BINDS hard on random
    inputs, then the folded engines must track fake-quant; the same engines
    with the clamp stripped must diverge (guards against the clamp silently
    becoming a no-op)."""
    from quantized_tpu.engine import build_int8_resident
    from quantized_tpu.models import layers as L

    rng = np.random.default_rng(7)

    def calibrated():
        m = get_model("resnet_quantized")(dataset="cifar10", depth=20, rngs=nnx.Rngs(0))
        m.train()
        calib = nnx.jit(lambda mm, v: mm(v))
        for i in range(3):
            calib(m, jnp.asarray(rng.standard_normal((16, 32, 32, 3)), jnp.float32))
        m.eval()
        # narrow every RangeBN input observer to 40% of its calibrated range:
        # the clip now binds on a large fraction of activations (the trained-
        # checkpoint regime, where the net saturates its observers)
        for _, node in nnx.iter_graph(m):
            if isinstance(node, L.RangeBN):
                o = node.quantize_input
                o.running_min.set_value(o.running_min.get_value() * 0.4)
                o.running_max.set_value(o.running_max.get_value() * 0.4)
        return m

    x = jnp.asarray(rng.standard_normal((32, 32, 32, 3)), jnp.float32)
    ref = np.asarray(calibrated()(x))
    ref_top1 = ref.argmax(-1)

    from quantized_tpu.engine import convert_to_int

    exact = convert_to_int(calibrated(), weight_bits=8)
    # the clamp must actually be wired
    clips = [m.y_clip for _, m in nnx.iter_modules(exact)
             if hasattr(m, "y_clip") and m.y_clip is not None]
    assert clips, "no IntConv2d carries the RangeBN observer clamp"
    got = np.asarray(exact(x))
    agree = (got.argmax(-1) == ref_top1).mean()
    assert agree >= 0.9, agree

    resident = build_int8_resident(calibrated())
    got_res = np.asarray(resident(x))
    agree_res = (got_res.argmax(-1) == ref_top1).mean()
    assert agree_res >= 0.9, agree_res

    # strip the clamp: the engines must now diverge from fake-quant (the
    # narrowed clip binds) — proves the clamp is load-bearing, not vestigial
    stripped = convert_to_int(calibrated(), weight_bits=8)
    for _, m in nnx.iter_modules(stripped):
        if hasattr(m, "y_clip"):
            m.y_clip = None
    got_strip = np.asarray(stripped(x))
    rel = np.linalg.norm(got_strip - ref) / (np.linalg.norm(ref) + 1e-9)
    rel_clamped = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel > 2 * rel_clamped, (rel, rel_clamped)
