"""Per-layer backend autotuner for the int8-resident engine.

XLA's s8 conv path wins on most ResNet shapes on v5e (50-70% of int8 peak on
the deep 3x3s), but individual layers can prefer the bf16 MXU path or a
Pallas kernel depending on geometry (bandwidth-bound early layers, small-M
late layers). This tuner measures each *distinct conv signature* of a built
``Int8ResNet`` in place — real input shapes recorded from one forward trace,
real requant epilogues — and pins each layer's ``backend`` to the winner.

Results are cached per device kind in a JSON table so production builds skip
the measurement (reference has no counterpart: this replaces cuDNN's
internal algorithm heuristics — SURVEY.md section 2 #21).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from quantized_tpu.engine.int_layers import IntConv2d

logger = logging.getLogger(__name__)

DEFAULT_CACHE = os.path.join(os.path.dirname(__file__), "..", "..", "autotune_cache.json")


def conv_signature(conv: IntConv2d) -> Tuple:
    w = conv.w_q.get_value()
    return (
        tuple(conv.last_input_shape),
        tuple(w.shape),
        tuple(conv.stride),
        tuple(conv.padding),
        conv.groups,
    )


def _sig_key(sig: Tuple) -> str:
    return json.dumps(sig)


def _record_shapes(model: nnx.Module, example_input: jax.Array) -> None:
    """Trace one forward abstractly (``jax.eval_shape`` — no device work, no
    eager tunnel dispatches) so every IntConv2d learns its input shape. nnx
    forbids mutating outer modules inside a trace, so run_q logs into a side
    registry which is copied onto the modules afterwards."""
    from quantized_tpu.engine import int_layers

    recorder: dict = {}
    int_layers._SHAPE_RECORDER = recorder
    try:
        jax.eval_shape(
            lambda x: model(x),
            jax.ShapeDtypeStruct(example_input.shape, example_input.dtype),
        )
    finally:
        int_layers._SHAPE_RECORDER = None
    for _, m in nnx.iter_modules(model):
        if isinstance(m, IntConv2d) and id(m) in recorder:
            m.last_input_shape = recorder[id(m)]


def _time_backend(conv: IntConv2d, backend: str, requant=(0.05, 128)) -> float:
    from quantized_tpu.utils.timing import per_iter_time

    prev = conv.backend
    conv.set_backend(backend)
    n, h, w, c = conv.last_input_shape
    x = jnp.zeros((n, h, w, c), jnp.int8)
    graphdef, state = nnx.split(conv)

    def step(carry, state, x):
        m = nnx.merge(graphdef, state)
        y = m.run_q((x + carry.astype(jnp.int8)).astype(jnp.int8), relu=True, out_requant=requant)
        return jnp.max(y).astype(jnp.float32) * 1e-9

    try:
        dt = per_iter_time(step, state, x, target_secs=0.4)
    finally:
        conv.backend = prev
    return dt


def autotune_resident(
    model: nnx.Module,
    example_input: jax.Array,
    backends: Sequence[str] = ("xla", "bf16", "xla-split", "bf16-split"),
    cache_path: Optional[str] = DEFAULT_CACHE,
    verbose: bool = True,
) -> Dict[str, str]:
    """Tune every IntConv2d in ``model`` in place; returns {sig_key: backend}.

    Runs one *abstract* forward (``jax.eval_shape`` — no device work, and no
    eager op-by-op dispatch through the axon tunnel) to record per-layer
    input shapes, then times each distinct signature on the live device.
    Pass ``cache_path=None`` to force re-measurement.
    """
    _record_shapes(model, example_input)

    device_kind = jax.devices()[0].device_kind
    cache: Dict[str, Dict[str, str]] = {}
    if cache_path and os.path.exists(cache_path):
        with open(cache_path) as f:
            cache = json.load(f)
    table = cache.setdefault(device_kind, {})

    convs = [
        m for _, m in nnx.iter_modules(model)
        if isinstance(m, IntConv2d) and hasattr(m, "last_input_shape")
    ]
    measured = 0
    for conv in convs:
        key = _sig_key(conv_signature(conv))
        if key not in table:
            conv_backends = list(backends)
            if conv.int4_shape is not None:
                # packed int4 layers also race the native-S4 two-half-conv
                # forms against the unpack-single-conv "xla" forms
                conv_backends += ["s4", "s4-split"]
            times = {}
            for b in conv_backends:
                if b in ("pallas", "gemm") and conv.groups != 1:
                    continue
                try:
                    times[b] = _time_backend(conv, b)
                except Exception as e:  # pragma: no cover - device-specific
                    logger.warning("backend %s failed for %s: %s", b, key, e)
            best = min(times, key=times.get)
            table[key] = best
            measured += 1
            if verbose:
                desc = " ".join(f"{b}={t*1e3:.3f}ms" for b, t in sorted(times.items()))
                print(f"autotune {key}: {desc} -> {best}", flush=True)
        conv.set_backend(table[key])

    measured += _tune_maxpool(model, example_input, table)
    measured += _tune_stem(model, example_input, table, verbose=verbose)

    if cache_path and measured:
        with open(cache_path, "w") as f:
            json.dump(cache, f, indent=1)
    return table


def _tune_maxpool(model: nnx.Module, example_input: jax.Array, table: Dict[str, str],
                  verbose: bool = True) -> int:
    """Time both maxpool implementations on the model's actual stem-output
    shape and pin the winner in the process-wide pool table (reduce_window's
    layout choice is chaotic in batch size on v5e — see int8_resident.py)."""
    from quantized_tpu.engine import int8_resident
    from quantized_tpu.utils.timing import per_iter_time

    if not getattr(model, "imagenet_pool", False):
        return 0
    n = example_input.shape[0]
    h = example_input.shape[1] // 2
    shape = (n, h, h, int(model.stem.w_q.get_value().shape[-1]))
    key = f"maxpool:{json.dumps(shape)}"
    if key not in table:
        x = jnp.zeros(shape, jnp.int8)
        times = {}
        for impl in ("rw", "interleave"):
            def step(c, x, _impl=impl):
                y = int8_resident.maxpool_3x3_s2_int8((x + c.astype(jnp.int8)).astype(jnp.int8), _impl)
                return jnp.max(y.astype(jnp.int32)).astype(jnp.float32) * 1e-9
            times[impl] = per_iter_time(step, x, target_secs=0.4)
        table[key] = min(times, key=times.get)
        if verbose:
            desc = " ".join(f"{b}={t*1e3:.3f}ms" for b, t in sorted(times.items()))
            print(f"autotune {key}: {desc} -> {table[key]}", flush=True)
        int8_resident._POOL_IMPL_TABLE[shape] = table[key]
        return 1
    int8_resident._POOL_IMPL_TABLE[shape] = table[key]
    return 0


def _tune_stem(model: nnx.Module, example_input: jax.Array, table: Dict[str, str],
               verbose: bool = True) -> int:
    """Pin the space-to-depth stem's backend (s8 conv vs bf16 conv) for the
    model's actual input shape. The plain-IntConv2d stem is already covered
    by the main conv loop; only Int8SpaceToDepthStem needs its own entry."""
    from quantized_tpu.engine.int8_resident import Int8SpaceToDepthStem
    from quantized_tpu.utils.timing import per_iter_time

    stem = getattr(model, "stem", None)
    if not isinstance(stem, Int8SpaceToDepthStem):
        return 0
    n, h, w = example_input.shape[0], example_input.shape[1], example_input.shape[2]
    key = f"stem:{json.dumps([n, h, w, stem.cin])}"
    if key not in table:
        x = jnp.zeros((n, h, w, stem.cin), jnp.int8)
        times = {}
        prev = stem.backend
        for b in ("xla", "bf16", "xla-split", "raw-bf16-split", "raw-xla-split"):
            stem.set_backend(b)
            graphdef, state = nnx.split(stem)

            def step(c, state, x):
                m = nnx.merge(graphdef, state)
                y = m.run_q((x + c.astype(jnp.int8)).astype(jnp.int8), relu=True,
                            out_requant=(0.05, 128))
                return jnp.max(y.astype(jnp.int32)).astype(jnp.float32) * 1e-9

            try:
                times[b] = per_iter_time(step, state, x, target_secs=0.4)
            except Exception as e:  # pragma: no cover - device-specific
                logger.warning("stem backend %s failed: %s", b, e)
        stem.backend = prev
        table[key] = min(times, key=times.get)
        if verbose:
            desc = " ".join(f"{b}={t*1e3:.3f}ms" for b, t in sorted(times.items()))
            print(f"autotune {key}: {desc} -> {table[key]}", flush=True)
        stem.set_backend(table[key])
        return 1
    stem.set_backend(table[key])
    return 0


def apply_cached_backends(model: nnx.Module, example_input: jax.Array,
                          cache_path: str = DEFAULT_CACHE) -> bool:
    """Apply a previously-saved tuning table without measuring. Returns True
    when every conv had a cached entry."""
    if not os.path.exists(cache_path):
        return False
    with open(cache_path) as f:
        cache = json.load(f)
    table = cache.get(jax.devices()[0].device_kind, {})
    if not table:
        return False
    _record_shapes(model, example_input)
    complete = True
    for _, m in nnx.iter_modules(model):
        if isinstance(m, IntConv2d) and hasattr(m, "last_input_shape"):
            key = _sig_key(conv_signature(m))
            if key in table:
                m.set_backend(table[key])
            else:
                complete = False
    # pool impls: load every cached maxpool entry into the process table
    from quantized_tpu.engine import int8_resident

    for key, impl in table.items():
        if key.startswith("maxpool:"):
            int8_resident._POOL_IMPL_TABLE[tuple(json.loads(key[len("maxpool:"):]))] = impl
    # stem backend
    stem = getattr(model, "stem", None)
    if isinstance(stem, int8_resident.Int8SpaceToDepthStem):
        n, h, w = example_input.shape[0], example_input.shape[1], example_input.shape[2]
        skey = f"stem:{json.dumps([n, h, w, stem.cin])}"
        if skey in table:
            stem.set_backend(table[skey])
        else:
            complete = False
    return complete
