"""XProf-derived MXU utilization for the int8-resident engine.

BASELINE.md's roofline metric is "MXU util %"; round 1 reported only
analytical-FLOPs/wall-clock TOPS (VERDICT r1 missing #7). This harness runs
the tuned engine under a real ``jax.profiler`` trace, converts the captured
``.xplane.pb`` with xprof's ``op_profile``/``framework_op_stats`` tools, and
reports *measured* per-category MXU utilization plus the aggregate, emitting
one bench-contract JSON line. The reference has no counterpart (SURVEY.md
section 5: wall-clock AverageMeters only, main.py ~L220-285).

Usage: python bench/xprof_mxu.py [batch] [model]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from flax import nnx

V5E_INT8_PEAK_TOPS = 394.0
V5E_BF16_PEAK_TOPS = 197.0

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
MODEL = sys.argv[2] if len(sys.argv) > 2 else "resnet50"


def _build(model: str):
    from __graft_entry__ import _calibrated_model
    from quantized_tpu.engine import apply_cached_backends, build_int8_resident
    from quantized_tpu.utils.hostbuild import host_build, put_model

    if not model.startswith("resnet"):
        raise SystemExit(f"unknown model {model}")
    depth = int(model[6:])
    with host_build():  # bulk D2H pulls wedge the tunnel — build host-side
        q = _calibrated_model("resnet_quantized_float_bn", dataset="imagenet", depth=depth)
        eng = build_int8_resident(q)
        apply_cached_backends(eng, jnp.zeros((B, 224, 224, 3), jnp.float32))
    return put_model(eng)


def _capture(eng) -> str:
    """Run the forward under a trace; return the logdir."""
    graphdef, state = nnx.split(eng)

    @jax.jit
    def fwd(state, x):
        return nnx.merge(graphdef, state)(x)

    x = jnp.zeros((B, 224, 224, 3), jnp.float32)
    fwd(state, x).block_until_ready()  # compile outside the trace

    logdir = tempfile.mkdtemp(prefix="xprof_mxu_")
    jax.profiler.start_trace(logdir)
    for _ in range(20):
        y = fwd(state, x)
    y.block_until_ready()
    jax.profiler.stop_trace()
    return logdir


def _tool_json(logdir: str, tool: str):
    from xprof.convert import raw_to_tool_data

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    data = raw_to_tool_data.xspace_to_tool_data(paths, tool, {})
    if isinstance(data, tuple):
        data = data[0]
    if isinstance(data, bytes):
        data = data.decode()
    return json.loads(data)


def _walk_op_profile(node, depth=0, rows=None):
    """Flatten the op_profile tree into (name, flops_fraction, time_fraction)."""
    if rows is None:
        rows = []
    m = node.get("metrics", {})
    name = node.get("name", "?")
    if m and depth >= 1:
        rows.append(
            (
                name,
                float(m.get("flops", 0.0)),
                float(m.get("time", 0.0)),
                float(m.get("bandwidthUtils", [0.0])[0])
                if m.get("bandwidthUtils")
                else 0.0,
            )
        )
    for ch in node.get("children", []):
        _walk_op_profile(ch, depth + 1, rows)
    return rows


def main():
    eng = _build(MODEL)
    logdir = _capture(eng)
    prof = _tool_json(logdir, "op_profile")

    # byCategory: root node whose "flops" metric is the trace-wide average
    # FLOP rate as a fraction of the chip's *dtype-weighted* peak.
    by_cat = prof.get("byCategory", {})
    total = by_cat.get("metrics", {})
    mxu_frac = float(total.get("flops", 0.0))
    print(f"\naggregate XProf FLOPS utilization: {100*mxu_frac:.1f}% of peak")

    rows = _walk_op_profile(by_cat)
    rows.sort(key=lambda r: -r[2])
    print(f"{'category/op':<52} {'MXU%':>6} {'time%':>6} {'hbm%':>6}")
    for name, fl, t, bw in rows[:18]:
        print(f"{name[:52]:<52} {100*fl:6.1f} {100*t:6.1f} {100*bw:6.1f}")

    line = {
        "metric": "xprof_mxu_utilization",
        "value": round(100 * mxu_frac, 2),
        "unit": "% of peak (XProf op_profile)",
        "vs_baseline": round(mxu_frac / 0.90, 3),  # north star: >=90%
        "model": MODEL,
        "batch": B,
    }
    print(json.dumps(line))
    out = os.path.join(os.path.dirname(__file__), "xprof_mxu.json")
    with open(out, "w") as f:
        json.dump({"line": line, "top_ops": rows[:30], "logdir": logdir}, f, indent=1)
    print(f"full table -> {out}")


if __name__ == "__main__":
    main()
