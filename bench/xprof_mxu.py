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
    if "--analyze" in sys.argv:  # re-analyze a saved trace, no device work
        logdir = sys.argv[sys.argv.index("--analyze") + 1]
    else:
        eng = _build(MODEL)
        logdir = _capture(eng)
    prof = _tool_json(logdir, "op_profile")

    # Root node whose "flops" metric is the trace-wide average FLOP rate as a
    # fraction of the chip's *dtype-weighted* peak (bf16 FLOPs from the
    # autotuned bf16-split backends count against the bf16 peak). Older
    # xprof emits "byCategory"; the one in this sandbox emits "byProgram".
    root = (
        prof.get("byCategory")
        or prof.get("byProgramExcludeIdle")
        or prof.get("byProgram")
        or {}
    )
    total = root.get("metrics", {})
    mxu_frac = float(total.get("flops", 0.0))
    hbm_frac = float((total.get("bandwidthUtils") or [0.0])[0])
    raw_flops = int(total.get("rawFlops", 0))
    bf16_flops = int(total.get("bf16Flops", 0))
    raw_time_s = int(total.get("rawTime", 0)) * 1e-12
    hbm_bytes = int((total.get("rawBytesAccessedArray") or [0])[0])
    print(f"\naggregate XProf utilization: MXU {100*mxu_frac:.1f}% of "
          f"dtype-weighted peak, HBM {100*hbm_frac:.1f}% of datasheet")
    if raw_time_s:
        print(f"  ({raw_flops/raw_time_s/1e12:.0f} TOP/s effective, "
              f"{100*bf16_flops/max(raw_flops,1):.0f}% of FLOPs in bf16, "
              f"HBM {hbm_bytes/raw_time_s/1e9:.0f} GB/s avg)")

    # descend past the per-program level to the op-category tree; report
    # categories with their heaviest member ops (indented)
    prog = root.get("children", [{}])
    cat_root = prog[0] if prog else {}
    cats = sorted(
        cat_root.get("children", []),
        key=lambda n: -n.get("metrics", {}).get("rawTime", 0),
    )
    ttotal = sum(n.get("metrics", {}).get("rawTime", 0) for n in cats) or 1
    rows = []
    print(f"{'category / op':<52} {'MXU%':>6} {'time%':>6} {'hbm%':>6}")
    for cat in cats:
        for node, indent in [(cat, "")] + [
            (ch, "  ") for ch in sorted(
                cat.get("children", []),
                key=lambda n: -n.get("metrics", {}).get("rawTime", 0),
            )[:3]
        ]:
            m = node.get("metrics", {})
            fl = float(m.get("flops", 0.0))
            t = m.get("rawTime", 0) / ttotal
            bw = float((m.get("bandwidthUtils") or [0.0])[0])
            rows.append((indent + node.get("name", "?"), fl, t, bw))
            print(f"{(indent + node.get('name','?'))[:52]:<52} "
                  f"{100*fl:6.1f} {100*t:6.1f} {100*bw:6.1f}")

    # per-stage table: framework_op_stats rows carry the engine's named
    # scopes (int8_resident._forward_q) in their operation names — group
    # device self-time and measured HBM bandwidth per stage
    import re

    stats = _tool_json(logdir, "framework_op_stats")
    table = stats[0] if isinstance(stats, list) else stats
    cols = [c.get("label") for c in table["cols"]]
    stages: dict = {}
    blocks: dict = {}
    for r in table["rows"]:
        row = dict(zip(cols, (c.get("v") for c in r["c"])))
        if row.get("Host/device") != "Device":
            continue
        name = str(row.get("Operation Name", ""))
        m = re.search(r"(stem|layer\d+|head)(?:/(block\d+))?(?:/(c\d|ds))?", name)
        key = m.group(1) if m else ("(idle)" if name == "IDLE" else "(other)")
        bkey = "/".join(g for g in (m.groups() if m else ()) if g) or key
        t_us = float(row.get("Total self-time (us)") or 0.0)
        bw = float(row.get("Measured Memory BW (GBytes/Sec)") or 0.0)
        fr = float(row.get("Normalized FLOP Rate (FLOPs/s)") or 0.0)  # GFLOP/s
        for d, k in ((stages, key), (blocks, bkey)):
            agg = d.setdefault(k, [0.0, 0.0, 0.0])  # t_us, bytes, flops
            agg[0] += t_us
            agg[1] += bw * 1e9 * t_us * 1e-6  # bytes
            agg[2] += fr * 1e9 * t_us * 1e-6  # flops
    n_runs = 20

    def dump(d, title):
        print(f"\n{title:<16} {'ms/fwd':>8} {'GB/s':>6} {'%achv(657)':>10} {'TOP/s':>6}")
        out_rows = []
        for k in sorted(d, key=lambda k: -d[k][0]):
            t_us, bts, fls = d[k]
            gbs = bts / (t_us * 1e-6) / 1e9 if t_us else 0.0
            tops = fls / (t_us * 1e-6) / 1e12 if t_us else 0.0
            out_rows.append((k, round(t_us / n_runs / 1e3, 3), round(gbs),
                             round(100 * gbs / 657, 1), round(tops, 1)))
            print(f"{k:<16} {t_us/n_runs/1e3:8.3f} {gbs:6.0f} {100*gbs/657:10.1f} {tops:6.1f}")
        return out_rows

    stage_rows = dump(stages, "stage")
    block_rows = dump(blocks, "block")

    line = {
        "metric": "xprof_mxu_utilization",
        "value": round(100 * mxu_frac, 2),
        "unit": "% of dtype-weighted peak (XProf op_profile)",
        "vs_baseline": round(mxu_frac / 0.90, 3),  # north star: >=90%
        "hbm_util_pct": round(100 * hbm_frac, 2),
        "model": MODEL,
        "batch": B,
    }
    print(json.dumps(line))
    out = os.path.join(os.path.dirname(__file__), "xprof_mxu.json")
    with open(out, "w") as f:
        json.dump(
            {"line": line, "stages": stage_rows, "blocks": block_rows,
             "top_ops": rows[:30], "logdir": logdir},
            f, indent=1,
        )
    print(f"full table -> {out}")


if __name__ == "__main__":
    main()
