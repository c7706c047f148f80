"""Serving cold-start: checkpoint artifact -> first prediction (VERDICT r4
next-step #6).

A real serving metric with zero prior coverage: how long from "process
starts with a checkpoint on disk" to (a) the first prediction and (b)
steady-state attainment (every bucket precompiled). The pieces measured:

  load      read the checkpoint artifact into the model (utils/checkpoint)
  build     build_int8_resident (weight requant + engine assembly)
  backends  apply_cached_backends (autotune-cache lookups, no racing)
  compile   first jit forward per bucket (dominated by XLA compile; the
            persistent compilation cache turns this into a disk load)
  first     time-to-first-prediction = load+build+backends+compile[first]

Run twice: COLD (fresh process, empty JAX in-memory cache, persistent cache
DISABLED) vs WARM (persistent compilation cache enabled and pre-populated by
a previous run). The delta is what `enable_compilation_cache` buys a
restarting server. Each arm runs in a SUBPROCESS so in-memory jit caches
can't leak between arms.

Usage: python bench/coldstart.py [--buckets 1,8,32,128]
       python bench/coldstart.py --child cold|warm <ckpt_dir> <buckets>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(mode: str, ckpt_dir: str, buckets: str) -> None:
    """One bring-up, stage-timed; prints a JSON line."""
    t_proc0 = time.perf_counter()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    if mode == "warm":
        from quantized_tpu.engine.executor import enable_compilation_cache

        enable_compilation_cache()

    from quantized_tpu.models import get_model
    from quantized_tpu.utils.checkpoint import load_checkpoint
    from quantized_tpu.utils.hostbuild import host_build, put_model

    bks = [int(b) for b in buckets.split(",")]
    stages = {}

    # the CLI's serving bring-up path (round 5): construct + restore +
    # convert entirely host-side, push the finished engine once
    t0 = time.perf_counter()
    with host_build():
        model = get_model("resnet_quantized_float_bn")(dataset="imagenet", depth=50,
                                                       rngs=nnx.Rngs(0))
        load_checkpoint(model, ckpt_dir)
        model.eval()
    stages["load_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    from quantized_tpu.engine import apply_cached_backends, build_int8_resident

    with host_build():
        eng = build_int8_resident(model)
    stages["build_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    put_model(eng)
    stages["push_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    apply_cached_backends(eng, jnp.zeros((bks[-1], 224, 224, 3), jnp.float32))
    stages["backends_s"] = time.perf_counter() - t0

    graphdef, state = nnx.split(eng)
    fwd = jax.jit(lambda s, x: nnx.merge(graphdef, s)(x))
    compile_s = []
    first_pred_s = None
    for i, b in enumerate(bks):
        x = jnp.zeros((b, 224, 224, 3), jnp.float32)
        t0 = time.perf_counter()
        np.asarray(fwd(state, x))  # value fetch = the only honest barrier here
        compile_s.append(time.perf_counter() - t0)
        if i == 0:
            first_pred_s = time.perf_counter() - t_proc0
    stages["compile_per_bucket_s"] = [round(c, 3) for c in compile_s]
    stages["time_to_first_prediction_s"] = first_pred_s
    stages["steady_state_s"] = time.perf_counter() - t_proc0
    stages["mode"] = mode
    print("COLDSTART " + json.dumps(stages))


def main() -> None:
    buckets = "1,8,32,128"
    if "--buckets" in sys.argv:
        buckets = sys.argv[sys.argv.index("--buckets") + 1]

    import jax  # parent only prepares the artifact; children do the timing
    from flax import nnx

    from quantized_tpu.models import get_model
    from quantized_tpu.utils.checkpoint import save_checkpoint, wait_for_checkpoints

    tmp = tempfile.mkdtemp(prefix="qtpu_coldstart_")
    model = get_model("resnet_quantized_float_bn")(dataset="imagenet", depth=50,
                                                   rngs=nnx.Rngs(0))
    save_checkpoint(model, tmp)
    wait_for_checkpoints()
    print(f"artifact at {tmp} (resnet50-imagenet, {buckets} buckets)", flush=True)

    env = dict(os.environ)
    # arm order matters: cold first (must not see a populated persistent
    # cache), then warm twice (first populates, second measures the hit)
    for arm in ("cold", "warm-populate", "warm"):
        mode = "warm" if arm.startswith("warm") else "cold"
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", mode, tmp, buckets],
            capture_output=True, text=True, env=env, timeout=3000, cwd=REPO,
        )
        line = next((l for l in out.stdout.splitlines() if l.startswith("COLDSTART ")), None)
        assert line, f"{arm} child failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
        r = json.loads(line[len("COLDSTART "):])
        if arm == "warm-populate":
            print(f"  (warm cache populated: steady {r['steady_state_s']:.1f}s)", flush=True)
            continue
        print(f"{arm:>5}: load {r['load_s']:.2f}s  build {r['build_s']:.2f}s  "
              f"push {r.get('push_s', 0):.2f}s  "
              f"backends {r['backends_s']:.2f}s  compiles {r['compile_per_bucket_s']}  "
              f"first-pred {r['time_to_first_prediction_s']:.2f}s  "
              f"steady {r['steady_state_s']:.2f}s", flush=True)


if __name__ == "__main__":
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        child(sys.argv[i + 1], sys.argv[i + 2], sys.argv[i + 3])
    else:
        main()
