"""Sweep XLA TPU compiler flags on the resident ResNet-50 engine.

Each flag set runs in a fresh subprocess (XLA_FLAGS is read once at backend
init). Prints img/s per config; use to decide whether bench.py should pin
flags. Usage: python bench/xla_flags_sweep.py [B]

Round-3 status: every TPU-specific flag is rejected by this sandbox's
client-side jaxlib ("Unknown flag in XLA_FLAGS" hard abort) — compilation
happens in the remote axon compile helper whose flags the client cannot set.
Flag tuning is therefore unavailable here; the sweep stays for real-TPU
deployments where the flags parse.
"""

from __future__ import annotations

import os
import subprocess
import sys

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128

CHILD = r"""
import sys
sys.path.insert(0, %(root)r)
import jax.numpy as jnp
from flax import nnx
from quantized_tpu.engine.executor import enable_compilation_cache
enable_compilation_cache()
from __graft_entry__ import _calibrated_model
from quantized_tpu.engine import build_int8_resident
from quantized_tpu.engine.autotune import apply_cached_backends
from quantized_tpu.utils.timing import per_iter_time

q = _calibrated_model("resnet_quantized_float_bn", dataset="imagenet", depth=50)
m = build_int8_resident(q)
x = jnp.ones((%(B)d, 224, 224, 3), jnp.float32)
apply_cached_backends(m, x)
graphdef, state = nnx.split(m)

def step(c, state, x):
    mm = nnx.merge(graphdef, state)
    y = mm(x + c * 1e-6)
    return jnp.max(y) * 1e-9

dt = per_iter_time(step, state, x)
print("IMGS", %(B)d / dt)
"""

CONFIGS = {
    "base": "",
    "vmem128m": "--xla_tpu_scoped_vmem_limit_kib=131072",
    "vmem64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "lhs": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "no_rewriter_mp": "--xla_tpu_enable_multi_level_nested_loop_fusion=false",
    "flash_vmem": "--xla_tpu_scoped_vmem_limit_kib=98304 --xla_tpu_enable_latency_hiding_scheduler=true",
}


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = CHILD % {"root": root, "B": B}
    for name, flags in CONFIGS.items():
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        try:
            out = subprocess.run(
                [sys.executable, "-c", code], env=env, capture_output=True,
                text=True, timeout=560,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("IMGS")]
            val = float(line[0].split()[1]) if line else float("nan")
            err = "" if line else out.stderr.strip().splitlines()[-1:]
        except subprocess.TimeoutExpired:
            val, err = float("nan"), ["timeout"]
        print(f"{name:>16}: {val:9.0f} img/s  {flags}  {err if err else ''}")


if __name__ == "__main__":
    main()
