"""Fused bottleneck kernel vs the unfused XLA composition, per block.

Per-block HBM floor (int8-resident, identity block): unfused moves
~2x(in+out) + 2x interior = ~4x boundary bytes; fused moves in+out only.
Usage: python bench/fused_block_bench.py [batch]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from __graft_entry__ import _calibrated_model
from quantized_tpu.engine import build_int8_resident
from quantized_tpu.engine.fused import FusedInt8Bottleneck, fusable
from quantized_tpu.utils.timing import per_iter_time

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
HBM = 646e9  # measured s8 stream rate


def main():
    from quantized_tpu.utils.hostbuild import host_build, put_model

    # set observer buffers directly — an eager train-mode calibration forward
    # is minutes of op-by-op tunnel dispatches on this sandbox — and build
    # host-side (bulk D2H pulls wedge the tunnel)
    with host_build():
        model = _calibrated_model("resnet_quantized_float_bn", dataset="imagenet", depth=50)
        res = build_int8_resident(model)
    put_model(res)
    spatial = {1: 56, 2: 28, 3: 14, 4: 7}

    for li in (1, 2, 3, 4):
        blk = getattr(getattr(res, f"layer{li}"), "1")
        if not fusable(blk):
            continue
        cin = blk.conv1.w_q.get_value().shape[2]
        h = spatial[li]
        x_q = jnp.zeros((B, h, h, cin), jnp.int8)
        fused = FusedInt8Bottleneck(blk)

        def step_unfused(c, st, x):
            m = nnx.merge(gd_u, st)
            y = m((x + c.astype(jnp.int8)).astype(jnp.int8))
            return jnp.max(y.astype(jnp.int32)).astype(jnp.float32) * 1e-9

        def step_fused(c, st, x):
            m = nnx.merge(gd_f, st)
            y = m((x + c.astype(jnp.int8)).astype(jnp.int8))
            return jnp.max(y.astype(jnp.int32)).astype(jnp.float32) * 1e-9

        gd_u, st_u = nnx.split(blk)
        gd_f, st_f = nnx.split(fused)
        print(f"layer{li}: timing unfused...", flush=True)
        tu = per_iter_time(step_unfused, st_u, x_q, target_secs=0.5)
        print(f"layer{li}: unfused {tu*1e3:.3f} ms; timing fused...", flush=True)
        tf = per_iter_time(step_fused, st_f, x_q, target_secs=0.5)
        boundary = 2 * B * h * h * cin
        floor_f = boundary / HBM
        print(
            f"layer{li} B={B} {h}x{h}x{cin}: unfused {tu*1e3:7.3f} ms  "
            f"fused {tf*1e3:7.3f} ms  ({tu/tf:4.2f}x)  fused-floor {floor_f*1e3:6.3f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
