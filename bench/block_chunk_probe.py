"""Batch-chunked residual blocks: give XLA VMEM-promotable intermediates.

Round-3 DMA study (bench/dma_ring_probe3.py, RESULTS.md): Pallas DMA io caps
at ~327 GB/s combined on this runtime while XLA's own fusion loads/stores run
~657 GB/s duplex — so whole-block Pallas fusion can never beat the unfused
XLA composition, and the only claimable io lever is reducing *HBM traffic*
inside the XLA program itself. This probe tests the one mechanism available:
run the block over batch sub-chunks (``lax.map``) so the interior activations
(h1/h2) and possibly the input tile are small enough for XLA's memory-space
assignment to keep in VMEM, turning interior reads/writes into VMEM traffic.

Timed with the honest chain harness (output feeds next input; no side passes):
  block-full        identity bottleneck at full batch (production today)
  block-chunk{n}    same block, lax.map over n-image chunks
  2block-full/chunk two chained identity blocks (cross-block residency)

Usage: python bench/block_chunk_probe.py [batch] [layer]
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
from quantized_tpu.utils.timing import chain_time

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
LAYERS = [int(v) for v in sys.argv[2].split(",")] if len(sys.argv) > 2 else [1, 2]


def main():
    from quantized_tpu.utils.hostbuild import host_build, put_model

    with host_build():
        model = _calibrated_model("resnet_quantized_float_bn", dataset="imagenet", depth=50)
        res = build_int8_resident(model)
    put_model(res)
    spatial = {1: 56, 2: 28, 3: 14, 4: 7}

    for li in LAYERS:
        stage = getattr(res, f"layer{li}")
        blk = getattr(stage, "1")  # identity bottleneck
        blk2 = getattr(stage, "2")
        cin = blk.conv1.w_q.get_value().shape[2]
        h = spatial[li]
        x_q = jnp.asarray(
            np.random.default_rng(0).integers(-128, 128, (B, h, h, cin)), jnp.int8
        )
        gd, st = nnx.split(blk)
        gd2, st2 = nnx.split(blk2)

        def run_full(x, st):
            return nnx.merge(gd, st)(x)

        def make_chunked(chunk):
            def run(x, st):
                m = nnx.merge(gd, st)
                xs = x.reshape(x.shape[0] // chunk, chunk, *x.shape[1:])
                return jax.lax.map(m, xs).reshape(x.shape)

            return run

        def run_2full(x, st, st2):
            return nnx.merge(gd2, st2)(nnx.merge(gd, st)(x))

        def make_2chunked(chunk):
            def run(x, st, st2):
                m, m2 = nnx.merge(gd, st), nnx.merge(gd2, st2)
                xs = x.reshape(x.shape[0] // chunk, chunk, *x.shape[1:])
                return jax.lax.map(lambda c: m2(m(c)), xs).reshape(x.shape)

            return run

        t_full = chain_time(run_full, x_q, st)
        print(f"layer{li} {h}x{h}x{cin} B={B}  block-full : {t_full*1e3:7.3f} ms", flush=True)
        for chunk in (16, 32, 64):
            if chunk >= B:
                continue
            t = chain_time(make_chunked(chunk), x_q, st)
            print(f"layer{li} {h}x{h}x{cin} B={B}  chunk{chunk:<4}: {t*1e3:7.3f} ms"
                  f"  ({t_full/t:4.2f}x)", flush=True)
        t2 = chain_time(run_2full, x_q, st, st2)
        print(f"layer{li} 2 blocks            full  : {t2*1e3:7.3f} ms", flush=True)
        for chunk in (16, 32):
            t = chain_time(make_2chunked(chunk), x_q, st, st2)
            print(f"layer{li} 2 blocks            chunk{chunk:<3}: {t*1e3:7.3f} ms"
                  f"  ({t2/t:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
