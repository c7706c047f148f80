"""DMA ring probe, round 2: why is the ring stuck at 467 GB/s duplex?

Hypotheses tested against dma_ring_probe.py's flat 0.44 ms (any S/D/bi):
  raw-1dma        one whole-array HBM->HBM DMA (engine peak, round-2: 699 GB/s)
  raw-2dma        two half-array HBM->HBM DMAs in flight (concurrency scaling)
  ring-unroll     fully static python-unrolled ring (kills dynamic-slot
                  aliasing conservatism in Mosaic)
  ring-unroll-sep separate in/out VMEM buffers + VMEM->VMEM copy as "compute"
  ring-prio       in-DMAs priority 0, out-DMAs priority 1 (distinct queues?)
  ring-unroll-add static ring + widen/add compute (overlap check)

Usage: python bench/dma_ring_probe2.py [batch]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantized_tpu.ops.int8_matmul import resolve_interpret
from quantized_tpu.utils.timing import per_iter_time

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
H = W = 56
C = 256


def raw_dma(n_streams=1):
    def kernel(x_hbm, out_hbm, sems):
        per = B // n_streams
        for s in range(n_streams):
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(s * per, per)], out_hbm.at[pl.ds(s * per, per)], sems.at[s]
            ).start()
        for s in range(n_streams):
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(s * per, per)], out_hbm.at[pl.ds(s * per, per)], sems.at[s]
            ).wait()

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.int8),
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_streams,))],
        interpret=resolve_interpret(None),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024
        ),
    )


def ring_unroll(S=4, D=2, bi=4, compute=None, sep_buffers=False, prio=None):
    nsteps = B // bi

    def kernel(x_hbm, out_hbm, ibuf, obuf, in_sem, out_sem):
        def in_dma(j):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(j * bi, bi)], ibuf.at[j % S], in_sem.at[j % S]
            )

        def out_dma(j):
            src = obuf if sep_buffers else ibuf
            return pltpu.make_async_copy(
                src.at[j % S], out_hbm.at[pl.ds(j * bi, bi)], out_sem.at[j % S]
            )

        for j in range(min(D, nsteps)):
            in_dma(j).start(**({"priority": prio[0]} if prio else {}))
        for i in range(nsteps):
            in_dma(i).wait()
            if compute is not None:
                compute(ibuf, obuf if sep_buffers else ibuf, i % S)
            out_dma(i).start(**({"priority": prio[1]} if prio else {}))
            j = i + D
            if j < nsteps:
                if j >= S:
                    out_dma(j - S).wait()
                in_dma(j).start(**({"priority": prio[0]} if prio else {}))
        for j in range(max(0, nsteps - S), nsteps):
            out_dma(j).wait()

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((S, bi, H, W, C), jnp.int8),
            pltpu.VMEM((S if sep_buffers else 1, bi, H, W, C), jnp.int8),
            pltpu.SemaphoreType.DMA((S,)),
            pltpu.SemaphoreType.DMA((S,)),
        ],
        interpret=resolve_interpret(None),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024
        ),
    )


def copy_compute(src, dst, slot):
    dst[slot] = src[slot]


def add_compute(src, dst, slot):
    v = src[slot].astype(jnp.int32) + 1
    dst[slot] = ((v + 128) % 256 - 128).astype(jnp.int8)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, (B, H, W, C)), jnp.int8)
    gb = x.nbytes / 1e9

    variants = {
        "raw-1dma": (raw_dma(1), 0),
        "raw-2dma": (raw_dma(2), 0),
        "raw-4dma": (raw_dma(4), 0),
        "ring-unroll-S4-D2-bi4": (ring_unroll(4, 2, 4), 0),
        "ring-unroll-S8-D4-bi2": (ring_unroll(8, 4, 2), 0),
        "ring-unroll-S8-D4-bi4": (ring_unroll(8, 4, 4), 0),
        "ring-unroll-sep-bi4": (ring_unroll(4, 2, 4, copy_compute, sep_buffers=True), 0),
        "ring-prio-bi4": (ring_unroll(4, 2, 4, prio=(0, 1)), 0),
        "ring-unroll-add-bi4": (ring_unroll(4, 2, 4, add_compute, sep_buffers=True), 1),
    }

    ref = np.asarray(x)
    for name, (fn, delta) in variants.items():
        y = np.asarray(fn(x))
        assert (y == (ref + delta).astype(np.int8)).all(), f"{name} wrong"

    for name, (fn, _) in variants.items():
        def step(ca, x, _fn=fn):
            y = _fn((x + ca.astype(jnp.int8)).astype(jnp.int8))
            return jnp.max(y.astype(jnp.int32)).astype(jnp.float32) * 1e-9

        dt = per_iter_time(step, x, target_secs=0.5)
        print(f"{name:>24}: {dt*1e3:7.3f} ms  ({2*gb/dt:6.0f} GB/s duplex)", flush=True)


if __name__ == "__main__":
    main()
