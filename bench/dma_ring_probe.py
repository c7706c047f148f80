"""Concurrent-DMA ring probe (round-3 headline experiment).

Round-2 finding (RESULTS.md fused-block study): the Pallas auto grid pipeline
serializes its in- and out-DMAs (~265 GB/s effective on the layer1 copy), while
the raw DMA engine sustains 699 GB/s per stream and two concurrent streams run
at full rate each (XLA fusions: 1457 GB/s duplex).  This probe hand-rolls the
ring the round-2 study costed: grid=() kernel, S VMEM slots, explicit
``pltpu.make_async_copy`` in/out streams on separate semaphore arrays, in-DMA
of step i+D overlapping the out-DMA of step i.

Variants on the layer1-geometry copy (B,56,56,256 int8, 103 MB in + 103 MB out):
  ring-copy-S{S}-D{D}-bi{bi}   pure copy through the ring
  ring-add                     copy + elementwise add (checks compute overlap)
  grid-copy                    the auto-pipeline reference (round-2: 0.775 ms)

Floor if in/out streams truly run concurrently at 699 GB/s: ~0.147 ms.

OUTCOME (see dma_ring_probe3.py for the controlled version): the premise was
a harness artifact — with honest chained timing at HBM-resident sizes, every
DMA path (ring, grid pipeline, raw single DMA) caps at ~327 GB/s combined
while XLA's own loads/stores run ~657 GB/s duplex. Kept for the probe record.

Usage: python bench/dma_ring_probe.py [batch]
"""

from __future__ import annotations

import functools
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


def make_ring(compute, S=4, D=2, bi=1, n=B):
    """Ring copy kernel: n//bi steps, S VMEM slots, prefetch depth D."""
    nsteps = n // bi

    def kernel(x_hbm, out_hbm, buf, in_sem, out_sem):
        def start_in(j):
            slot = jax.lax.rem(j, S)
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(j * bi, bi)], buf.at[slot], in_sem.at[slot]
            ).start()

        def wait_in(j):
            slot = jax.lax.rem(j, S)
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(j * bi, bi)], buf.at[slot], in_sem.at[slot]
            ).wait()

        def start_out(j):
            slot = jax.lax.rem(j, S)
            pltpu.make_async_copy(
                buf.at[slot], out_hbm.at[pl.ds(j * bi, bi)], out_sem.at[slot]
            ).start()

        def wait_out(j):
            slot = jax.lax.rem(j, S)
            pltpu.make_async_copy(
                buf.at[slot], out_hbm.at[pl.ds(j * bi, bi)], out_sem.at[slot]
            ).wait()

        for j in range(min(D, nsteps)):
            start_in(j)

        def body(i, carry):
            wait_in(i)
            compute(buf, jax.lax.rem(i, S))
            start_out(i)
            j = i + D

            @pl.when(j < nsteps)
            def _():
                @pl.when(j >= S)
                def _():
                    wait_out(j - S)

                start_in(j)

            return carry

        jax.lax.fori_loop(0, nsteps, body, 0)

        def epi(j, carry):
            wait_out(j)
            return carry

        jax.lax.fori_loop(max(0, nsteps - S), nsteps, epi, 0)

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n, H, W, C), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((S, bi, H, W, C), jnp.int8),
            pltpu.SemaphoreType.DMA((S,)),
            pltpu.SemaphoreType.DMA((S,)),
        ],
        interpret=resolve_interpret(None),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def nocompute(buf, slot):
    pass


def addone(buf, slot):
    # Mosaic has no i8 vector add: widen, add, narrow (wraps like int8 +).
    v = buf[slot].astype(jnp.int32) + 1
    buf[slot] = ((v + 128) % 256 - 128).astype(jnp.int8)


def grid_copy():
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    return pl.pallas_call(
        k,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.int8),
        interpret=resolve_interpret(None),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), vmem_limit_bytes=100 * 1024 * 1024
        ),
    )


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, (B, H, W, C)), jnp.int8)
    gb = x.nbytes / 1e9

    variants = {"grid-copy": grid_copy()}
    for S, D, bi in [(4, 2, 1), (8, 4, 1), (8, 6, 1), (4, 2, 2), (8, 4, 2), (4, 2, 4)]:
        variants[f"ring-copy-S{S}-D{D}-bi{bi}"] = make_ring(nocompute, S, D, bi)
    variants["ring-add-S8-D4"] = make_ring(addone, 8, 4, 1)

    # correctness check first (cheap)
    ref = np.asarray(x)
    for name, fn in variants.items():
        y = np.asarray(fn(x))
        expect = ref + 1 if name.startswith("ring-add") else ref
        assert (y == expect.astype(np.int8)).all(), f"{name} wrong"

    for name, fn in variants.items():
        def step(ca, x, _fn=fn):
            y = _fn((x + ca.astype(jnp.int8)).astype(jnp.int8))
            return jnp.max(y.astype(jnp.int32)).astype(jnp.float32) * 1e-9

        dt = per_iter_time(step, x, target_secs=0.5)
        print(f"{name:>22}: {dt*1e3:7.3f} ms  ({2*gb/dt:6.0f} GB/s duplex)", flush=True)


if __name__ == "__main__":
    main()
