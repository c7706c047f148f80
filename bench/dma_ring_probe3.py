"""DMA ring probe, round 3: calibrated A/B of every io path in ONE program.

Fixes a harness artifact the earlier probes (and round-2's fused-block study)
carried: the ``x + carry`` perturbation added a full elementwise pass over the
103 MB operand to every measurement, and reducing ``max(y)`` WITHOUT feeding y
back let XLA fuse read->add->reduce into a single no-materialization pass
(which is how "XLA fusion 1457 GB/s duplex" exceeded the v5e's ~819 GB/s HBM
datasheet — it never wrote y). Here every variant is timed as a CHAIN:
``x_{i+1} = f(x_i)`` inside one scan, so f's output must materialize and no
extra perturbation pass exists.

Variants (layer1 geometry, B,56,56,256 int8, 103 MB each way):
  xla-add          y = x + 1 via XLA (the true fusion duplex rate)
  grid-copy        Pallas auto grid pipeline copy (round-2 reference)
  ring-dyn[-add]   hand DMA ring, fori_loop + dynamic slots
  ring-unroll[-add] same ring fully unrolled (static slot indices)
  raw-1dma         single whole-array HBM->HBM DMA

Usage: python bench/dma_ring_probe3.py [batch]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantized_tpu.ops.int8_matmul import resolve_interpret
from quantized_tpu.utils.timing import TUNNEL_OVERHEAD_S

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
H = W = 56
C = 256
CP = dict(
    compiler_params=pltpu.CompilerParams(
        has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024
    ),
)


def chain_time(fn, x, target_secs: float = 0.5, reps: int = 3) -> float:
    """Seconds per application of ``fn`` in the chain x->fn(x)->fn(fn(x))..."""

    def make(loops):
        @jax.jit
        def run(x0):
            y, _ = jax.lax.scan(lambda c, _: (fn(c), None), x0, None, length=loops)
            return jnp.max(y.astype(jnp.int32))

        return run

    probe = 32
    run = make(probe)
    int(run(x))  # compile + warm (value fetch = the only real barrier here)
    t0 = time.perf_counter()
    int(run(x))
    t_probe = time.perf_counter() - t0
    est = max((t_probe - TUNNEL_OVERHEAD_S) / probe, 1e-7)
    loops = min(max(probe, int(target_secs / est)), 20000)
    if loops > probe * 1.5:
        run = make(loops)
        int(run(x))
    else:
        loops = probe
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        int(run(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return max(ts[len(ts) // 2] - TUNNEL_OVERHEAD_S, 1e-9 * loops) / loops


def xla_add(x):
    return (x.astype(jnp.int32) + 1).astype(jnp.int8)


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


def _add_compute(buf, slot):
    v = buf[slot].astype(jnp.int32) + 1
    buf[slot] = v.astype(jnp.int8)


def ring(S=4, D=2, bi=1, compute=None, unroll=False):
    nsteps = B // bi

    def kernel(x_hbm, out_hbm, buf, in_sem, out_sem):
        def in_dma(j, slot):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(j * bi, bi)], buf.at[slot], in_sem.at[slot]
            )

        def out_dma(j, slot):
            return pltpu.make_async_copy(
                buf.at[slot], out_hbm.at[pl.ds(j * bi, bi)], out_sem.at[slot]
            )

        def step(i, slot_of):
            in_dma(i, slot_of(i)).wait()
            if compute is not None:
                compute(buf, slot_of(i))
            out_dma(i, slot_of(i)).start()
            j = i + D
            if unroll:
                if j < nsteps:
                    if j >= S:
                        out_dma(j - S, slot_of(j)).wait()
                    in_dma(j, slot_of(j)).start()
            else:
                @pl.when(j < nsteps)
                def _():
                    @pl.when(j >= S)
                    def _():
                        out_dma(j - S, slot_of(j)).wait()

                    in_dma(j, slot_of(j)).start()

        if unroll:
            for j in range(min(D, nsteps)):
                in_dma(j, j % S).start()
            for i in range(nsteps):
                step(i, lambda j: j % S)
            for j in range(max(0, nsteps - S), nsteps):
                out_dma(j, j % S).wait()
        else:
            for j in range(min(D, nsteps)):
                in_dma(j, j % S).start()

            def body(i, c):
                step(i, lambda j: jax.lax.rem(j, S))
                return c

            jax.lax.fori_loop(0, nsteps, body, 0)

            def epi(j, c):
                out_dma(j, jax.lax.rem(j, S)).wait()
                return c

            jax.lax.fori_loop(max(0, nsteps - S), nsteps, epi, 0)

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((S, bi, H, W, C), jnp.int8),
            pltpu.SemaphoreType.DMA((S,)),
            pltpu.SemaphoreType.DMA((S,)),
        ],
        interpret=resolve_interpret(None),
        **CP,
    )


def raw_1dma():
    def kernel(x_hbm, out_hbm, sem):
        dma = pltpu.make_async_copy(x_hbm, out_hbm, sem)
        dma.start()
        dma.wait()

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.int8),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        interpret=resolve_interpret(None),
        **CP,
    )


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, (B, H, W, C)), jnp.int8)
    gb = x.nbytes / 1e9

    variants = {
        "xla-add": (xla_add, 1),
        "grid-copy": (grid_copy(), 0),
        "raw-1dma": (raw_1dma(), 0),
        "ring-dyn": (ring(4, 2, 1), 0),
        "ring-dyn-S8D4": (ring(8, 4, 1), 0),
        "ring-unroll": (ring(4, 2, 1, unroll=True), 0),
        "ring-unroll-bi4": (ring(4, 2, 4, unroll=True), 0),
        "ring-dyn-add": (ring(4, 2, 1, compute=_add_compute), 1),
        "ring-unroll-add": (ring(4, 2, 1, compute=_add_compute, unroll=True), 1),
    }

    ref = np.asarray(x)
    for name, (fn, delta) in variants.items():
        y = np.asarray(jax.jit(fn)(x))
        assert (y == (ref + delta).astype(np.int8)).all(), f"{name} wrong"

    for name, (fn, _) in variants.items():
        dt = chain_time(fn, x)
        print(f"{name:>18}: {dt*1e3:7.3f} ms  ({2*gb/dt:6.0f} GB/s duplex)", flush=True)


if __name__ == "__main__":
    main()
