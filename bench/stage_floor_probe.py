"""Per-fusion floor decomposition of layer3/layer4/stem (VERDICT r3 item #1).

Round 3 proved the layer1/layer2 identity blocks sit at ~90% of their
XLA-structural floor with the honest chained harness, but extrapolated the
"every stage" claim to layer3/layer4/stem, whose *stage-level*
max(io, compute) floors (one io bound for the whole stage, assuming perfect
cross-op overlap) put them at 53-70%. XLA executes fusions sequentially, so
the legitimate structural floor is the SUM over fusions of
max(io_bytes/657GB/s, flops/dtype_ceiling) — this probe computes that sum
per block from the tuned engine's real shapes/backends/dtypes and compares
it against honest chained measurements (timing.chain_time: output feeds the
next input, nothing fused away, no side passes).

Fixups: stride-2 (downsample) blocks halve the element count, so their chain
carries the output back through one concat+reshape pass (y -> [y,y] ->
x-shape); its io floor is printed as an explicit row and included in the
chain-floor sum. The stem group folds 64->16 channels (max over groups of 4,
reads all of y) then tiles x3 to reconstruct the 224x224x3 int8 input.

Ceilings: int8 355 TOPS (bench/roofline.py measured), bf16 measured here
once on an 8192^3 dot. io floor rate 657 GB/s duplex (round-3 DMA study).

Usage: python bench/stage_floor_probe.py [batch] [stages]
         stages: comma list from {layer1,layer2,layer3,layer4,stem}
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from __graft_entry__ import _calibrated_model
from quantized_tpu.engine import apply_cached_backends, build_int8_resident
from quantized_tpu.utils.timing import chain_time, per_iter_time

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
STAGES = sys.argv[2].split(",") if len(sys.argv) > 2 else ["layer3", "layer4", "stem"]

IO_GBPS = 657e9  # measured XLA elementwise duplex rate (RESULTS.md r3)
INT8_TOPS = 355e12  # measured s8 dot ceiling (bench/roofline.py)

SPATIAL_IN = {"layer1": 56, "layer2": 56, "layer3": 28, "layer4": 14}


def measured_bf16_tops(n: int = 8192) -> float:
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)

    def step(c, a, b):
        acc = jax.lax.dot_general(
            (a + c.astype(jnp.bfloat16)).astype(jnp.bfloat16), b,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        return jnp.max(acc).astype(jnp.float32) * 1e-9

    dt = per_iter_time(step, a, b)
    return 2.0 * n * n * n / dt


def conv_floor(name, cin_hw, conv, extra_read=0, out_bytes_override=None,
               bf16_tops=177e12):
    """(t_io, t_comp, detail) for one conv fusion.

    cin_hw: input spatial (H == W). extra_read: residual-leg bytes read by
    this fusion's epilogue. out_bytes_override: emitted dtype != s8 (e.g. the
    s16 downsample leg, or the final block's f32 out)."""
    kh, kw, cin_w, cout = (int(v) for v in conv.w_q.get_value().shape)
    groups = getattr(conv, "groups", 1)
    sh, _ = conv.stride
    ph, _ = conv.padding
    hout = (cin_hw + 2 * ph - kh) // sh + 1
    cin = cin_w * groups
    in_bytes = B * cin_hw * cin_hw * cin  # stored int8
    w_bytes = kh * kw * cin_w * cout
    out_elems = B * hout * hout * cout
    out_bytes = out_bytes_override if out_bytes_override is not None else out_elems
    flops = 2.0 * out_elems * kh * kw * cin_w
    t_io = (in_bytes + w_bytes + out_bytes + extra_read) / IO_GBPS
    ceiling = bf16_tops if conv.backend.startswith("bf16") else INT8_TOPS
    t_comp = flops / ceiling
    return t_io, t_comp, (
        f"{name:<4} {kh}x{kw} {cin:>4}->{cout:<4} s{sh} [{conv.backend:>10}] "
        f"io {(in_bytes + w_bytes + out_bytes + extra_read) / 1e6:7.1f} MB"
    ), hout


def bottleneck_floor(blk, h_in, bf16_tops, is_last=False):
    """Per-fusion floor rows for one Int8Bottleneck in the resident engine's
    structure: c1, c2, c3+tail (reads the residual leg), ds (emits s16)."""
    rows = []
    t1_io, t1_c, d1, h1 = conv_floor("c1", h_in, blk.conv1, bf16_tops=bf16_tops)
    rows.append(("c1", t1_io, t1_c, d1))
    t2_io, t2_c, d2, h2 = conv_floor("c2", h1, blk.conv2, bf16_tops=bf16_tops)
    rows.append(("c2", t2_io, t2_c, d2))
    cout3 = int(blk.conv3.w_q.get_value().shape[-1])
    out_elems = B * h2 * h2 * cout3
    if blk.downsample is not None:
        # ds fusion emits fine-grained s16 (2 B/elem)
        td_io, td_c, dd, _ = conv_floor(
            "ds", h_in, blk.downsample, out_bytes_override=out_elems * 2,
            bf16_tops=bf16_tops)
        rows.append(("ds", td_io, td_c, dd))
        leg_read = out_elems * 2  # c3 tail reads the s16 leg
    else:
        leg_read = B * h_in * h_in * int(blk.conv1.w_q.get_value().shape[2])  # x s8
    out_bytes = out_elems * (4 if is_last else 1)  # final block emits f32
    t3_io, t3_c, d3, _ = conv_floor(
        "c3", h2, blk.conv3, extra_read=leg_read, out_bytes_override=out_bytes,
        bf16_tops=bf16_tops)
    rows.append(("c3+tail", t3_io, t3_c, d3))
    return rows, h2


def print_rows(rows, measured_ms=None, fixup_io=0.0):
    floor = 0.0
    for name, t_io, t_c, detail in rows:
        f = max(t_io, t_c)
        floor += f
        bound = "io" if t_io >= t_c else "compute"
        print(f"    {detail}  io {t_io*1e3:6.3f} / comp {t_c*1e3:6.3f} ms "
              f"-> floor {f*1e3:6.3f} ({bound})", flush=True)
    line = f"    floor-sum {floor*1e3:7.3f} ms"
    if fixup_io:
        line += f" (+ fixup {fixup_io*1e3:.3f})"
        floor += fixup_io
    if measured_ms is not None:
        line += f"   measured {measured_ms:7.3f} ms   floor/meas = {floor*1e3/measured_ms:5.1%}"
    print(line, flush=True)
    return floor


def main():
    from quantized_tpu.utils.hostbuild import host_build, put_model

    with host_build():
        model = _calibrated_model("resnet_quantized_float_bn",
                                  dataset="imagenet", depth=50)
        res = build_int8_resident(model)
        tuned = apply_cached_backends(res, jnp.zeros((B, 224, 224, 3), jnp.float32))
    put_model(res)
    print(f"B={B} tuned={tuned}", flush=True)
    bf16_tops = measured_bf16_tops()
    print(f"measured bf16 ceiling: {bf16_tops/1e12:.0f} TOPS", flush=True)
    rng = np.random.default_rng(0)

    for sname in STAGES:
        if sname == "stem":
            probe_stem(res, rng, bf16_tops)
            continue
        stage = getattr(res, sname)
        h_in = SPATIAL_IN[sname]
        blocks = [getattr(stage, str(i)) for i in range(stage.num_blocks)]
        is_last_stage = sname == "layer4"

        # --- identity block (index 1): shape-preserving, direct chain ---
        blk = blocks[1]
        cin = int(blk.conv1.w_q.get_value().shape[2])
        # identity blocks live at the POST-ds spatial size
        h_id = {"layer1": 56, "layer2": 28, "layer3": 14, "layer4": 7}[sname]
        x_q = jnp.asarray(rng.integers(-128, 128, (B, h_id, h_id, cin)), jnp.int8)
        gd, st = nnx.split(blk)
        t_meas = chain_time(lambda x, s: nnx.merge(gd, s)(x), x_q, st)
        print(f"\n{sname} identity block ({h_id}x{h_id}x{cin}):", flush=True)
        rows, _ = bottleneck_floor(blk, h_id, bf16_tops)
        print_rows(rows, measured_ms=t_meas * 1e3)

        # --- ds block (index 0): stride 2, chain via tile/fold fixup ---
        blk0 = blocks[0]
        cin0 = int(blk0.conv1.w_q.get_value().shape[2])
        x0 = jnp.asarray(rng.integers(-128, 128, (B, h_in, h_in, cin0)), jnp.int8)
        gd0, st0 = nnx.split(blk0)

        def run_ds(x, s):
            return _fixup_to(x.shape, nnx.merge(gd0, s)(x))

        t0_meas = chain_time(run_ds, x0, st0)
        y_elems = B * h_id * h_id * int(blk0.conv3.w_q.get_value().shape[-1])
        fixup_io = (y_elems + x0.size) / IO_GBPS  # read all y, write x-shape
        print(f"{sname} downsample block ({h_in}x{h_in}x{cin0} -> /2):", flush=True)
        rows0, _ = bottleneck_floor(blk0, h_in, bf16_tops)
        print_rows(rows0, measured_ms=t0_meas * 1e3, fixup_io=fixup_io)

        # --- whole stage chained (1 fixup per stage application) ---
        # NOTE: the identity graphdef is reused for the final block, so in
        # layer4 the stage chain emits int8 where production emits f32 for
        # the avgpool (floor delta +38.6 MB = +0.059 ms on the last tail);
        # the floor sum below matches the all-int8 form actually measured.
        def run_stage(x, s0, *sts):
            y = nnx.merge(gd0, s0)(x)
            for g_s in sts:
                y = nnx.merge(gd, g_s)(y)  # identity blocks share graphdef
            return _fixup_to(x.shape, y)

        id_states = [nnx.split(b)[1] for b in blocks[1:]]
        t_stage = chain_time(run_stage, x0, st0, *id_states)
        n_id = len(id_states)
        floor_stage = (sum(max(a, b) for _, a, b, _ in rows0)
                       + n_id * sum(max(a, b) for _, a, b, _ in rows)
                       + fixup_io)
        print(f"{sname} whole stage (ds + {n_id} identity + fixup): measured "
              f"{t_stage*1e3:7.3f} ms, floor {floor_stage*1e3:7.3f} ms "
              f"-> {floor_stage/t_stage:5.1%} of floor", flush=True)


def _fixup_to(x_shape, y):
    """Reconstruct an x-shaped int8 carry from y, reading ALL of y (no DCE):
    tile channels when y is smaller, max-fold channel groups when larger."""
    xs = int(np.prod(x_shape))
    ys = y.size
    if ys == xs:
        return y.reshape(x_shape)
    if xs % ys == 0:
        rep = xs // ys
        return jnp.concatenate([y] * rep, axis=-1).reshape(x_shape)
    assert ys % xs == 0, (x_shape, y.shape)
    fold = ys // xs
    f = jnp.max(y.reshape(*y.shape[:-1], y.shape[-1] // fold, fold), axis=-1)
    return f.reshape(x_shape)


def probe_stem(res, rng, bf16_tops):
    """Stem group in the int8 domain: conv (+s2d or raw) -> maxpool.
    Chain fixup: fold 64 -> 16 channels (max over 4, reads all of y), tile x3,
    reshape to (224,224,3). The f32/u8 quantize pass is separate (its io is
    ingest-format-dependent: 96 MB f32-read form, 38 MB u8 form)."""
    from quantized_tpu.engine.int8_resident import maxpool_3x3_s2_int8

    x = jnp.asarray(rng.integers(-128, 128, (B, 224, 224, 3)), jnp.int8)
    gd, st = nnx.split(res)

    def run(xq, s):
        m = nnx.merge(gd, s)
        y = m.stem.run_q(xq, relu=True, out_requant=m.stem_out_grid)
        y = maxpool_3x3_s2_int8(y)  # (B,56,56,64)
        f = jnp.max(y.reshape(B, 56, 56, 16, 4), axis=-1)  # reads all of y
        t = jnp.concatenate([f, f, f], axis=-1)  # (B,56,56,48)
        return t.reshape(B, 224, 224, 3).astype(jnp.int8)

    t_meas = chain_time(run, x, st)
    in_b = B * 224 * 224 * 3
    conv_out = B * 112 * 112 * 64
    pool_out = B * 56 * 56 * 64
    # conv: geometry-adjusted compute ceiling — K=147 pads to 256, N=64
    # half-fills the 128-lane MXU (measured r3: ~96% of this bound)
    flops = 2.0 * conv_out * 7 * 7 * 3
    stem_backend = getattr(res.stem, "backend", "?")
    geom = (147.0 / 256.0) * (64.0 / 128.0)
    ceiling = (bf16_tops if "bf16" in stem_backend else INT8_TOPS) * geom
    t_conv_io = (in_b + 7 * 7 * 3 * 64 + conv_out) / IO_GBPS
    t_conv_c = flops / ceiling
    t_pool_io = (conv_out + pool_out) / IO_GBPS
    t_fix_io = (pool_out + B * 56 * 56 * 48) / IO_GBPS
    rows = [
        ("conv", t_conv_io, t_conv_c,
         f"stem 7x7 3->64 s2 [{stem_backend:>10}] io {(in_b+conv_out)/1e6:7.1f} MB"
         f" (geom ceiling {ceiling/1e12:.0f} TOPS)"),
        ("pool", t_pool_io, 0.0,
         f"maxpool 3x3 s2         io {(conv_out+pool_out)/1e6:7.1f} MB"),
    ]
    print(f"\nstem group (224x224x3 s8 -> conv -> pool -> 56x56x64):", flush=True)
    print_rows(rows, measured_ms=t_meas * 1e3, fixup_io=t_fix_io)
    print("    (quantize ingest pass not in this chain: io floor 96 MB f32 "
          "form / 38 MB u8 form = 0.146 / 0.058 ms)", flush=True)


if __name__ == "__main__":
    main()
