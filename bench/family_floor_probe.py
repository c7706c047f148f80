"""Per-fusion floor decomposition of the FAMILY engines — MobileNet-v1 and
AlexNet-OWT-BN (VERDICT r4 next-step #5).

ResNet-50 got the per-fusion floor theorem (bench/stage_floor_probe.py);
the families only had vs-fp32 ratios. This probe closes that with a
two-level decomposition per engine:

  1. io floor      per fusion: (in + weights + out bytes)/657 GB/s — an
                   incontrovertible lower bound (the round-3 DMA study's
                   measured elementwise duplex rate). For dense convs a
                   geometry-adjusted MXU compute bound is also shown
                   (K/ceil256(K) x min(N,128)/128 occupancy — the stem
                   methodology); DEPTHWISE convs get io-only floors: their
                   K=9 grouped form has no honest MXU structural bound (a
                   better kernel could use the VPU), so we bound them by
                   the isolated measurement instead.
  2. isolated      each fusion measured alone (chain_time) — an achievable
                   bound: a chain cannot run a fusion faster than its
                   isolated self.

  chain vs sum(isolated)  -> composition/scheduling slack (claimable)
  isolated vs max(io,geom) -> op-level headroom (claimable for dense convs;
                              for depthwise it flags backend/kernel work)

Usage: python bench/family_floor_probe.py [B] [mobilenet|alexnet]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from __graft_entry__ import _calibrated_model
from quantized_tpu.engine import apply_cached_backends
from quantized_tpu.utils.timing import chain_time, per_iter_time

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
FAMILY = sys.argv[2] if len(sys.argv) > 2 else "mobilenet"

IO_GBPS = 657e9   # measured duplex elementwise rate (RESULTS.md r3)
INT8_TOPS = 355e12  # measured s8 dot ceiling (bench/roofline.py)


def measured_bf16_tops(n: int = 8192) -> float:
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)

    def step(c, a, b):
        acc = jax.lax.dot_general(
            (a + c.astype(jnp.bfloat16)).astype(jnp.bfloat16), b,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return jnp.max(acc).astype(jnp.float32) * 1e-9

    return 2.0 * n * n * n / per_iter_time(step, a, b)


def conv_geom_floor(conv, h_in, bf16_tops, out_f32=False):
    """(t_io, t_comp_geom, hout, label) for one IntConv2d fusion."""
    kh, kw, cin_w, cout = (int(v) for v in conv.w_q.get_value().shape)
    groups = getattr(conv, "groups", 1)
    sh, _ = conv.stride
    ph, _ = conv.padding
    hout = (h_in + 2 * ph - kh) // sh + 1
    cin = cin_w * groups
    in_b = B * h_in * h_in * cin
    w_b = kh * kw * cin_w * cout
    out_elems = B * hout * hout * cout
    out_b = out_elems * (4 if out_f32 else 1)
    t_io = (in_b + w_b + out_b) / IO_GBPS
    flops = 2.0 * out_elems * kh * kw * cin_w
    dw = groups > 1
    if dw:
        t_comp = 0.0  # no honest MXU bound for K=9 grouped convs (docstring)
    else:
        k = kh * kw * cin_w
        geom = (k / (np.ceil(k / 256.0) * 256.0)) * (min(cout, 128) / 128.0)
        ceiling = (bf16_tops if conv.backend.startswith("bf16") else INT8_TOPS) * geom
        t_comp = flops / ceiling
    label = (f"{'dw' if dw else 'conv'} {kh}x{kw} {cin:>4}->{cout:<4} s{sh} "
             f"[{conv.backend:>10}]")
    return t_io, t_comp, hout, label


def fc_floor(fc, n_in, out_f32=False):
    w = fc.w_q.get_value()
    fin, fout = (int(v) for v in w.shape) if w.ndim == 2 else (n_in, w.shape[-1])
    in_b = B * fin
    w_b = fin * fout
    out_b = B * fout * (4 if out_f32 else 1)
    t_io = (in_b + w_b + out_b) / IO_GBPS
    geom = min(B, 128) / 128.0  # M=B rows on the 128-lane MXU
    t_comp = 2.0 * B * fin * fout / (INT8_TOPS * geom)
    return t_io, t_comp, f"fc   {fin:>5}->{fout:<5}      [{fc.backend:>10}]"


def report(units, chain_ms):
    """units: list of (name, t_io, t_geom, t_isolated_ms). The two binding
    bounds are the io-floor sum (incontrovertible) and the isolated sum
    (achievable); the geom column is informational — its K-padding model is
    for the s8 emitter and over-penalizes small-K bf16 convs (measured)."""
    sum_io = sum(u[1] for u in units)
    sum_iso = sum(u[3] for u in units)
    print(f"\n  {'unit':<38} {'io':>7} {'geom':>7} {'isolated':>9} {'iso/io':>7}")
    for name, t_io, t_geom, iso in units:
        print(f"  {name:<38} {t_io*1e3:7.3f} {t_geom*1e3:7.3f} "
              f"{iso:9.3f} {iso/(t_io*1e3+1e-12):6.1%}")
    print(f"  {'SUM':<38} {sum_io*1e3:7.3f} {'':>7} {sum_iso:9.3f}")
    sum_mx = sum(max(u[1], u[2]) for u in units)
    print(f"  whole chain measured {chain_ms:8.3f} ms | io-floor-sum/chain "
          f"{sum_io*1e3/chain_ms:6.1%} (fraction of the pure-io floor attained) | "
          f"max(io,geom)-sum/chain {sum_mx*1e3/chain_ms:6.1%} | "
          f"chain/sum-isolated {chain_ms/sum_iso:6.1%}", flush=True)


def probe_mobilenet(bf16_tops, rng):
    from quantized_tpu.engine import build_int8_mobilenet

    from quantized_tpu.utils.hostbuild import host_build, put_model

    with host_build():
        eng = build_int8_mobilenet(_calibrated_model("mobilenet_quantized"))
        tuned = apply_cached_backends(eng, jnp.zeros((B, 224, 224, 3), jnp.float32))
    put_model(eng)
    print(f"MobileNet-v1 int8-resident, B={B}, tuned={tuned} "
          f"(fused_stages={getattr(eng, 'fused_stages', False)})", flush=True)
    gd, st = nnx.split(eng)

    # the tuned engine may be in the fused-plan layout (all dwpw races chose
    # 'unfused', so stages are _ConvStage wrappers): collect (accessor, conv,
    # out_grid) uniformly for both layouts
    seq = []
    if getattr(eng, "fused_stages", False):
        for j in range(eng.num_fused_stages):
            stg = getattr(eng, f"stage{j}")
            assert hasattr(stg, "conv"), "fused dwpw stage present; probe expects the unfused plan"
            seq.append(((f"stage{j}", "conv"), stg.conv, stg.stage_out_grid))
    else:
        for i in range(eng.num_convs):
            seq.append(((f"conv{i}",), getattr(eng, f"conv{i}"), eng.requant_grids[i]))

    # per-conv isolated measurements + floors
    h = 224
    units = []
    for i, (path, conv, grid) in enumerate(seq):
        out_f32 = grid is None
        t_io, t_geom, h_out, label = conv_geom_floor(conv, h, bf16_tops, out_f32)
        cin = int(conv.w_q.get_value().shape[2]) * getattr(conv, "groups", 1)
        x_q = jnp.asarray(rng.integers(-128, 128, (B, h, h, cin)), jnp.int8)

        def step(c, s, x, _path=path, _grid=grid):
            m = nnx.merge(gd, s)
            node = m
            for p in _path:
                node = getattr(node, p)
            y = node.run_q((x + c.astype(jnp.int8)).astype(jnp.int8),
                           relu=True, out_requant=_grid)
            return jnp.max(y).astype(jnp.float32) * 1e-9

        iso = per_iter_time(step, st, x_q, target_secs=0.4) * 1e3
        units.append((f"{i:02d} {label}", t_io, t_geom, iso))
        h = h_out

    # whole-net chain: forward to logits, fixup logits -> input shape
    x0 = jnp.asarray(rng.integers(-128, 128, (B, 224, 224, 3)), jnp.int8)

    def run_net(x, s):
        m = nnx.merge(gd, s)
        logits = m._forward_q(x)
        # read all logits, tile back to an input-shaped int8 carry
        r = jnp.max(logits, -1, keepdims=True) * 1e-6  # (B,1)
        t = jnp.broadcast_to(r[:, None, None, :], (B, 224, 224, 3))
        return (x + t.astype(jnp.int8)).astype(jnp.int8)

    chain_ms = chain_time(run_net, x0, st) * 1e3
    # avgpool+fc floor (tiny): last conv f32 out read + fc
    t_fc_io, t_fc_c, fc_label = fc_floor(eng.fc, 1024, out_f32=True)
    units.append((fc_label + " (+avgpool)", t_fc_io + B * 7 * 7 * 1024 * 4 / IO_GBPS,
                  t_fc_c, float("nan")))
    report(units[:-1], chain_ms)
    print(f"  (avgpool+fc io floor {units[-1][1]*1e3:.3f} ms not isolated — "
          f"included in the whole-chain number)", flush=True)


def probe_alexnet(bf16_tops, rng):
    from quantized_tpu.engine import build_int8_alexnet
    from quantized_tpu.engine.int8_alexnet import pool_3x3_s2_valid_int8

    from quantized_tpu.utils.hostbuild import host_build, put_model

    with host_build():
        eng = build_int8_alexnet(_calibrated_model("alexnet_quantized"))
        tuned = apply_cached_backends(eng, jnp.zeros((B, 224, 224, 3), jnp.float32))
    put_model(eng)
    print(f"AlexNet-OWT-BN int8-resident, B={B}, tuned={tuned}", flush=True)
    gd, st = nnx.split(eng)
    g = eng.requant_grids

    convs = [eng.conv1, eng.conv2, eng.conv3, eng.conv4, eng.conv5]
    h_ins = [224, 27, 13, 13, 13]
    pooled = {0: 55, 1: 27, 4: 13}  # conv idx -> pre-pool spatial
    units = []
    for i, (conv, h_in) in enumerate(zip(convs, h_ins)):
        t_io, t_geom, h_out, label = conv_geom_floor(conv, h_in, bf16_tops)
        cin = int(conv.w_q.get_value().shape[2])
        x_q = jnp.asarray(rng.integers(-128, 128, (B, h_in, h_in, cin)), jnp.int8)

        def step(c_, s, x, _i=i):
            m = nnx.merge(gd, s)
            cv = [m.conv1, m.conv2, m.conv3, m.conv4, m.conv5][_i]
            y = cv.run_q((x + c_.astype(jnp.int8)).astype(jnp.int8),
                         relu=True, out_requant=g[_i])
            return jnp.max(y).astype(jnp.float32) * 1e-9

        iso = per_iter_time(step, st, x_q, target_secs=0.4) * 1e3
        units.append((f"c{i+1} {label}", t_io, t_geom, iso))
        if i in pooled:
            hp = pooled[i]
            cout = int(conv.w_q.get_value().shape[3])
            xp = jnp.asarray(rng.integers(-128, 128, (B, hp, hp, cout)), jnp.int8)
            def pstep(c_, x):
                y = pool_3x3_s2_valid_int8((x + c_.astype(jnp.int8)).astype(jnp.int8))
                return jnp.max(y).astype(jnp.float32) * 1e-9

            iso_p = per_iter_time(pstep, xp, target_secs=0.4) * 1e3
            hq = (hp - 3) // 2 + 1
            t_pio = (B * hp * hp * cout + B * hq * hq * cout) / IO_GBPS
            units.append((f"p{i+1} pool 3x3s2 {hp}->{hq} x{cout}", t_pio, 0.0, iso_p))

    fcs = [(eng.fc1, 9216, False), (eng.fc2, 4096, False), (eng.fc3, 4096, True)]
    for j, (fc, fin, f32out) in enumerate(fcs):
        t_io, t_geom, label = fc_floor(fc, fin, out_f32=f32out)
        x_q = jnp.asarray(rng.integers(-128, 128, (B, fin)), jnp.int8)

        def fstep(c_, s, x, _j=j, _f32=f32out):
            m = nnx.merge(gd, s)
            f = [m.fc1, m.fc2, m.fc3][_j]
            if _f32:
                y = f.run_q((x + c_.astype(jnp.int8)).astype(jnp.int8))
            else:
                y = f.run_q((x + c_.astype(jnp.int8)).astype(jnp.int8),
                            relu=True, out_requant=g[5 + _j])
            return jnp.max(y).astype(jnp.float32) * 1e-9

        iso = per_iter_time(fstep, st, x_q, target_secs=0.4) * 1e3
        units.append((f"fc{j+1} {label}", t_io, t_geom, iso))

    x0 = jnp.asarray(rng.integers(-128, 128, (B, 224, 224, 3)), jnp.int8)

    def run_net(x, s):
        m = nnx.merge(gd, s)
        logits = m._forward_q(x)
        r = jnp.max(logits, -1, keepdims=True) * 1e-6
        t = jnp.broadcast_to(r[:, None, None, :], (B, 224, 224, 3))
        return (x + t.astype(jnp.int8)).astype(jnp.int8)

    chain_ms = chain_time(run_net, x0, st) * 1e3
    report(units, chain_ms)


def main():
    rng = np.random.default_rng(0)
    bf16_tops = measured_bf16_tops()
    print(f"measured bf16 ceiling: {bf16_tops/1e12:.0f} TOPS", flush=True)
    if FAMILY == "mobilenet":
        probe_mobilenet(bf16_tops, rng)
    else:
        probe_alexnet(bf16_tops, rng)


if __name__ == "__main__":
    main()
