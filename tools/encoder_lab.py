"""Encoder conv-stack ablation lab (real TPU).

Times the streaming CPC conv stack impls in isolation with the bench's
difference-quotient scan methodology (evolving inputs, consumed outputs,
carried state — ARCHITECTURE.md):

    python tools/encoder_lab.py --impls conv,fused --batch 8192 --hz 20

batch counts CHANNEL-streams (2x serving streams).  The r5 motivation:
the device trace pins the five NCW ChannelNorm stats/apply passes at
~6.3 ms/step at B=4096 serving streams; the fused Pallas kernel
(ops/pallas/encoder.py) keeps the whole stack in VMEM.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def measure(step, state0, chunk, params, f_short=8, f_long=40, reps=3):
    def make(F):
        def run(params, state, chunk):
            def body(carry, _):
                st, ch, acc = carry
                z, st = step(params, ch, st)
                acc = acc + jnp.sum(z.astype(jnp.float32))
                ch = ch * 0.999 + 1e-4 * acc.astype(ch.dtype)
                return (st, ch, acc), None
            (st, ch, acc), _ = jax.lax.scan(
                body, (state, chunk, jnp.float32(0)), None, length=F)
            return acc
        return jax.jit(run)

    def timed(F):
        run = make(F)
        _ = float(run(params, state0, chunk))     # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(run(params, state0, chunk))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(f_long) - timed(f_short)) / (f_long - f_short)


# ---- ablated fused-kernel variants (numerically wrong by design) ----------

def make_ablated(mode: str, block_b: int):
    """Fused-kernel ablations: 'dma' = block reads + trivial writes only
    (pipeline + weight-refetch floor); 'nonorm' = convs with plain ReLU
    (no ChannelNorm stats); 'noc0' = conv0 replaced by a slice-broadcast
    (tail cost only); 'c0' = conv0+norm0 only, tail skipped."""
    import functools as ft

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from vap_realtime_tpu.ops.pallas import encoder as enc

    C = enc.C

    def kern(P_ref, c1_ref, c2_ref, c3_ref, c4_ref, w0_ref, wt_ref,
             aux_ref, z_ref, n1_ref, n2_ref, n3_ref, n4_ref, *, T0):
        dt = P_ref.dtype
        f32 = jnp.float32
        Bb = P_ref.shape[0]
        carries_in = (c1_ref, c2_ref, c3_ref, c4_ref)
        carries_out = (n1_ref, n2_ref, n3_ref, n4_ref)
        for i in range(4):
            carries_out[i][:] = carries_in[i][:]
        if mode == "dma":
            s = (jnp.sum(P_ref[:].astype(f32)) + jnp.sum(wt_ref[0]
                 .astype(f32)))
            z_ref[:] = jnp.full_like(z_ref, s.astype(z_ref.dtype))
            return
        def aux(i):
            return aux_ref[i:i + 1][:, None, :]
        if mode == "noc0":
            x = jnp.broadcast_to(
                P_ref[:, :, :1].astype(dt), (Bb, T0, 128)
            )
            x = jnp.concatenate([x, x], axis=-1)
        else:
            a = jax.lax.dot_general(
                P_ref[:].reshape(Bb * T0, P_ref.shape[-1]), w0_ref[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32).reshape(Bb, T0, C)
            x = enc._cnorm_relu(a + aux(0), aux(1).astype(dt),
                                aux(2).astype(dt), dt)
        if mode == "c0":
            z_ref[:] = x[:, :z_ref.shape[1], :]
            return
        tap = 0
        for li, (k, s) in enumerate(enc.TAIL_KS):
            x = jnp.concatenate([carries_in[li][:].astype(dt), x], axis=1)
            T_in = x.shape[1]
            G = T_in // s
            T_out = G - 1
            x4 = x.reshape(Bb, G, s, C)
            acc = None
            for j in range(k):
                ph, blk = j % s, j // s
                seg = x4[:, blk:blk + T_out, ph, :]
                t = jax.lax.dot_general(
                    seg.reshape(Bb * T_out, C), wt_ref[tap + j],
                    (((1,), (0,)), ((), ())), preferred_element_type=f32)
                acc = t if acc is None else acc + t
            tap += k
            y = acc.reshape(Bb, T_out, C) + aux(3 * (li + 1))
            if mode == "nonorm":
                x = jnp.maximum(y, 0.0).astype(dt)
            else:
                x = enc._cnorm_relu(y, aux(3 * (li + 1) + 1).astype(dt),
                                    aux(3 * (li + 1) + 2).astype(dt), dt)
        z_ref[:] = x

    @ft.partial(jax.jit, static_argnames=())
    def call(P, carries, w0, wt, aux):
        B, T0, K0 = P.shape
        T4 = enc.tail_lens(T0)[-1][1]
        Bb = min(block_b, B)
        dt = P.dtype
        bspec = lambda t: pl.BlockSpec((Bb, t, C), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)
        return pl.pallas_call(
            ft.partial(kern, T0=T0),
            grid=(B // Bb,),
            in_specs=[
                pl.BlockSpec((Bb, T0, K0), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                bspec(4), bspec(2), bspec(2), bspec(2),
                pl.BlockSpec((K0, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((20, C, C), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((15, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[bspec(T4), bspec(4), bspec(2), bspec(2), bspec(2)],
            out_shape=[
                jax.ShapeDtypeStruct((B, T4, C), dt),
                jax.ShapeDtypeStruct((B, 4, C), dt),
                jax.ShapeDtypeStruct((B, 2, C), dt),
                jax.ShapeDtypeStruct((B, 2, C), dt),
                jax.ShapeDtypeStruct((B, 2, C), dt),
            ],
        )(P, *carries, w0, wt, aux)

    def step(params, new, state):
        from vap_realtime_tpu.ops.pallas.encoder import (
            conv0_patches, pack_fused_params,
        )
        dt = new.dtype
        xc0 = jnp.concatenate([state["c0"][:, 0, :].astype(dt), new],
                              axis=-1)
        P = conv0_patches(xc0)
        w0, wt, aux = pack_fused_params(params)
        z, *tails = call(P, tuple(state[f"c{i}"].astype(dt)
                                  for i in range(1, 5)),
                         w0.astype(dt), wt.astype(dt), aux)
        ns = {"c0": xc0[:, None, -5:]}
        for i, t in enumerate(tails):
            ns[f"c{i + 1}"] = t
        return z, ns

    return step


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--impls", default="conv,fused")
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--hz", type=int, default=20)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--block_b", type=int, default=16)
    args = ap.parse_args()

    from vap_realtime_tpu.models.encoder import (
        cpc_conv_stack_streaming, cpc_conv_stack_streaming_blocked,
        init_conv_stream_state, init_cpc_encoder_params,
    )
    from vap_realtime_tpu.ops.pallas.encoder import (
        cpc_conv_stack_streaming_fused, init_conv_stream_state_fused,
    )

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    L = 16000 // args.hz
    B = args.batch
    params = init_cpc_encoder_params(jax.random.PRNGKey(0))
    params = jax.device_put(
        jax.tree_util.tree_map(lambda x: x.astype(dt), params))
    rs = np.random.RandomState(0)
    chunk = jax.device_put(
        jnp.asarray(rs.randn(B, L).astype(np.float32) * 0.1).astype(dt))

    print(f"device {jax.devices()[0]}  B={B} chan-streams  L={L}  "
          f"{args.dtype}")
    for impl in args.impls.split(","):
        if impl == "conv":
            step = lambda p, ch, st: cpc_conv_stack_streaming(p, ch, st)
            st0 = init_conv_stream_state(B, dtype=dt)
        elif impl == "blocked":
            step = lambda p, ch, st: cpc_conv_stack_streaming_blocked(
                p, ch, st)
            st0 = init_conv_stream_state(B, dtype=dt)
        elif impl.startswith("fused"):
            bb = args.block_b
            if "@" in impl:
                impl, bbs = impl.split("@")
                bb = int(bbs)
            mode = impl[len("fused"):].lstrip("_")
            if mode:
                step = make_ablated(mode, bb)
            else:
                step = functools.partial(
                    lambda bb, p, ch, st: cpc_conv_stack_streaming_fused(
                        p, ch, st, block_b=bb), bb)
            st0 = init_conv_stream_state_fused(B, dtype=dt)
        else:
            raise SystemExit(f"unknown impl {impl}")
        try:
            t = measure(step, st0, chunk, params)
            print(f"  {impl:8s}: {t * 1e3:7.3f} ms/step")
        except Exception as e:  # compile failures are data too
            print(f"  {impl:8s}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
