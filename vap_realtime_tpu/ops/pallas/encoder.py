"""Fused CPC streaming conv stack — ONE Pallas TPU kernel for conv0..4.

The fast serving path's encoder (models/encoder.py
`cpc_conv_stack_streaming`, behavioural contract
rvap/vap_main/encoder_components.py:73-104) runs five strided convs each
followed by ChannelNorm + ReLU.  As XLA NCW HLOs every layer round-trips
its activations through HBM and the channel-dim norm reductions land on
the sublane axis — the r5 device trace pins the five norm stats/apply
passes alone at ~6.3 ms/step at B=4096 (norm0 apply 2.0 ms, norm1 stats
1.8 ms, ...), most of the 7.2 ms encoder.

This kernel runs the WHOLE stack per batch block inside VMEM:

- conv0 (k10 s5, 1 input channel) is one (Bb*T0, 10) x (10, 256) MXU
  matmul over patch rows built OUTSIDE the kernel (two reshapes of the
  raw (B, L+5) waveform — 20x smaller than the conv0 OUTPUT, which
  never touches HBM here).  Measured FREE: the r5 encoder lab's "c0"
  ablation adds 0.04 ms over the pure-DMA floor.
- conv1..4 (k = 2s) use the stride-block formulation: the input
  reshaped (Bb, G, s*C) makes each output row the sum of TWO dense
  matmuls over adjacent G-rows, y[t] = xm[t] @ W0 + xm[t+1] @ W1 with
  (s*C, C) packed weights — 8 MXU matmuls total with K in {512, 1024}.
  (The r5 lab measured the 20-per-tap alternative at 19 ms/step: many
  small matmuls + per-tap phase-extract relayouts.  XLA mangled this
  same formulation at the HLO level by assigning B-minormost layouts —
  PERF.md r4; inside the kernel WE own the layout.)
- weights ride to VMEM ONCE: HBM (memory_space=ANY) inputs are DMA'd
  into scratch on the first grid step only.  Blocked weight inputs
  were re-fetched every grid step — 2.6 MB x 512 steps = 1.3 GB/step,
  measured as ~4.8 ms of the first cut's 25.4 ms (encoder lab "dma").
- ChannelNorm (single-stats-pass, UNBIASED variance, clamped — same
  formulation as ops/basic.channel_norm) + ReLU run on the VPU over
  CHANNELS-LAST (lane-axis) activations, and no intermediate
  activation ever leaves VMEM.
- the per-layer streaming carries (the (k-s)-frame input tails,
  models/encoder.py CPC_CONV_CARRY) ride in channels-last (B, k-s, C)
  and the new tails come back as extra kernel outputs.

Numerics vs the NCW streaming stack: identical math with HIGHER
intermediate precision (bias-add and stride-block accumulation in f32
where the XLA path rounds each conv output to bf16 before bias/norm) —
exact on f32 (tests/test_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (kernel, stride) of conv0..conv4 (encoder_components.py:83-92)
CONV0_K, CONV0_S = 10, 5
TAIL_KS = ((8, 4), (4, 2), (4, 2), (4, 2))
C = 256

Params = Dict[str, Any]


def tail_lens(T0: int):
    """Per-layer (T_in, T_out) of the tail given conv0's output length
    (T_in includes the (k-s)-row carry; valid conv, stride s)."""
    lens = []
    T = T0
    for k, s in TAIL_KS:
        T_in = T + (k - s)
        assert T_in % s == 0, (T0, T_in, s)
        T = T_in // s - 1
        lens.append((T_in, T))
    return lens


def _cnorm_relu(y, w, b, dt):
    """ChannelNorm over the lane axis (UNBIASED variance, clamped,
    matching ops/basic.channel_norm) + ReLU.  y (Bb, T, C) f32;
    w/b (1, 1, C) already cast to dt.  Returns dt."""
    n = y.shape[-1]
    s1 = jnp.sum(y, axis=-1, keepdims=True)
    s2 = jnp.sum(y * y, axis=-1, keepdims=True)
    mean = s1 / n
    var = jnp.maximum((s2 - n * mean * mean) / (n - 1), 0.0)
    z = ((y - mean) * jax.lax.rsqrt(var + 1e-5)).astype(dt) * w + b
    return jnp.maximum(z, jnp.zeros((), dt))


def _kernel_v3(P4_ref, c1_ref, c2_ref, c3_ref, c4_ref,
               w0_hbm, wt1_hbm, wt2_hbm, wt3_hbm, wt4_hbm, aux_hbm,
               z_ref, n1_ref, n2_ref, n3_ref, n4_ref,
               w0_v, wt1_v, wt2_v, wt3_v, wt4_v, aux_v, xm1, sem,
               *, T0: int, ablate: str):
    """v3 body: conv0 runs as FOUR phase matmuls whose outputs write
    straight into the conv1 stride-block scratch xm1 (Bb, T0/4+1, 4C)
    at their lane offsets — the (Bb, 164, 256) -> (Bb, 41, 1024)
    lane-merge relayout of the biggest activation vanishes, and the
    patch input arrives 2-D per phase (contiguous HBM rows, vs the
    v1/v2 (.., T0, 10) blocks whose 20-BYTE rows made the DMA floor).
    Carry c1 arrives/leaves lane-merged (Bb, 1, 4C)."""
    dt = P4_ref.dtype
    f32 = jnp.float32
    Bb = P4_ref.shape[0]
    K0 = CONV0_K
    T04 = T0 // 4
    G1 = T04 + 1

    @pl.when(pl.program_id(0) == 0)
    def _load_weights():
        for hbm, vm in ((w0_hbm, w0_v), (wt1_hbm, wt1_v),
                        (wt2_hbm, wt2_v), (wt3_hbm, wt3_v),
                        (wt4_hbm, wt4_v), (aux_hbm, aux_v)):
            cp = pltpu.make_async_copy(hbm, vm, sem)
            cp.start()
            cp.wait()

    if ablate == "dma":
        for li, ref in enumerate((n1_ref, n2_ref, n3_ref, n4_ref)):
            ref[:] = (c1_ref, c2_ref, c3_ref, c4_ref)[li][:]
        s = jnp.sum(P4_ref[:].astype(f32)) + jnp.sum(wt1_v[0, 0])
        z_ref[:] = jnp.full_like(z_ref[:], s.astype(z_ref.dtype))
        return

    def aux(i):
        return aux_v[i:i + 1][:, None, :]

    # conv0 + norm0 + relu, phase-wise into the conv1 scratch.
    # P4 arrives 4-D (Bb, 4, T04, K0): the phase slice is a unit
    # second-major index and the matmul reshape merges LEADING dims
    # only — the lane-split reshapes Mosaic rejects never appear
    xm1[:, 0:1, :] = c1_ref[:]
    for p in range(4):
        Pp = P4_ref[:, p].reshape(Bb * T04, K0)
        a = jax.lax.dot_general(
            Pp, w0_v[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32).reshape(Bb, T04, C)
        a = _cnorm_relu(a + aux(0), aux(1).astype(dt),
                        aux(2).astype(dt), dt)
        xm1[:, 1:G1, p * C:(p + 1) * C] = a
    # conv1 input tail: the last 4 frames ARE the last merged row
    n1_ref[:] = xm1[:, G1 - 1:G1, :]

    if ablate == "c0":
        z_ref[:] = xm1[:, :z_ref.shape[1], :C]
        for li, ref in enumerate((n2_ref, n3_ref, n4_ref)):
            ref[:] = (c2_ref, c3_ref, c4_ref)[li][:]
        return

    # conv1 from the merged scratch: 2 stride-block matmuls
    xr = xm1[:].reshape(Bb * G1, 4 * C)
    z0 = jax.lax.dot_general(
        xr, wt1_v[0], (((1,), (0,)), ((), ())),
        preferred_element_type=f32).reshape(Bb, G1, C)
    z1 = jax.lax.dot_general(
        xr, wt1_v[1], (((1,), (0,)), ((), ())),
        preferred_element_type=f32).reshape(Bb, G1, C)
    y = z0[:, :T04] + z1[:, 1:G1] + aux(3)      # T_out = G1 - 1 = T04
    x = _cnorm_relu(y, aux(4).astype(dt), aux(5).astype(dt), dt)

    # conv2..4: lane-merge stride-block matmuls on the (small) tensors
    carries_in = (c2_ref, c3_ref, c4_ref)
    carries_out = (n2_ref, n3_ref, n4_ref)
    for li, (k, s) in enumerate(TAIL_KS[1:]):
        W = (wt2_v, wt3_v, wt4_v)[li]
        x = jnp.concatenate([carries_in[li][:].astype(dt), x], axis=1)
        if ablate != "nonorm":
            carries_out[li][:] = x[:, -(k - s):, :]
        else:
            carries_out[li][:] = carries_in[li][:]
        T_in = x.shape[1]
        G = T_in // s
        T_out = G - 1
        xm = x.reshape(Bb, G, s * C)
        xr2 = xm.reshape(Bb * G, s * C)
        z0 = jax.lax.dot_general(
            xr2, W[0], (((1,), (0,)), ((), ())),
            preferred_element_type=f32).reshape(Bb, G, C)
        z1 = jax.lax.dot_general(
            xr2, W[1], (((1,), (0,)), ((), ())),
            preferred_element_type=f32).reshape(Bb, G, C)
        y = z0[:, :T_out] + z1[:, 1:G] + aux(3 * (li + 2))
        if ablate == "nonorm":
            x = jnp.maximum(y, 0.0).astype(dt)
        else:
            x = _cnorm_relu(y, aux(3 * (li + 2) + 1).astype(dt),
                            aux(3 * (li + 2) + 2).astype(dt), dt)
    z_ref[:] = x


def _kernel(P_ref, c1_ref, c2_ref, c3_ref, c4_ref,
            w0_hbm, wt1_hbm, wt2_hbm, wt3_hbm, wt4_hbm, aux_hbm,
            z_ref, n1_ref, n2_ref, n3_ref, n4_ref,
            w0_v, wt1_v, wt2_v, wt3_v, wt4_v, aux_v, sem,
            *, T0: int, mode: str, ablate: str):
    dt = P_ref.dtype
    f32 = jnp.float32
    Bb, _, K0 = P_ref.shape

    # ---- weights: HBM -> VMEM scratch ONCE (first grid step) ----
    @pl.when(pl.program_id(0) == 0)
    def _load_weights():
        for hbm, vm in ((w0_hbm, w0_v), (wt1_hbm, wt1_v),
                        (wt2_hbm, wt2_v), (wt3_hbm, wt3_v),
                        (wt4_hbm, wt4_v), (aux_hbm, aux_v)):
            cp = pltpu.make_async_copy(hbm, vm, sem)
            cp.start()
            cp.wait()

    carries_in = (c1_ref, c2_ref, c3_ref, c4_ref)
    carries_out = (n1_ref, n2_ref, n3_ref, n4_ref)
    if ablate:
        # truncated lab bodies never reach (all of) the tail: emit
        # SOMETHING shape-correct for the carry outputs
        for li in range(4):
            carries_out[li][:] = carries_in[li][:]

    if ablate == "dma":
        s = jnp.sum(P_ref[:].astype(f32)) + jnp.sum(wt1_v[0, 0])
        z_ref[:] = jnp.full_like(z_ref[:], s.astype(z_ref.dtype))
        return

    def aux(i):
        # (1, 1, C) row of the packed f32 aux table
        return aux_v[i:i + 1][:, None, :]

    # ---- conv0: one (Bb*T0, 10) x (10, 256) matmul, f32 accumulate --
    a = jax.lax.dot_general(
        P_ref[:].reshape(Bb * T0, K0), w0_v[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=f32).reshape(Bb, T0, C)
    x = _cnorm_relu(a + aux(0), aux(1).astype(dt), aux(2).astype(dt), dt)
    if ablate == "c0":
        z_ref[:] = x[:, :z_ref.shape[1], :]
        return

    # ---- conv1..4: stride-block matmuls over VMEM activations -------
    wts = (wt1_v, wt2_v, wt3_v, wt4_v)
    for li, (k, s) in enumerate(TAIL_KS):
        x = jnp.concatenate([carries_in[li][:].astype(dt), x], axis=1)
        if not ablate:
            # new streaming tail = last (k-s) rows of this layer's
            # concatenated input
            carries_out[li][:] = x[:, -(k - s):, :]
        T_in = x.shape[1]
        G = T_in // s
        T_out = G - 1
        W = wts[li]
        if mode == "merge8":
            # (Bb, T_in, C) -> (Bb, G, s*C): row g's lanes are the s
            # consecutive frames [x[sg] | x[sg+1] | ...]
            xm = x.reshape(Bb, G, s * C)
        elif mode == "cat8":
            # same lane layout via s unit slices + one lane concat
            x4 = x.reshape(Bb, G, s, C)
            xm = jnp.concatenate([x4[:, :, p, :] for p in range(s)],
                                 axis=-1)
        if mode in ("merge8", "cat8"):
            xr = xm.reshape(Bb * G, s * C)
            z0 = jax.lax.dot_general(
                xr, W[0], (((1,), (0,)), ((), ())),
                preferred_element_type=f32).reshape(Bb, G, C)
            z1 = jax.lax.dot_general(
                xr, W[1], (((1,), (0,)), ((), ())),
                preferred_element_type=f32).reshape(Bb, G, C)
            y = z0[:, :T_out] + z1[:, 1:G]
        else:  # "taps20": per-tap matmuls (r5 lab: 19 ms/step — kept
            #  as the measured negative)
            x4 = x.reshape(Bb, G, s, C)
            acc = None
            for j in range(k):
                ph, blk = j % s, j // s
                seg = x4[:, blk:blk + T_out, ph, :]
                t = jax.lax.dot_general(
                    seg.reshape(Bb * T_out, C),
                    W[blk, ph * C:(ph + 1) * C],
                    (((1,), (0,)), ((), ())), preferred_element_type=f32)
                acc = t if acc is None else acc + t
            y = acc.reshape(Bb, T_out, C)
        y = y + aux(3 * (li + 1))
        if ablate == "nonorm":
            x = jnp.maximum(y, 0.0).astype(dt)
        else:
            x = _cnorm_relu(y, aux(3 * (li + 1) + 1).astype(dt),
                            aux(3 * (li + 1) + 2).astype(dt), dt)
    z_ref[:] = x


@functools.partial(jax.jit,
                   static_argnames=("block_b", "mode", "ablate",
                                    "interpret"))
def conv_stack_fused_call(P: jax.Array, carries: Tuple[jax.Array, ...],
                          w0: jax.Array, wts: Tuple[jax.Array, ...],
                          aux: jax.Array, block_b: int = 16,
                          mode: str = "merge8", ablate: str = "",
                          interpret: bool = False):
    """pallas_call wrapper: P (B, T0, 10) conv0 patches; carries
    (c1 (B, 4, C), c2/c3/c4 (B, 2, C)) channels-last input tails;
    w0 (10, C); wts: per-layer (2, s*C, C) stride-block weights
    (pack_fused_params); aux (15, C) f32 = [b0, nw0, nb0, b1, ...].

    mode: "merge8" (default — lane-merge reshape + 2 matmuls/layer),
    "cat8" (unit-slice concat variant), "taps20" (per-tap, measured
    negative).  ablate: lab-only kernel truncations ("dma", "c0",
    "nonorm") — numerically wrong by design.

    Returns (z (B, T4, C), (new c1..c4))."""
    if mode == "v3":        # P arrives phase-split (B, 4, T0/4, K0)
        B = P.shape[0]
        K0 = CONV0_K
        T0 = P.shape[2] * 4
    else:
        B, T0, K0 = P.shape
    lens = tail_lens(T0)
    T4 = lens[-1][1]
    Bb = min(block_b, B)
    while B % Bb:
        Bb //= 2
    interpret = interpret or jax.default_backend() == "cpu"
    dt = P.dtype

    grid = (B // Bb,)
    bspec = lambda t: pl.BlockSpec((Bb, t, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    scratch = [pltpu.VMEM((K0, C), dt)]
    scratch += [pltpu.VMEM((2, s * C, C), dt) for _k, s in TAIL_KS]
    scratch += [pltpu.VMEM((15, C), jnp.float32)]
    if mode == "v3":
        T04 = T0 // 4
        G1 = T04 + 1
        in_specs = [
            pl.BlockSpec((Bb, 4, T04, K0), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),        # P4 phase-split
            pl.BlockSpec((Bb, 1, 4 * C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),        # c1 merged
            bspec(2), bspec(2), bspec(2),
            any_spec, any_spec, any_spec, any_spec, any_spec,
            any_spec,
        ]
        n1_shape = jax.ShapeDtypeStruct((B, 1, 4 * C), dt)
        n1_spec = pl.BlockSpec((Bb, 1, 4 * C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        scratch += [pltpu.VMEM((Bb, G1, 4 * C), dt),
                    pltpu.SemaphoreType.DMA]
        kern = functools.partial(_kernel_v3, T0=T0, ablate=ablate)
    else:
        in_specs = [
            pl.BlockSpec((Bb, T0, K0), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),        # P
            bspec(4), bspec(2), bspec(2), bspec(2),       # carries
            any_spec, any_spec, any_spec, any_spec, any_spec,
            any_spec,                                      # aux
        ]
        n1_shape = jax.ShapeDtypeStruct((B, 4, C), dt)
        n1_spec = bspec(4)
        scratch += [pltpu.SemaphoreType.DMA]
        kern = functools.partial(_kernel, T0=T0, mode=mode,
                                 ablate=ablate)
    out_shape = [
        jax.ShapeDtypeStruct((B, T4, C), dt),
        n1_shape,
        jax.ShapeDtypeStruct((B, 2, C), dt),
        jax.ShapeDtypeStruct((B, 2, C), dt),
        jax.ShapeDtypeStruct((B, 2, C), dt),
    ]
    out_specs = [bspec(T4), n1_spec, bspec(2), bspec(2), bspec(2)]
    z, n1, n2, n3, n4 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(P, *carries, w0, *wts, aux)
    return z, (n1, n2, n3, n4)


def pack_fused_params(enc: Params):
    """Encoder params pytree -> (w0, wts, aux) kernel operands.

    w0: conv0 weight (C_out, 1, 10) -> (10, C).  wts: per tail layer a
    (2, s*C, C) pair of stride-block matrices — W[b] rows [p*C:(p+1)*C]
    hold tap j = b*s + p, so xm[t] @ W[0] + xm[t+1] @ W[1] equals
    sum_j x[s*t + j] @ w_tap[j] for the lane-merged xm.  aux (15, C)
    f32 = per-layer [bias, norm w, norm b] rows."""
    w0 = jnp.transpose(enc["conv0"]["w"][:, 0, :], (1, 0))      # (10, C)
    wts = []
    for i, (k, s) in enumerate(TAIL_KS):
        taps = jnp.transpose(enc[f"conv{i + 1}"]["w"], (2, 1, 0))
        wts.append(jnp.stack(
            [taps[b * s:(b + 1) * s].reshape(s * C, C)
             for b in range(2)]))                               # (2,sC,C)
    rows = []
    for i in range(5):
        rows += [enc[f"conv{i}"]["b"],
                 enc[f"norm{i}"]["w"][:, 0], enc[f"norm{i}"]["b"][:, 0]]
    aux = jnp.stack([jnp.asarray(r, jnp.float32) for r in rows])  # (15, C)
    return w0, tuple(wts), aux


def conv0_patches(xc0: jax.Array):
    """(B, L+5) carry-prefixed waveform -> (B, L/5, 10) conv0 patch rows
    (P[b, t, :] = xc0[b, 5t : 5t+10]) via two reshapes + one concat —
    cheap XLA ops on the raw waveform."""
    B, Lp = xc0.shape
    T0 = (Lp - CONV0_S) // CONV0_S
    xr = xc0.reshape(B, T0 + 1, CONV0_S)
    return jnp.concatenate([xr[:, :T0], xr[:, 1:]], axis=-1)


def cpc_conv_stack_streaming_fused(params: Params, new: jax.Array,
                                   state: Params, block_b: int = 16,
                                   mode: str = "merge8",
                                   ablate: str = ""):
    """Drop-in replacement for models/encoder.cpc_conv_stack_streaming
    with the fused kernel: new (B, L) fresh samples, state carries
    channels-last ({"c0": (B, 1, 5)} + {"c1": (B, 4, C), "c2".."c4":
    (B, 2, C)}).  Returns ((B, L/160, C) features, new_state)."""
    dt = new.dtype
    B = new.shape[0]
    xc0 = jnp.concatenate([state["c0"][:, 0, :].astype(dt), new], axis=-1)
    P = conv0_patches(xc0)
    w0, wts, aux = pack_fused_params(params)
    carries = tuple(state[f"c{i}"].astype(dt) for i in range(1, 5))
    if mode == "v3":
        # conv0 patches split into the 4 conv1 phases, flattened to
        # contiguous 2-D HBM rows; carry c1 lane-merged (both reshapes
        # are cheap XLA ops outside the kernel)
        P = jnp.stack([P[:, p::4] for p in range(4)], axis=1)
        carries = (carries[0].reshape(B, 1, 4 * C),) + carries[1:]
    z, tails = conv_stack_fused_call(
        P, carries, w0.astype(dt), tuple(w.astype(dt) for w in wts),
        aux, block_b=block_b, mode=mode, ablate=ablate)
    new_state = {"c0": xc0[:, None, -CONV0_S:]}
    for i, t in enumerate(tails):
        if i == 0 and mode == "v3":
            t = t.reshape(B, 4, C)
        new_state[f"c{i + 1}"] = t
    return z, new_state


def init_conv_stream_state_fused(batch: int, dim: int = C,
                                 dtype=jnp.float32) -> Params:
    """Channels-last streaming carries for the fused kernel (identical
    layout to models/encoder.init_conv_stream_state since r5 — the NCW
    carries paid a 64x lane-padding HBM tax at large B)."""
    st: Params = {"c0": jnp.zeros((batch, 1, CONV0_S), dtype)}
    for i, (k, s) in enumerate(TAIL_KS):
        st[f"c{i + 1}"] = jnp.zeros((batch, k - s, dim), dtype)
    return st
