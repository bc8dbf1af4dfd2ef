"""VapModel — full model assembly (encoder + stereo trunk + heads).

Capability contract from the reference:

- `VapGPT` assembly: per-channel 1-layer GPT (`ar_channel`), 3-layer
  cross-channel GPTStereo (`ar`), `vap_head` Linear(dim, 256),
  `va_classifier` Linear(dim, 1) (rvap/vap_main/vap_main.py:87-142).
- Variants share the trunk: `bc` adds `bc_head` Linear(dim, 3)
  (rvap/vap_bc/vap_bc_main.py:137); `nod` adds `nod_head` Linear(dim, 4)
  and `bc_head` Linear(dim, 1) (rvap/vap_nod/vap_nod_main.py:137-138).
- The checkpoint namespace holds ONE encoder shared by both channels
  (training uses a single encoder; realtime instantiates it twice with
  identical weights — vap_main.py:144-169, 203-212).  Here the params
  pytree stores one copy and both channels use it, which is numerically
  identical and halves weight HBM.

TPU-first design: both channels are batched into one leading axis through
the encoder and channel-GPT (shared weights -> one big matmul batch), and
all head outputs are computed in a single fused tail.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from vap_realtime_tpu.config import VapConfig
from vap_realtime_tpu.models import objective as obj
from vap_realtime_tpu.models.encoder import (
    encode_sequence, init_cpc_encoder_params,
)
from vap_realtime_tpu.models.transformer import (
    gpt_forward, gpt_stereo_forward, init_gpt_params,
)
from vap_realtime_tpu.ops.basic import linear

Params = Dict[str, Any]


def init_vap_params(rng: jax.Array, cfg: VapConfig,
                    dtype=jnp.float32) -> Params:
    k_enc, k_ch, k_cross, k_heads = jax.random.split(rng, 4)
    p: Params = {
        "encoder": init_cpc_encoder_params(
            k_enc, cfg.encoder_dim, cfg.downsample_kernel, dtype),
        "ar_channel": init_gpt_params(
            k_ch, cfg.dim, cfg.ffn_dim, cfg.channel_layers, cross=False,
            dtype=dtype),
        "ar": init_gpt_params(
            k_cross, cfg.dim, cfg.ffn_dim, cfg.cross_layers, cross=True,
            with_combinator=True, dtype=dtype),
    }
    kh = jax.random.split(k_heads, 6)
    std = 0.02
    p["vap_head"] = {
        "w": jax.random.normal(kh[0], (cfg.n_classes, cfg.dim), dtype) * std,
        "b": jnp.zeros((cfg.n_classes,), dtype)}
    p["va_classifier"] = {
        "w": jax.random.normal(kh[1], (1, cfg.dim), dtype) * std,
        "b": jnp.zeros((1,), dtype)}
    if cfg.mode == "bc":
        p["bc_head"] = {
            "w": jax.random.normal(kh[2], (3, cfg.dim), dtype) * std,
            "b": jnp.zeros((3,), dtype)}
    elif cfg.mode == "nod":
        p["nod_head"] = {
            "w": jax.random.normal(kh[3], (4, cfg.dim), dtype) * std,
            "b": jnp.zeros((4,), dtype)}
        p["bc_head"] = {
            "w": jax.random.normal(kh[4], (1, cfg.dim), dtype) * std,
            "b": jnp.zeros((1,), dtype)}
    if cfg.lid_classify == 1:
        p["lid_classifier"] = {
            "w": jax.random.normal(kh[5], (cfg.lid_classify_num_class,
                                           cfg.dim), dtype) * std,
            "b": jnp.zeros((cfg.lid_classify_num_class,), dtype)}
    elif cfg.lid_classify == 2:
        p["lid_classifier_middle"] = {
            "w": jax.random.normal(kh[5], (cfg.lid_classify_num_class,
                                           2 * cfg.dim), dtype) * std,
            "b": jnp.zeros((cfg.lid_classify_num_class,), dtype)}
    return p


def trunk_forward(params: Params, e1: jax.Array, e2: jax.Array,
                  cfg: VapConfig, rng: Optional[jax.Array] = None
                  ) -> Dict[str, jax.Array]:
    """Transformer trunk over per-channel embeddings.

    e1, e2: (B, T, D) -> dict with the combined stream and both channel
    streams, matching the reference hot loop (vap_main.py:285-287).

    The two channels share `ar_channel` weights, so they are folded into
    one (2B, T, D) batch for the channel GPT — one MXU pass instead of two.
    """
    B = e1.shape[0]
    drop = cfg.dropout if rng is not None else 0.0
    r1 = jax.random.fold_in(rng, 0) if rng is not None else None
    r2 = jax.random.fold_in(rng, 1) if rng is not None else None

    if rng is None:
        both = jnp.concatenate([e1, e2], axis=0)          # (2B, T, D)
        o = gpt_forward(params["ar_channel"], both, cfg.num_heads,
                        cfg.context_limit)
        o1, o2 = o[:B], o[B:]
    else:  # independent dropout masks per channel
        o1 = gpt_forward(params["ar_channel"], e1, cfg.num_heads,
                         cfg.context_limit, drop, r1)
        o2 = gpt_forward(params["ar_channel"], e2, cfg.num_heads,
                         cfg.context_limit, drop, r2)

    r3 = jax.random.fold_in(rng, 2) if rng is not None else None
    x, x1, x2 = gpt_stereo_forward(params["ar"], o1, o2, cfg.num_heads,
                                   cfg.context_limit, drop, r3)
    return {"x": x, "x1": x1, "x2": x2, "o1": o1, "o2": o2}


def heads_forward(params: Params, trunk: Dict[str, jax.Array],
                  cfg: VapConfig) -> Dict[str, jax.Array]:
    """All output heads for the configured mode.

    Always returns `logits` (B, T, 256) and per-channel `vad1`/`vad2`
    logits (B, T, 1); adds `bc_logits` / `nod_logits` for the variants.
    """
    # va tap: realtime uses the channel streams o1/o2, training uses the
    # stereo towers x1/x2 (see VapConfig.vad_tap)
    v1_src = trunk["o1"] if cfg.vad_tap == "channel" else trunk["x1"]
    v2_src = trunk["o2"] if cfg.vad_tap == "channel" else trunk["x2"]
    out: Dict[str, jax.Array] = {
        "logits": linear(trunk["x"], params["vap_head"]["w"],
                         params["vap_head"]["b"]),
        "vad1": linear(v1_src, params["va_classifier"]["w"],
                       params["va_classifier"]["b"]),
        "vad2": linear(v2_src, params["va_classifier"]["w"],
                       params["va_classifier"]["b"]),
    }
    if cfg.lid_classify == 1:
        out["lid_logits"] = linear(trunk["x"],
                                   params["lid_classifier"]["w"],
                                   params["lid_classifier"]["b"])
    elif cfg.lid_classify == 2:
        mid = jnp.concatenate([trunk["o1"], trunk["o2"]], axis=-1)
        out["lid_logits"] = linear(mid,
                                   params["lid_classifier_middle"]["w"],
                                   params["lid_classifier_middle"]["b"])
    if cfg.mode == "bc":
        out["bc_logits"] = linear(trunk["x"], params["bc_head"]["w"],
                                  params["bc_head"]["b"])
    elif cfg.mode == "nod":
        out["nod_logits"] = linear(trunk["x"], params["nod_head"]["w"],
                                   params["nod_head"]["b"])
        out["bc_logits"] = linear(trunk["x"], params["bc_head"]["w"],
                                  params["bc_head"]["b"])
    return out


def probs_from_outputs(outputs: Dict[str, jax.Array],
                       cfg: VapConfig) -> Dict[str, jax.Array]:
    """Convert head logits to the mode's probability outputs.

    vap: p_now/p_future (vap_main.py:295-307) + sigmoid vad.
    bc:  p_bc_react = softmax(bc)[..., 1], p_bc_emo = [..., 2]
         (vap_bc_main.py:272-284).
    nod: p_bc = sigmoid(bc), p_nod_short/long/long_p = softmax(nod)[...,1/2/3]
         (vap_nod_main.py:273-291).
    """
    res: Dict[str, jax.Array] = {
        "vad": jnp.stack([jax.nn.sigmoid(outputs["vad1"][..., 0]),
                          jax.nn.sigmoid(outputs["vad2"][..., 0])], axis=-1),
    }
    probs = jax.nn.softmax(outputs["logits"], axis=-1)
    res["p_now"] = obj.p_now(probs, cfg.n_bins)
    res["p_future"] = obj.p_future(probs, cfg.n_bins)
    # bit-entropy over the 256 projection states (train/model.py:233-242)
    res["H"] = -jnp.sum(probs * jnp.log2(probs + 1e-20), axis=-1)
    if cfg.mode == "bc":
        bc = jax.nn.softmax(outputs["bc_logits"], axis=-1)
        res["p_bc_react"] = bc[..., 1]
        res["p_bc_emo"] = bc[..., 2]
    elif cfg.mode == "nod":
        nod = jax.nn.softmax(outputs["nod_logits"], axis=-1)
        res["p_bc"] = jax.nn.sigmoid(outputs["bc_logits"][..., 0])
        res["p_nod_short"] = nod[..., 1]
        res["p_nod_long"] = nod[..., 2]
        res["p_nod_long_p"] = nod[..., 3]
    return res


def forward_context(params: Params, e1: jax.Array, e2: jax.Array,
                    cfg: VapConfig, rng: Optional[jax.Array] = None
                    ) -> Dict[str, jax.Array]:
    """Embeddings (B, T, D) x2 -> all head outputs (full recompute path)."""
    trunk = trunk_forward(params, e1, e2, cfg, rng)
    return heads_forward(params, trunk, cfg)


def forward_waveform(params: Params, waveform: jax.Array, cfg: VapConfig,
                     rng: Optional[jax.Array] = None
                     ) -> Dict[str, jax.Array]:
    """Training/offline-batch forward over full stereo waveforms.

    waveform: (B, 2, L) 16 kHz.  Both channels run through the single
    shared encoder as one (2B, L) batch (train/model.py:192-206 semantics).
    """
    B = waveform.shape[0]
    wav = jnp.concatenate([waveform[:, 0], waveform[:, 1]], axis=0)
    if cfg.context_limit_cpc_sec > 0:
        from vap_realtime_tpu.models.encoder import encode_sequence_limited
        e = encode_sequence_limited(params["encoder"], wav,
                                    cfg.downsample_kernel,
                                    cfg.context_limit_cpc_sec,
                                    cfg.sample_rate)
    else:
        e = encode_sequence(params["encoder"], wav, cfg.downsample_kernel)
    e1, e2 = e[:B], e[B:]
    return forward_context(params, e1, e2, cfg, rng)


class VapModel:
    """Thin convenience wrapper binding a config to the functional API."""

    def __init__(self, cfg: Optional[VapConfig] = None):
        self.cfg = cfg or VapConfig()

    def init(self, rng: jax.Array, dtype=jnp.float32) -> Params:
        return init_vap_params(rng, self.cfg, dtype)

    def forward(self, params: Params, waveform: jax.Array,
                rng: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
        return forward_waveform(params, waveform, self.cfg, rng)

    def forward_context(self, params: Params, e1: jax.Array, e2: jax.Array,
                        rng: Optional[jax.Array] = None
                        ) -> Dict[str, jax.Array]:
        return forward_context(params, e1, e2, self.cfg, rng)

    def probs(self, outputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return probs_from_outputs(outputs, self.cfg)
