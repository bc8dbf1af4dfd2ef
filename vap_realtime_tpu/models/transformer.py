"""Stereo VAP transformer — AliBi attention, channel GPT, cross-channel GPT.

Behavioural contract from the reference (rvap/vap_main/modules.py):

- MHA with separate bias-free Q/K/V/out projections; NOTE the reference
  scales scores by ``1/sqrt(dim)`` with the FULL model dim (256), not the
  per-head dim (modules.py:52) — parity requires reproducing this.
- AliBi positional bias: per-head slope m_h, score bias ``j * m_h`` for key
  position j (absolute within the window), plus causal -inf mask
  (modules.py:161-188).  Because softmax is shift-invariant per row this
  equals the canonical ``-(i-j) * m_h`` relative form — which is what the
  incremental KV-cache path uses (runtime/), keyed on key *age*.
- Optional ``context_limit`` band mask: key j is masked for query i when
  ``j <= i - context_limit`` (modules.py:196-200).
- Pre-LN transformer layer, FFN dff = 3*dim with GELU, bias-free FFN
  (modules.py:9-21, 215-286).  Cross-attention uses the RAW src as K/V
  (src is not layer-normed; modules.py:276-283).
- Stereo layer runs the shared-weight layer twice with swapped roles; both
  towers read the *pre-update* opposite stream (modules.py:289-300).
- Combinator: per-channel bias-free linear -> shared LayerNorm -> GELU,
  then sum (modules.py:426-464).

AliBi slopes for 4 heads: [2^-2, 2^-4, 2^-6, 2^-8] (modules.py:126-159).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from vap_realtime_tpu.ops.basic import gelu, layer_norm, linear

Params = Dict[str, Any]

NEG_INF = float("-inf")


def alibi_slopes(n_heads: int) -> List[float]:
    """AliBi head slopes (modules.py:126-159)."""

    def power_of_2(n):
        start = 2 ** (-(2 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(n_heads).is_integer():
        return power_of_2(n_heads)
    closest = 2 ** math.floor(math.log2(n_heads))
    return (power_of_2(closest)
            + alibi_slopes(2 * closest)[0::2][: n_heads - closest])


def alibi_bias(T: int, num_heads: int, context_limit: int = -1,
               dtype=jnp.float32) -> jax.Array:
    """(H, T, T) additive attention bias: j*m_h on/below the diagonal,
    -inf above (and outside the context_limit band when enabled)."""
    m = jnp.asarray(alibi_slopes(num_heads), dtype)          # (H,)
    j = jnp.arange(T, dtype=dtype)                            # key index
    bias = m[:, None, None] * j[None, None, :]                # (H, 1, T) -> bc
    bias = jnp.broadcast_to(bias, (num_heads, T, T))
    i = jnp.arange(T)
    causal = i[:, None] >= i[None, :]                         # (T, T)
    if context_limit > 0:
        causal = causal & (i[None, :] > i[:, None] - context_limit)
    return jnp.where(causal[None], bias, NEG_INF)


def _dropout(x, rate, rng):
    if rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def mha(params: Params, q_in: jax.Array, kv_in: jax.Array, bias: jax.Array,
        num_heads: int, dropout: float = 0.0,
        rng: Optional[jax.Array] = None) -> jax.Array:
    """Multi-head attention over full sequences.

    q_in: (B, Tq, D); kv_in: (B, Tk, D); bias: (H, Tq, Tk) additive.
    Scale is 1/sqrt(D) with the FULL dim (reference modules.py:52).
    """
    B, Tq, D = q_in.shape
    Tk = kv_in.shape[1]
    Dh = D // num_heads

    def split(x, T):
        return x.reshape(B, T, num_heads, Dh).transpose(0, 2, 1, 3)

    q = split(linear(q_in, params["q"]), Tq)   # (B, H, Tq, Dh)
    k = split(linear(kv_in, params["k"]), Tk)
    v = split(linear(kv_in, params["v"]), Tk)

    scores = jnp.einsum("bhid,bhjd->bhij", q, k) * (1.0 / math.sqrt(D))
    scores = scores + bias[None]
    att = jax.nn.softmax(scores, axis=-1)
    if rng is not None:
        rng, sub = jax.random.split(rng)
        att = _dropout(att, dropout, sub)
    y = jnp.einsum("bhij,bhjd->bhid", att, v)
    y = y.transpose(0, 2, 1, 3).reshape(B, Tq, D)
    y = linear(y, params["proj"])
    if rng is not None:
        y = _dropout(y, dropout, rng)
    return y


def ffn(params: Params, x: jax.Array, dropout: float = 0.0,
        rng: Optional[jax.Array] = None) -> jax.Array:
    """Bias-free FFN: Linear -> GELU -> Dropout -> Linear (modules.py:9-21)."""
    h = gelu(linear(x, params["w1"]))
    h = _dropout(h, dropout, rng)
    return linear(h, params["w2"])


def transformer_layer(params: Params, x: jax.Array, bias: jax.Array,
                      num_heads: int, src: Optional[jax.Array] = None,
                      dropout: float = 0.0,
                      rng: Optional[jax.Array] = None) -> jax.Array:
    """Pre-LN layer with optional cross-attention (modules.py:257-286)."""
    rngs = jax.random.split(rng, 6) if rng is not None else [None] * 6

    z = layer_norm(x, params["ln_self"]["w"], params["ln_self"]["b"])
    a = mha(params["attn"], z, z, bias, num_heads, dropout, rngs[0])
    x = x + _dropout(a, dropout, rngs[1])

    if src is not None:
        z = layer_norm(x, params["ln_src"]["w"], params["ln_src"]["b"])
        # K/V come from the RAW src (reference does not normalize src)
        c = mha(params["attn_cross"], z, src, bias, num_heads, dropout,
                rngs[2])
        x = x + _dropout(c, dropout, rngs[3])

    h = layer_norm(x, params["ln_ffn"]["w"], params["ln_ffn"]["b"])
    f = ffn(params["ffn"], h, dropout, rngs[4])
    return x + _dropout(f, dropout, rngs[5])


def gpt_forward(params: Params, x: jax.Array, num_heads: int,
                context_limit: int = -1, dropout: float = 0.0,
                rng: Optional[jax.Array] = None) -> jax.Array:
    """Channel-wise GPT: N self-attention layers (modules.py:303-372)."""
    T = x.shape[1]
    bias = alibi_bias(T, num_heads, context_limit, x.dtype)
    for i, layer in enumerate(params["layers"]):
        sub = jax.random.fold_in(rng, i) if rng is not None else None
        x = transformer_layer(layer, x, bias, num_heads, dropout=dropout,
                              rng=sub)
    return x


def combinator(params: Params, x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Merge ego-centric towers (modules.py:449-464)."""
    ha = gelu(layer_norm(linear(x1, params["h0_a"]),
                         params["ln"]["w"], params["ln"]["b"]))
    hb = gelu(layer_norm(linear(x2, params["h0_b"]),
                         params["ln"]["w"], params["ln"]["b"]))
    return ha + hb


def gpt_stereo_forward(params: Params, x1: jax.Array, x2: jax.Array,
                       num_heads: int, context_limit: int = -1,
                       dropout: float = 0.0,
                       rng: Optional[jax.Array] = None):
    """Cross-channel GPT (modules.py:375-423).

    Returns (combined, x1, x2).
    """
    T = x1.shape[1]
    bias = alibi_bias(T, num_heads, context_limit, x1.dtype)
    for i, layer in enumerate(params["layers"]):
        r1 = jax.random.fold_in(rng, 2 * i) if rng is not None else None
        r2 = jax.random.fold_in(rng, 2 * i + 1) if rng is not None else None
        # both towers consume the PRE-update opposite stream
        n1 = transformer_layer(layer, x1, bias, num_heads, src=x2,
                               dropout=dropout, rng=r1)
        n2 = transformer_layer(layer, x2, bias, num_heads, src=x1,
                               dropout=dropout, rng=r2)
        x1, x2 = n1, n2
    x = combinator(params["combinator"], x1, x2)
    return x, x1, x2


# ----------------------------------------------------------------------------
# init
# ----------------------------------------------------------------------------

def _init_linear(rng, out_dim, in_dim, std=0.02, dtype=jnp.float32):
    """GPT init: normal(0, 0.02) (modules.py:347-354)."""
    return jax.random.normal(rng, (out_dim, in_dim), dtype) * std


def init_transformer_layer_params(rng: jax.Array, dim: int, ffn_dim: int,
                                  cross: bool, dtype=jnp.float32) -> Params:
    ks = jax.random.split(rng, 8)
    ln = lambda: {"w": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)}
    attn = lambda k: {
        "q": _init_linear(jax.random.fold_in(k, 0), dim, dim, dtype=dtype),
        "k": _init_linear(jax.random.fold_in(k, 1), dim, dim, dtype=dtype),
        "v": _init_linear(jax.random.fold_in(k, 2), dim, dim, dtype=dtype),
        "proj": _init_linear(jax.random.fold_in(k, 3), dim, dim, dtype=dtype),
    }
    p: Params = {
        "ln_self": ln(),
        "attn": attn(ks[0]),
        "ln_ffn": ln(),
        "ffn": {"w1": _init_linear(ks[1], ffn_dim, dim, dtype=dtype),
                "w2": _init_linear(ks[2], dim, ffn_dim, dtype=dtype)},
    }
    if cross:
        p["ln_src"] = ln()
        p["attn_cross"] = attn(ks[3])
    return p


def init_gpt_params(rng: jax.Array, dim: int, ffn_dim: int, num_layers: int,
                    cross: bool = False, with_combinator: bool = False,
                    dtype=jnp.float32) -> Params:
    ks = jax.random.split(rng, num_layers + 1)
    p: Params = {
        "layers": [
            init_transformer_layer_params(ks[i], dim, ffn_dim, cross, dtype)
            for i in range(num_layers)
        ]
    }
    if with_combinator:
        kc = ks[-1]
        p["combinator"] = {
            "h0_a": _init_linear(jax.random.fold_in(kc, 0), dim, dim,
                                 dtype=dtype),
            "h0_b": _init_linear(jax.random.fold_in(kc, 1), dim, dim,
                                 dtype=dtype),
            "ln": {"w": jnp.ones((dim,), dtype),
                   "b": jnp.zeros((dim,), dtype)},
        }
    return p
