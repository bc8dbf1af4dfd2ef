"""Discrete VA-projection objective — codebook, labels, probability heads.

Behavioural contract from the reference (rvap/vap_main/objective.py):

- 256-class codebook: class index i maps to an 8-bit binary state, bits
  LSB-first; reshaped (2 speakers, 4 future bins) with speaker c / bin b
  at bit position ``4*c + b`` (objective.py:93-110, 141-143).
- `probs_next_speaker_aggregate`: decode all states, per-speaker sum of
  the selected bin range, weight by class probs, normalize with +1e-5
  (objective.py:186-206).  p_now = bins 0-1, p_future = bins 2-3
  (vap_main.py:187-188).
- labels: shift VAD one frame, window the next `horizon` frames, per-bin
  mean activity >= 0.5 -> binary, encode to the nearest code — for exact
  binaries that is the weighted bit sum (objective.py:40-76, 112-139).
- losses: CE over classes, BCE-with-logits for per-channel VAD
  (objective.py:222-275).

TPU-first design delta: the codebook decode of all 256 states is folded
into a constant (256, 2) bin-sum matrix at trace time, so the aggregation
is a single (B, T, 256) x (256, 2) matmul (SURVEY.md §7.1 item 4e).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def codebook_states(n_bins: int = 4) -> np.ndarray:
    """(n_classes, 2, n_bins) binary states; bit (4c+b) LSB-first."""
    n_classes = 2 ** (2 * n_bins)
    idx = np.arange(n_classes, dtype=np.int64)
    bits = (idx[:, None] >> np.arange(2 * n_bins)[None, :]) & 1
    return bits.reshape(n_classes, 2, n_bins).astype(np.float32)


@functools.lru_cache(maxsize=None)
def bin_sum_matrix(from_bin: int, to_bin: int, n_bins: int = 4) -> np.ndarray:
    """(n_classes, 2): per-speaker activity summed over bins [from, to]."""
    states = codebook_states(n_bins)
    return states[:, :, from_bin:to_bin + 1].sum(-1)


def probs_next_speaker_aggregate(probs: jax.Array, from_bin: int,
                                 to_bin: int, n_bins: int = 4) -> jax.Array:
    """probs: (..., n_classes) -> (..., 2) normalized next-speaker probs."""
    abp = jnp.asarray(bin_sum_matrix(from_bin, to_bin, n_bins), probs.dtype)
    p = jnp.matmul(probs, abp)
    return p / (jnp.sum(p, axis=-1, keepdims=True) + 1e-5)


def p_now(probs: jax.Array, n_bins: int = 4) -> jax.Array:
    return probs_next_speaker_aggregate(probs, 0, 1, n_bins)


def p_future(probs: jax.Array, n_bins: int = 4) -> jax.Array:
    return probs_next_speaker_aggregate(probs, 2, 3, n_bins)


# ----------------------------------------------------------------------------
# Labels
# ----------------------------------------------------------------------------

def projection_windows(va: jax.Array, bin_frames: Sequence[int],
                       threshold: float = 0.5) -> jax.Array:
    """VAD (B, N, 2) -> binary projection bins (B, N - horizon, 2, n_bins).

    Matches ProjectionWindow.__call__ (objective.py:40-76): shift one frame
    into the future, then for each frame average activity inside each bin
    span and threshold at `threshold`.
    """
    horizon = int(sum(bin_frames))
    v = va[:, 1:, :]                                   # future shift
    T = v.shape[1] - horizon + 1                       # valid frames
    outs = []
    start = 0
    for bf in bin_frames:
        # mean activity of frames [start, start+bf) relative to each window
        # computed for all windows at once via a cumulative sum
        cs = jnp.cumsum(v, axis=1)
        cs = jnp.concatenate([jnp.zeros_like(cs[:, :1]), cs], axis=1)
        seg = (cs[:, start + bf:start + bf + T] - cs[:, start:start + T]) / bf
        outs.append((seg >= threshold).astype(va.dtype))
        start += bf
    return jnp.stack(outs, axis=-1)                    # (B, T, 2, n_bins)


def encode_codebook(bins: jax.Array) -> jax.Array:
    """Binary (., 2, n_bins) -> class index; bit weight 2^(4c+b)."""
    n_bins = bins.shape[-1]
    weights = (2.0 ** np.arange(2 * n_bins)).reshape(2, n_bins)
    idx = jnp.sum(bins * jnp.asarray(weights, bins.dtype), axis=(-2, -1))
    return idx.astype(jnp.int32)


def get_labels(va: jax.Array, bin_frames: Sequence[int],
               threshold: float = 0.5) -> jax.Array:
    """VAD (B, N, 2) -> class labels (B, N - horizon) (objective.py:211-214)."""
    return encode_codebook(projection_windows(va, bin_frames, threshold))


# ----------------------------------------------------------------------------
# Losses
# ----------------------------------------------------------------------------

def loss_vap(logits: jax.Array, labels: jax.Array,
             reduction: str = "mean") -> jax.Array:
    """Cross-entropy over the 256 classes (objective.py:222-245).

    logits: (B, T', n_classes); labels: (B, T).  Extra frames on EITHER
    side are dropped (the reference drops extra logits, objective.py:232-234,
    but its own 50 Hz training arithmetic can also leave labels one frame
    longer than logits — 999 encoder frames vs 1000 label windows — so we
    truncate both to the common length).
    """
    nmax = min(labels.shape[1], logits.shape[1])
    logits = logits[:, :nmax]
    labels = labels[:, :nmax]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if reduction == "mean":
        return jnp.mean(nll)
    return nll


def loss_vad(vad_logits: jax.Array, vad: jax.Array) -> jax.Array:
    """BCE-with-logits; logits truncated to the label length
    (objective.py:273-275)."""
    n = vad_logits.shape[-2]
    vad = vad[:, :n]
    return jnp.mean(
        jnp.maximum(vad_logits, 0) - vad_logits * vad
        + jnp.log1p(jnp.exp(-jnp.abs(vad_logits))))


def get_labels_bc(bc_frame: jax.Array, frame_hz: int,
                  shift_sec: float = 0.5,
                  append_sec: float = 2.0) -> jax.Array:
    """Backchannel labels: shift the per-frame bc-activity track
    `shift_sec` into the future (the model predicts a bc happening 0.5 s
    ahead), truncated to N - append frames; the last `shift` outputs have
    no future signal and stay 0 (rvap/vap_bc/objective.py:216-236 — the
    nod variant is byte-identical).

    bc_frame: (B, N) -> (B, N - append_sec*frame_hz).
    """
    shift = int(shift_sec * frame_hz)
    append = int(append_sec * frame_hz)
    body = bc_frame[:, shift:bc_frame.shape[1] - append]
    tail = jnp.zeros((bc_frame.shape[0], shift), bc_frame.dtype)
    return jnp.concatenate([body, tail], axis=1)


def loss_bc(bc_logits: jax.Array, bc_labels: jax.Array,
            pos_weight: float = 1.0) -> jax.Array:
    """BCE-with-logits with a positive-class weight
    (rvap/vap_bc/objective.py:295-296, torch `pos_weight` semantics:
    ``-(pw*y*log σ(x) + (1-y)*log(1-σ(x)))``, mean-reduced)."""
    nmax = min(bc_logits.shape[-1], bc_labels.shape[-1])
    x = bc_logits[..., :nmax]
    y = bc_labels[..., :nmax]
    return -jnp.mean(pos_weight * y * jax.nn.log_sigmoid(x)
                     + (1.0 - y) * jax.nn.log_sigmoid(-x))


def loss_vad_mono(vad_logits: jax.Array, vad: jax.Array) -> jax.Array:
    """Mono-channel VAD BCE: squeezed logits vs channel-1 (the user
    channel) VAD (rvap/vap_bc/objective.py:302-308)."""
    n = vad_logits.shape[-2]
    return loss_bc(jnp.squeeze(vad_logits, axis=-1), vad[:, :n, 1])


# loss_lid is token-for-token the same CE as loss_vap in the reference
# (rvap/vap_bc/objective.py:269-291); alias rather than duplicate.
loss_lid = loss_vap


def bin_times_to_frames(bin_times: Sequence[float],
                        frame_hz: int) -> List[int]:
    return [int(t * frame_hz) for t in bin_times]
