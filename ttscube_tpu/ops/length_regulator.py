"""Duration-based length regulation as pure gathers.

Replaces the reference's host-side Python loops (``cube/networks/modules.py:946-953``
builds frame2phone with a per-duration loop; ``:1043-1053`` builds numpy gather indices on
the host every training step). Here: durations → cumsum → searchsorted → take_along_axis,
with a static max-frame bound and a validity mask — no device→host sync, jit-safe.

Padding semantics match the reference: frames beyond the utterance repeat the last valid
phone's features (``_expand_i`` pads with ``alignments[ii][-1]``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def durations_to_frame2phone_np(durations: np.ndarray, num_valid_phones: np.ndarray,
                                max_frames: int):
    """Host (numpy) twin of `durations_to_frame2phone` for collates/tests — avoids any
    device compile for data-plane work."""
    ends = np.cumsum(durations, axis=1)
    frames = np.arange(max_frames)
    f2p = np.sum(frames[None, :, None] >= ends[:, None, :], axis=-1).astype(np.int32)
    total = ends[:, -1]
    last_valid = np.maximum(num_valid_phones - 1, 0)
    f2p = np.minimum(f2p, last_valid[:, None])
    mask = frames[None, :] < total[:, None]
    return f2p, mask


def durations_to_frame2phone(durations: jnp.ndarray, num_valid_phones: jnp.ndarray,
                             max_frames: int):
    """(B, N) int durations → (B, F) frame→phone indices + (B, F) validity mask.

    `num_valid_phones` (B,) masks padded phone positions (their durations must be 0 in the
    input — callers zero them via the phone mask).
    """
    ends = jnp.cumsum(durations, axis=1)  # (B, N)
    frames = jnp.arange(max_frames)
    # frame f belongs to phone p ⇔ ends[p−1] ≤ f < ends[p]; computed as a comparison-sum
    # (equivalent to searchsorted side='right' but a plain VPU reduction — XLA's
    # sort-based searchsorted lowering compiles poorly on TPU and is slower here).
    f2p = jnp.sum(frames[None, :, None] >= ends[:, None, :], axis=-1).astype(jnp.int32)
    total = ends[:, -1]  # total frames per row
    last_valid = jnp.maximum(num_valid_phones - 1, 0)
    f2p = jnp.minimum(f2p, last_valid[:, None])
    mask = frames[None, :] < total[:, None]
    return f2p, mask


def regulate_length(x: jnp.ndarray, frame2phone: jnp.ndarray) -> jnp.ndarray:
    """Gather phone-level features (B, N, C) to frame level (B, F, C)."""
    return jnp.take_along_axis(x, frame2phone[:, :, None], axis=1)


def expand_with_durations(x: jnp.ndarray, durations: jnp.ndarray,
                          num_valid_phones: jnp.ndarray, max_frames: int):
    """Convenience: durations → (frame-level features, frame2phone, mask)."""
    f2p, mask = durations_to_frame2phone(durations, num_valid_phones, max_frames)
    return regulate_length(x, f2p), f2p, mask
