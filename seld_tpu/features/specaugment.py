"""SpecAugment: on-device time/frequency masking of log-mel inputs.

A training-time augmentation the reference does not have (its only
augmentation is the Gaussian *label* augmentation,
ref smrl_seld_gaussian.py:397-535) — added as a north-star extra because
it is standard practice for SELD/SED models. Runs inside the jitted train
step (static shapes, pure `jax.random`), so it costs one elementwise
select on top of the input batch.

Per sample and per mask, classic SpecAugment semantics (Park et al. 2019):
width w ~ U{0..W}, start ~ U{0..size-w}; masked positions are filled with
the sample's PER-CHANNEL mean (zeroing a log-magnitude would inject
"loud silence", and spatial feature sets mix log-mel channels with
intensity-vector/GCC channels on entirely different scales — a global
mean would push out-of-distribution values into the spatial channels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_keep_mask(rng, batch: int, n_masks: int, max_width: int, size: int):
    """(batch, size) bool: True where the axis position is MASKED."""
    k_w, k_s = jax.random.split(rng)
    widths = jax.random.randint(k_w, (batch, n_masks, 1), 0, max_width + 1)
    # randint with a per-mask maxval array: exact uniform over {0..size-w},
    # unlike floor(uniform*range) whose float rounding can overshoot by one.
    starts = jax.random.randint(k_s, (batch, n_masks, 1), 0, size - widths + 1)
    pos = jnp.arange(size)[None, None, :]
    hit = (pos >= starts) & (pos < starts + widths)  # (B, n_masks, size)
    return jnp.any(hit, axis=1)


def spec_augment(
    rng,
    mel: jax.Array,  # (B, T, C, F) log-mel features
    time_masks: int,
    time_width: int,
    freq_masks: int,
    freq_width: int,
) -> jax.Array:
    """Apply SpecAugment; a no-op when both mask counts are zero.

    Masks span all channels (the spatial cues in FOA channels stay
    consistent: a masked frame is masked everywhere).
    """
    if time_masks <= 0 and freq_masks <= 0:
        return mel
    b, t, _, f = mel.shape
    fill = mel.mean(axis=(1, 3), keepdims=True)  # per sample, per channel
    masked = jnp.zeros((), jnp.bool_)
    k_t, k_f = jax.random.split(rng)
    if time_masks > 0:
        tm = _axis_keep_mask(k_t, b, time_masks, min(time_width, t), t)
        masked = masked | tm[:, :, None, None]
    if freq_masks > 0:
        fm = _axis_keep_mask(k_f, b, freq_masks, min(freq_width, f), f)
        masked = masked | fm[:, None, None, :]
    return jnp.where(masked, fill, mel)


def make_spec_augment(train_cfg):
    """Build an `(rng, mel) -> mel` hook from TrainConfig, or None when
    disabled (the hook plugs into make_train_step's input_augment)."""
    if train_cfg.specaugment_time_masks <= 0 and train_cfg.specaugment_freq_masks <= 0:
        return None

    def augment(rng, mel):
        return spec_augment(
            rng, mel,
            train_cfg.specaugment_time_masks,
            train_cfg.specaugment_time_width,
            train_cfg.specaugment_freq_masks,
            train_cfg.specaugment_freq_width,
        )

    return augment
