"""FOA spatial augmentation (audio-channel-swap family, "ACS").

A training-time augmentation the reference does not have: the 16
label-exact rigid transforms of an FOA scene — azimuth rotations by
multiples of 90 deg, azimuth reflection, elevation flip (Mazzon et al.
2019's first-order-ambisonics spatial augmentation). Each transform is
simultaneously:

  * a SIGNED PERMUTATION of the FOA channels (W invariant; Z flips with
    elevation; X/Y rotate/reflect) — which on the "mel_iv" feature set
    reduces to a permutation of the log-mel planes (magnitudes ignore
    signs; 90/270-deg rotations swap the X and Y mels) plus a signed
    permutation of the three intensity-vector channels;
  * an EXACT permutation of the 18x36 label grid (10-deg cells: +90 deg
    is exactly 9 azimuth columns; reflections map cell centers to cell
    centers).

Validity: the transform set is only label-coherent for feature sets that
carry SIGNED direction information (the intensity vectors). Plain "mel"
magnitudes cannot distinguish a scene from its reflection or its
180-deg rotation — augmenting labels there would attach different
targets to identical features — and GCC-PHAT changes sign under channel
sign flips in a pair-dependent way; both are rejected at wiring time
(trainer). Everything runs inside the jitted train step: per-sample
transform draw, one channel gather + sign multiply, one grid gather.

Exactness contract (tests/test_acs.py): transforming the AUDIO channels
and then extracting features equals extracting features and then
applying the feature-side transform, bit-for-bit; and the feature-side
IV rotation agrees with the label-side angle transform for every cell.
"""

from __future__ import annotations

import functools

import numpy as np

from seld_tpu.grid import cell_centers, polar_to_grid

N_TRANSFORMS = 16

# FOA ACN channel order (STARSS22): W, Y, Z, X.
_W, _Y, _Z, _X = 0, 1, 2, 3


def transform_params(t: int) -> tuple[int, int, int]:
    """t in [0, 16) -> (k, s_az, s_el): azimuth rotation by 90k deg after
    an optional azimuth reflection (s_az=-1: az -> -az), and an optional
    elevation flip (s_el=-1). t=0 is the identity."""
    k = t & 3
    s_az = -1 if t & 4 else 1
    s_el = -1 if t & 8 else 1
    return k, s_az, s_el


def transform_angles(az_deg, el_deg, t: int):
    """Apply transform t to (azimuth, elevation) degrees (arrays ok);
    azimuth wraps to [-180, 180)."""
    k, s_az, s_el = transform_params(t)
    az = np.asarray(az_deg, np.float64) * s_az + 90.0 * k
    az = (az + 180.0) % 360.0 - 180.0
    return az, np.asarray(el_deg, np.float64) * s_el


def _rot_xy(k: int):
    """(x', y') = R_k (x, y) for a 90k-degree rotation, as an exact
    signed permutation: returns ((src_x, sign_x), (src_y, sign_y)) with
    src in {0: x, 1: y}."""
    return [
        ((0, 1), (1, 1)),     # 0 deg:   x,  y
        ((1, -1), (0, 1)),    # 90 deg: -y,  x
        ((0, -1), (1, -1)),   # 180:    -x, -y
        ((1, 1), (0, -1)),    # 270:     y, -x
    ][k]


def audio_channel_transform(t: int) -> tuple[np.ndarray, np.ndarray]:
    """(perm, sign) over the 4 ACN channels: transformed audio channel c
    equals sign[c] * audio[perm[c]]."""
    k, s_az, s_el = transform_params(t)
    (sx, gx), (sy, gy) = _rot_xy(k)
    # pre-reflection: y -> s_az * y; then rotate. Source component values:
    comp = {0: (_X, 1), 1: (_Y, s_az)}  # x comes from X; y from s_az*Y
    px, fx = comp[sx]
    py, fy = comp[sy]
    perm = np.zeros(4, np.int64)
    sign = np.zeros(4, np.float32)
    perm[_W], sign[_W] = _W, 1.0
    perm[_Z], sign[_Z] = _Z, float(s_el)
    perm[_X], sign[_X] = px, float(gx * fx)
    perm[_Y], sign[_Y] = py, float(gy * fy)
    return perm, sign


@functools.lru_cache(maxsize=8)
def acs_tables(n_el: int, n_az: int, feature_set: str = "mel_iv"):
    """Per-transform static tables.

    Returns (cell_gather (16, G) int32, ch_perm (16, C) int32,
    ch_sign (16, C) float32) with C = 7 for "mel_iv":
      augmented_mask[..., c] = mask[..., cell_gather[t, c]]
      augmented_feat[..., c, :] = ch_sign[t, c] * feat[..., ch_perm[t, c], :]
    """
    if feature_set != "mel_iv":
        raise ValueError(
            "ACS augmentation requires signed spatial features "
            f"(feature_set='mel_iv'); got {feature_set!r} — plain mel "
            "magnitudes cannot distinguish reflections/180-deg rotations "
            "and GCC-PHAT is not sign-permutation-equivariant"
        )
    g = n_el * n_az
    el_c, az_c = cell_centers(n_el, n_az)
    el_grid = np.repeat(el_c, n_az)
    az_grid = np.tile(az_c, n_el)

    cell_gather = np.zeros((N_TRANSFORMS, g), np.int32)
    ch_perm = np.zeros((N_TRANSFORMS, 7), np.int32)
    ch_sign = np.zeros((N_TRANSFORMS, 7), np.float32)
    for t in range(N_TRANSFORMS):
        az2, el2 = transform_angles(az_grid, el_grid, t)
        i2, j2 = polar_to_grid(az2, el2, n_el, n_az)
        fwd = (np.asarray(i2, np.int64) * n_az + np.asarray(j2, np.int64))
        if len(np.unique(fwd)) != g:
            raise ValueError(
                f"ACS transform {t} is not a bijection on the "
                f"{n_el}x{n_az} grid — 90-deg rotations need the azimuth "
                "cell width to divide 90 (e.g. n_az=36) and reflections "
                "need symmetric cell centers"
            )
        inv = np.empty(g, np.int64)
        inv[fwd] = np.arange(g)  # new cell c holds old cell inv[c]
        cell_gather[t] = inv

        perm, sign = audio_channel_transform(t)
        # mel planes: |.| kills signs; ACN-ordered mel channels permute
        ch_perm[t, :4] = perm
        ch_sign[t, :4] = 1.0
        # IV channels (X, Y, Z at indices 4, 5, 6): the intensity vector
        # transforms like the direction, i.e. with the same signed perm
        # expressed in (X, Y, Z) component order
        acn_to_iv = {_X: 4, _Y: 5, _Z: 6}
        for acn_dst, iv_dst in acn_to_iv.items():
            ch_perm[t, iv_dst] = acn_to_iv[int(perm[acn_dst])]
            ch_sign[t, iv_dst] = sign[acn_dst]
    return cell_gather, ch_perm, ch_sign


def vector_tables(feature_set: str = "mel_iv"):
    """(perm (16, 3), sign (16, 3)) signed permutation of (x, y, z) DOA
    vectors per transform — the same rotation the IV channels get."""
    _, ch_perm, ch_sign = acs_tables(18, 36, feature_set)  # tables are
    # grid-size independent for the channel part; 18x36 keys the cache
    return ch_perm[:, 4:7] - 4, ch_sign[:, 4:7]


def make_acs_augment_accdoa(feature_set: str = "mel_iv",
                            multi: bool = False):
    """ACS hook for ACCDOA-family targets:
    (rng, feats, targets) -> (feats, targets), with targets
    (B, T, C, 3) single-ACCDOA xyz vectors or (B, T, 6, 4, C) ADPIT
    slots ([activity, x, y, z] on axis -2). The features transform
    exactly as in make_acs_augment; the target vectors rotate with the
    same signed permutation."""
    import jax
    import jax.numpy as jnp

    _, ch_perm, ch_sign = acs_tables(18, 36, feature_set)
    vperm, vsign = vector_tables(feature_set)
    cp = jnp.asarray(ch_perm)
    cs = jnp.asarray(ch_sign)
    if multi:  # prepend the untouched activity channel
        vperm = np.concatenate([np.zeros((N_TRANSFORMS, 1), vperm.dtype),
                                vperm + 1], axis=1)
        vsign = np.concatenate([np.ones((N_TRANSFORMS, 1), vsign.dtype),
                                vsign], axis=1)
    vp = jnp.asarray(vperm)
    vs = jnp.asarray(vsign)

    def augment(rng, feats, targets):
        b = feats.shape[0]
        t = jax.random.randint(rng, (b,), 0, N_TRANSFORMS)
        feats = jnp.take_along_axis(
            feats, cp[t][:, None, :, None], axis=2
        ) * cs[t][:, None, :, None]
        if multi:  # (B, T, 6, 4, C): permute/sign axis 3
            targets = jnp.take_along_axis(
                targets, vp[t][:, None, None, :, None], axis=3
            ) * vs[t][:, None, None, :, None]
        else:  # (B, T, C, 3): permute/sign the last axis
            targets = jnp.take_along_axis(
                targets, vp[t][:, None, None, :], axis=3
            ) * vs[t][:, None, None, :]
        return feats, targets

    return augment


def make_acs_augment(n_el: int, n_az: int, feature_set: str = "mel_iv"):
    """Build the jit-friendly per-sample hook:
    (rng, feats (B,T,C,F), mask (B,T,G)) -> (feats, mask)."""
    import jax
    import jax.numpy as jnp

    cell_gather, ch_perm, ch_sign = acs_tables(n_el, n_az, feature_set)
    cg = jnp.asarray(cell_gather)
    cp = jnp.asarray(ch_perm)
    cs = jnp.asarray(ch_sign)

    def augment(rng, feats, mask):
        b = feats.shape[0]
        t = jax.random.randint(rng, (b,), 0, N_TRANSFORMS)
        perm_b = cp[t]  # (B, C)
        sign_b = cs[t]
        feats = jnp.take_along_axis(
            feats, perm_b[:, None, :, None], axis=2
        ) * sign_b[:, None, :, None]
        mask = jnp.take_along_axis(mask, cg[t][:, None, :], axis=2)
        return feats, mask

    return augment
