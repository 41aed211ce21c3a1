"""SpecAug on log-mel features — static-shape, jit-safe.

Reference: `espnet2/asr/specaug/specaug.py` (time warp + freq/time masks)
applied to the Whisper log-mel (`whisper_encoder.py:235-236`).

Deviations from the reference, both deliberate:
  * the reference feeds SpecAug a (B, n_mels, T) tensor while the masks are
    written for (B, Time, Freq) — so its "time" masks land on the mel axis
    and "freq" masks on the time axis. We apply masks to the axes their
    names claim (time=frames, freq=mel bins) on our (B, T, n_mels) layout.
  * time warp uses a piecewise-LINEAR index remap (gather) instead of
    torch's dynamic-size bicubic interpolate — bicubic needs dynamic
    output shapes, which would force a recompile per random draw under
    jit. Same regularization effect, fully static shapes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SpecAugConfig:
    apply_time_warp: bool = True
    time_warp_window: int = 5
    apply_freq_mask: bool = True
    freq_mask_width_range: tuple[int, int] = (0, 30)
    num_freq_mask: int = 2
    apply_time_mask: bool = True
    time_mask_width_range: tuple[int, int] = (0, 40)
    num_time_mask: int = 2

    @classmethod
    def from_dict(cls, d: dict | None) -> "SpecAugConfig":
        if not d:
            return cls()
        d = dict(d)
        d.pop("time_warp_mode", None)  # always linear-index warp here
        for k in ("freq_mask_width_range", "time_mask_width_range"):
            if k in d:
                d[k] = tuple(d[k])
        return cls(**d)


def _mask_along_axis(
    rng: jax.Array,
    spec: jax.Array,
    axis: int,
    width_range: tuple[int, int],
    num_mask: int,
) -> jax.Array:
    """Zero `num_mask` random spans along `axis`, per batch element
    (mask_along_axis.py:8-66 semantics: width ~ U[lo, hi), pos ~ U[0, D-hi))."""
    b = spec.shape[0]
    d = spec.shape[axis]
    k1, k2 = jax.random.split(rng)
    widths = jax.random.randint(k1, (b, num_mask, 1), width_range[0], max(width_range[1], 1))
    max_pos = max(1, d - width_range[1])
    starts = jax.random.randint(k2, (b, num_mask, 1), 0, max_pos)
    aran = jnp.arange(d)[None, None, :]
    mask = jnp.any((starts <= aran) & (aran < starts + widths), axis=1)  # (B, D)
    shape = [b, 1, 1]
    shape[axis] = d
    return spec * (~mask).astype(spec.dtype).reshape(shape)


def _time_warp(rng: jax.Array, spec: jax.Array, window: int) -> jax.Array:
    """Piecewise-linear time warp per utterance (time_warp.py:9-46 intent):
    a random center c ∈ [w, T-w) maps to c' ∈ [c-w, c+w]; indices are
    linearly remapped on [0,c]→[0,c'] and [c,T]→[c',T], then gathered with
    linear interpolation. Output length is T (static)."""
    b, t, f = spec.shape
    if t - window <= window:
        return spec
    k1, k2 = jax.random.split(rng)
    center = jax.random.randint(k1, (b,), window, t - window).astype(jnp.float32)
    warped = center + jax.random.randint(k2, (b,), -window, window).astype(jnp.float32) + 1.0

    out_pos = jnp.arange(t, dtype=jnp.float32)[None, :]  # (1, T)
    c, w = center[:, None], warped[:, None]
    src = jnp.where(
        out_pos < w,
        out_pos * c / jnp.maximum(w, 1.0),
        c + (out_pos - w) * (t - 1 - c) / jnp.maximum(t - 1 - w, 1.0),
    )
    src = jnp.clip(src, 0.0, t - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    frac = (src - lo.astype(jnp.float32))[..., None]

    batch_idx = jnp.arange(b)[:, None]
    g_lo = spec[batch_idx, lo]  # (B, T, F)
    g_hi = spec[batch_idx, hi]
    return (g_lo * (1.0 - frac) + g_hi * frac).astype(spec.dtype)


def specaug(
    rng: jax.Array,
    spec: jax.Array,
    config: SpecAugConfig = SpecAugConfig(),
) -> jax.Array:
    """Apply SpecAug to (B, T, n_mels) features."""
    k_warp, k_freq, k_time = jax.random.split(rng, 3)
    if config.apply_time_warp:
        spec = _time_warp(k_warp, spec, config.time_warp_window)
    if config.apply_freq_mask:
        spec = _mask_along_axis(
            k_freq, spec, axis=2,
            width_range=config.freq_mask_width_range,
            num_mask=config.num_freq_mask,
        )
    if config.apply_time_mask:
        spec = _mask_along_axis(
            k_time, spec, axis=1,
            width_range=config.time_mask_width_range,
            num_mask=config.num_time_mask,
        )
    return spec
