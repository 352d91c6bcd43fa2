"""Post-analysis ops: temporal DFT and FFT denoise, as jittable JAX functions.

Productizes the reference's exploratory side-rail scripts (SURVEY.md §1):

* ``temporal_dft``  <- test_scripts/dft.py:1-48 (hand-rolled O(N^2) DFT of a
  4-sample pixel trace) — here a real FFT over the time axis of whole pixel
  planes, on device.
* ``fft_denoise``   <- test_scripts/image_denoise.py:5-52 (2-D FFT, centered
  square low-pass mask of radius 75, inverse FFT, magnitude).
* (heatmap accumulation lives inside the device steps themselves — used by the
  RGB-heatmap benchmark config (BASELINE.json configs[2]).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

DEFAULT_DENOISE_RADIUS = 75  # ref: image_denoise.py:22


@jax.jit
def temporal_dft(traces: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Real DFT over the leading (time) axis.

    Args: traces (N, ...) f32 — e.g. a pixel-intensity history or the
      per-frame statistics series.
    Returns: (magnitude (N//2+1, ...), phase (N//2+1, ...)).
    """
    f = jnp.fft.rfft(traces.astype(jnp.float32), axis=0)
    return jnp.abs(f), jnp.angle(f)


@functools.partial(jax.jit, static_argnums=(1,))
def fft_denoise(image: jnp.ndarray,
                radius: int = DEFAULT_DENOISE_RADIUS) -> jnp.ndarray:
    """Square low-pass FFT denoise of a grayscale image (H, W).

    Matches the reference recipe: fft2 -> fftshift -> keep the centered
    (2r x 2r) square -> ifft2 -> magnitude (image_denoise.py:13-30).
    """
    img = image.astype(jnp.float32)
    h, w = img.shape[-2], img.shape[-1]
    f = jnp.fft.fftshift(jnp.fft.fft2(img), axes=(-2, -1))
    # the reference's slice [c-r : c+r] keeps rows c-r .. c+r-1 (2r wide)
    dr = jnp.arange(h) - h // 2
    dc = jnp.arange(w) - w // 2
    rows = (dr >= -radius) & (dr < radius)
    cols = (dc >= -radius) & (dc < radius)
    mask = (rows[:, None] & cols[None, :]).astype(jnp.complex64)
    back = jnp.fft.ifft2(jnp.fft.ifftshift(f * mask, axes=(-2, -1)))
    return jnp.abs(back)


@jax.jit
def fft_magnitude_spectrum(image: jnp.ndarray) -> jnp.ndarray:
    """20*log(|fftshift(fft2(img))| + 1), the spectrum view the reference
    plots (image_denoise.py:16)."""
    f = jnp.fft.fftshift(jnp.fft.fft2(image.astype(jnp.float32)),
                         axes=(-2, -1))
    return 20.0 * jnp.log(jnp.abs(f) + 1.0)


@functools.partial(jax.jit, static_argnums=(1,))
def denoise_frames(frames_u8: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Batched FFT low-pass denoise of uint8 frames (N, H, W, C) -> uint8.

    The streaming-pipeline integration of :func:`fft_denoise` (BASELINE
    configs[4]: "4K streaming pipeline with ... denoise post-analysis").
    """
    f = frames_u8.astype(jnp.float32)
    planes = jnp.moveaxis(f, -1, 1)                        # (N, C, H, W)
    den = fft_denoise(planes, radius)  # operates on the last two axes
    den = jnp.moveaxis(den, 1, -1)
    return jnp.clip(jnp.rint(den), 0, 255).astype(jnp.uint8)
