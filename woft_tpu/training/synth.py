"""Synthetic homography pair generation (device-side, vmapped).

The reference trains its weight head on COCO images warped by random
homographies (``COCOHSynth``, referenced-but-absent upstream,
ref:pytracking/optical_flow/training_configs/v2_SNOB_large_g05.py:8,36-50).
This module regenerates that capability as pure JAX: given any batch of
source images, sample a random perspective warp per image, render the warped
view with the cv2-parity ``warp_perspective``, and photometric-jitter both
sides. Everything stays on device and under jit; any image corpus (COCO,
video frames, noise) can feed it.
"""

import jax
import jax.numpy as jnp

from ..ops.warp import warp_perspective


def random_homography(key, height, width, *, max_corner_shift=0.2,
                      max_translation=0.1):
    """Sample a random homography as a 4-corner perturbation.

    Corners of the image quad move by up to ``max_corner_shift`` of the
    image size plus a global translation; the exact DLT through the 4 corner
    correspondences is the homography (standard COCO-synth recipe).
    Returns (3, 3) mapping source pixels -> warped pixels."""
    from ..geometry.homography import find_homography_wls_qr

    k1, k2 = jax.random.split(key)
    corners = jnp.array([[0.0, 0.0], [width - 1.0, 0.0],
                         [width - 1.0, height - 1.0], [0.0, height - 1.0]])
    shift = (jax.random.uniform(k1, (4, 2), minval=-1.0, maxval=1.0)
             * jnp.array([width, height]) * max_corner_shift)
    translation = (jax.random.uniform(k2, (1, 2), minval=-1.0, maxval=1.0)
                   * jnp.array([width, height]) * max_translation)
    warped = corners + shift + translation
    H = find_homography_wls_qr(corners[None], warped[None])[0]
    return H


def _photometric(key, img):
    """Brightness/contrast jitter + gaussian noise, clipped to [0, 255]."""
    k1, k2, k3 = jax.random.split(key, 3)
    gain = jax.random.uniform(k1, (), minval=0.8, maxval=1.2)
    bias = jax.random.uniform(k2, (), minval=-20.0, maxval=20.0)
    noise = 3.0 * jax.random.normal(k3, img.shape)
    return jnp.clip(img * gain + bias + noise, 0.0, 255.0)


def synth_homography_batch(key, images, *, max_corner_shift=0.2,
                           max_translation=0.1, jitter=True):
    """Make training pairs from a batch of images.

    Args:
        key: PRNG key.
        images: (B, H, W, 3) float RGB in [0, 255].
    Returns:
        dict(img1 (B,H,W,3), img2 (B,H,W,3), h_gt (B,3,3)) where
        ``h_gt`` maps img1 pixels -> img2 pixels.
    """
    B, H, W, _ = images.shape
    keys = jax.random.split(key, B * 3).reshape(B, 3, 2)

    hs = jax.vmap(lambda k: random_homography(
        k, H, W, max_corner_shift=max_corner_shift,
        max_translation=max_translation))(keys[:, 0])
    img2 = warp_perspective(images, hs)
    if jitter:
        img1 = jax.vmap(_photometric)(keys[:, 1], images)
        img2 = jax.vmap(_photometric)(keys[:, 2], img2)
    else:
        img1 = images
    return {"img1": img1, "img2": img2, "h_gt": hs}
