"""Input padding policies for /8-divisible flow-network inputs.

TPU twins of the reference's padders — all shape arithmetic is static, so
every policy jit-compiles to fixed shapes:

- ``ReplicatePadder`` ~ RAFT's ``InputPadder`` ('sintel' centering)
  (ref:raft_core/utils/utils.py:7-26), padding mode 'RAFT'.
- ``NoPadder`` asserts /8 inputs (ref:optical_flow/raft.py:221-232).
- ``CropPadder`` crops bottom/right to /8 (ref:optical_flow/raft.py:235-247).
- ``ResizePadder`` bilinearly resizes to /8 and rescales flow values on unpad
  (the reference's 'Michal' policy, ref:optical_flow/raft.py:250-271).

All operate on NHWC arrays.
"""

import jax.numpy as jnp

from .warp import upsample2d_align_corners


class NoPadder:
    name = "nopad"

    def __init__(self, shape):
        H, W = shape[1], shape[2]
        assert H % 8 == 0, f"height {H} not divisible by 8"
        assert W % 8 == 0, f"width {W} not divisible by 8"

    def pad(self, *imgs):
        return imgs

    def unpad(self, x):
        return x


class CropPadder:
    name = "crop"

    def __init__(self, shape):
        H, W = shape[1], shape[2]
        self.crop_h = (H // 8) * 8
        self.crop_w = (W // 8) * 8

    def pad(self, *imgs):
        return tuple(img[:, :self.crop_h, :self.crop_w, :] for img in imgs)

    def unpad(self, x):
        return x


class ReplicatePadder:
    """Replicate-pad to /8; 'sintel' mode centers the padding."""

    name = "RAFT"

    def __init__(self, shape, mode="sintel"):
        H, W = shape[1], shape[2]
        pad_h = (((H // 8) + 1) * 8 - H) % 8
        pad_w = (((W // 8) + 1) * 8 - W) % 8
        if mode == "sintel":
            self._pad = (pad_w // 2, pad_w - pad_w // 2,
                         pad_h // 2, pad_h - pad_h // 2)
        else:
            self._pad = (pad_w // 2, pad_w - pad_w // 2, 0, pad_h)

    def pad(self, *imgs):
        left, right, top, bottom = self._pad
        cfg = ((0, 0), (top, bottom), (left, right), (0, 0))
        return tuple(jnp.pad(img, cfg, mode="edge") for img in imgs)

    def unpad(self, x):
        if x is None:
            return None
        left, right, top, bottom = self._pad
        H, W = x.shape[1], x.shape[2]
        return x[:, top:H - bottom, left:W - right, :]


class ResizePadder:
    """Bilinear-resize to /8 multiples; rescale flow on unpad."""

    name = "Michal"

    def __init__(self, shape):
        H, W = shape[1], shape[2]
        self.h_orig, self.w_orig = H, W
        self.h_new = ((H + 7) // 8) * 8
        self.w_new = ((W + 7) // 8) * 8

    def pad(self, *imgs):
        # torch F.interpolate default (align_corners=False) is half-pixel;
        # the reference resizes this way. jax.image.resize('linear') matches.
        import jax.image
        return tuple(
            jax.image.resize(img,
                             (img.shape[0], self.h_new, self.w_new,
                              img.shape[3]),
                             method="linear")
            for img in imgs)

    def unpad(self, x):
        if x is None:
            return None
        assert x.shape[1] == self.h_new and x.shape[2] == self.w_new
        import jax.image
        resized = jax.image.resize(
            x, (x.shape[0], self.h_orig, self.w_orig, x.shape[3]),
            method="linear")
        if x.shape[3] == 2:  # flow field: rescale displacement values
            scale = jnp.array([self.w_orig / self.w_new,
                               self.h_orig / self.h_new], dtype=x.dtype)
            resized = resized * scale
        return resized


_PADDERS = {
    "nopad": NoPadder,
    "crop": CropPadder,
    "RAFT": ReplicatePadder,
    "Michal": ResizePadder,
}


def make_padder(mode, shape):
    """Padding-policy factory keyed by the reference's config strings
    (ref:optical_flow/raft.py:122-131)."""
    try:
        return _PADDERS[mode](shape)
    except KeyError:
        raise ValueError(f"invalid padding_mode '{mode}'") from None
