"""Image gradient operators, NHWC.

Parity: spherical/derivatives.py:7-24 (forward differences with replicate
padding) and util.py:415-451 (Sobel gradients).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def dI_du(img):
    """Horizontal forward difference, replicate-padded right."""
    padded = jnp.pad(img, ((0, 0), (0, 0), (0, 1), (0, 0)), mode="edge")
    return padded[:, :, :-1] - padded[:, :, 1:]


def dI_dv(img):
    """Vertical forward difference, replicate-padded bottom."""
    padded = jnp.pad(img, ((0, 0), (0, 1), (0, 0), (0, 0)), mode="edge")
    return padded[:, :-1] - padded[:, 1:]


def dI_duv(img):
    """Gradient magnitude over the (du, dv) pair per channel-stack."""
    duv = jnp.concatenate([dI_du(img), dI_dv(img)], axis=-1)
    return jnp.linalg.norm(duv, axis=-1, keepdims=True)


SOBEL_X = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], np.float32)
SOBEL_Y = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], np.float32)


def _conv3(img, kernel):
    k = jnp.asarray(kernel, img.dtype)[:, :, None, None]
    return jax.lax.conv_general_dilated(
        img,
        k,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def imgrad(img):
    """Sobel (grad_y, grad_x) of the channel-mean image (util.py:426-446).

    img: (B, H, W, C) -> two (B, H, W, 1) maps.
    """
    gray = jnp.mean(img, axis=-1, keepdims=True)
    return _conv3(gray, SOBEL_Y), _conv3(gray, SOBEL_X)


def imgrad_yx(img):
    """Stacked (grad_y, grad_x) (util.py:448-451): (B, H, W, 2)."""
    gy, gx = imgrad(img)
    return jnp.concatenate([gy, gx], axis=-1)


def get_sobel_kernel(k: int = 3) -> np.ndarray:
    """Generalized Sobel kernel (util.py:415-424)."""
    rng = np.linspace(-(k // 2), k // 2, k)
    x, y = np.meshgrid(rng, rng)
    denom = x**2 + y**2
    denom[:, k // 2] = 1.0
    return x / denom


def gaussian_kernel_1d(size: int, sigma: float) -> np.ndarray:
    ax = np.linspace(-(size - 1) / 2.0, (size - 1) / 2.0, size)
    return np.exp(-0.5 * np.square(ax) / np.square(sigma))


def gaussian_kernel_3d(size: int, sigma: float) -> np.ndarray:
    ax = np.linspace(-(size - 1) / 2.0, (size - 1) / 2.0, size)
    xx, yy, zz = np.meshgrid(ax, ax, ax)
    return np.exp(-0.5 * (xx**2 + yy**2 + zz**2) / np.square(sigma))
