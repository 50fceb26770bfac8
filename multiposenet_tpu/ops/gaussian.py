"""Separable gaussian blur on device — twin of scipy/skimage `gaussian`.

The reference blurs PRN input grids with skimage.filters.gaussian (which
wraps scipy.ndimage.gaussian_filter) per channel on the host, once per
detected person (reference evaluate/tester.py:396-398 with sigma=1 mode
'nearest'; datasets/coco_data/prn_data_pipeline.py:105-107 with sigma=2 mode
'constant').  Here it is one batched separable convolution on device.

Kernel matches scipy's: radius = int(truncate * sigma + 0.5), weights
exp(-0.5 (x/sigma)^2) normalized to sum 1 (truncate defaults to 4.0).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=16)
def gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


@functools.lru_cache(maxsize=16)
def blur_matrix(n: int, sigma: float = 1.0, mode: str = "nearest",
                truncate: float = 4.0) -> np.ndarray:
    """The 1-D gaussian blur as a dense (n, n) operator, edge handling baked
    in.  blur_matrix(n) @ x == gaussian_blur along that axis, EXACTLY (blur
    is linear; 'nearest' replication only changes the operator's edge rows).

    Utility for expressing the blur as matmuls.  Who uses which (measured,
    docs/PERF.md): the INFERENCE PRN stage builds grids with these matmuls
    (they beat the depthwise conv's edge-pad layout shuffles inside the
    batch-64 fused graph, engine/inference.py); the TRAIN step keeps the
    separable `gaussian_blur` conv (8.5-8.9 vs 10.6 ms/step at batch 256 —
    its marks are already dense conv-friendly activations,
    engine/train_steps.make_prn_steps).

    Returned array is read-only (lru_cache shares one instance).
    """
    k = gaussian_kernel1d(float(sigma), truncate)
    r = (len(k) - 1) // 2
    g = np.zeros((n, n), np.float32)
    for i in range(n):
        for t, kv in enumerate(k):
            j = i + t - r
            if mode == "nearest":
                j = min(max(j, 0), n - 1)
            elif not (0 <= j < n):
                continue
            g[i, j] += kv
    g.flags.writeable = False
    return g


def gaussian_blur(
    x: jnp.ndarray,
    sigma: float = 1.0,
    mode: str = "nearest",
    truncate: float = 4.0,
) -> jnp.ndarray:
    """Blur the trailing two-from-last spatial dims of (..., H, W, C).

    mode: 'nearest' (replicate edges, scipy default used by skimage.gaussian)
          or 'constant' (zero padding).
    """
    k = jnp.asarray(gaussian_kernel1d(float(sigma), truncate))
    r = (k.shape[0] - 1) // 2

    orig_shape = x.shape
    h, w, c = orig_shape[-3], orig_shape[-2], orig_shape[-1]
    xb = x.reshape((-1, h, w, c)).astype(jnp.float32)

    pad_mode = "edge" if mode == "nearest" else "constant"
    kh = k.reshape(-1, 1, 1, 1)  # (Kh, Kw=1, in/groups=1, out_mult=1)
    kw = k.reshape(1, -1, 1, 1)
    dn = ("NHWC", "HWIO", "NHWC")

    # scipy filters per axis sequentially, re-extending edges of the already
    # blurred result — pad/convolve H, then pad/convolve W.
    xb = jnp.pad(xb, ((0, 0), (r, r), (0, 0), (0, 0)), mode=pad_mode)
    xb = jax.lax.conv_general_dilated(
        xb, jnp.tile(kh, (1, 1, 1, c)), (1, 1), "VALID",
        dimension_numbers=jax.lax.conv_dimension_numbers(xb.shape, kh.shape, dn),
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST)
    xb = jnp.pad(xb, ((0, 0), (0, 0), (r, r), (0, 0)), mode=pad_mode)
    xb = jax.lax.conv_general_dilated(
        xb, jnp.tile(kw, (1, 1, 1, c)), (1, 1), "VALID",
        dimension_numbers=jax.lax.conv_dimension_numbers(xb.shape, kw.shape, dn),
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST)
    return xb.reshape(orig_shape)
