"""Fold trunk BatchNorms into the preceding convolutions (inference only).

At inference every BatchNorm in the ResNet trunk (the only BNs in the
network — reference network/fpn.py:9-42 pairs each with a bias-free conv)
is a fixed per-channel affine

    y = gamma * (x - mean) / sqrt(var + eps) + beta.

Because the paired conv has no bias, the affine folds exactly into the
conv weights:

    w' = w * s           (s = gamma / sqrt(var + eps), over output chans)
    b' = beta - mean * s

`fold_bn_variables` rewrites a trained variables tree into the shape the
`fold_bn=True` model graph (models/fpn.py) expects: each paired conv
gains a `bias`, every trunk BN (params scale/bias + batch_stats
mean/var) disappears.  Measured perf-NEUTRAL on v5e (0.999-1.004x,
tools/bench_fold_bn.py — XLA already fuses the inference BN affine);
kept for deployment value: a single params-only collection, ~4% fewer
leaves, a simpler exported graph.  docs/PERF.md round-3 section.

Numerics: folding is done in float64 and stored at the params' dtype
(float32), so the only deviation from the unfolded graph is float
reassociation — bounded by tests/test_fold_bn.py and OFF by default
(cfg.model.fold_bn); the reference-parity suites always run unfolded.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

# conv -> BN pairings inside one module dict. Covers the ResNetFPN stem
# (conv1/bn1 at the fpn level) and every Bottleneck (conv1..3/bn1..3 +
# the downsample pair); these are the only BatchNorms in the network.
_PAIRS = (
    ("conv1", "bn1"),
    ("conv2", "bn2"),
    ("conv3", "bn3"),
    ("downsample_conv", "downsample_bn"),
)

_EPS = 1e-5  # matches nn.BatchNorm(epsilon=1e-5) in models/fpn.py


def _fold_one(conv: Dict[str, Any], bn_params: Dict[str, Any],
              bn_stats: Dict[str, Any]) -> Dict[str, Any]:
    kernel = np.asarray(conv["kernel"], np.float64)  # HWIO
    gamma = np.asarray(bn_params["scale"], np.float64)
    beta = np.asarray(bn_params["bias"], np.float64)
    mean = np.asarray(bn_stats["mean"], np.float64)
    var = np.asarray(bn_stats["var"], np.float64)
    s = gamma / np.sqrt(var + _EPS)
    if set(conv) - {"kernel"}:
        raise ValueError(f"paired conv already has params {set(conv)}")
    out_dtype = jnp.asarray(conv["kernel"]).dtype
    return {"kernel": jnp.asarray(kernel * s, out_dtype),
            "bias": jnp.asarray(beta - mean * s, out_dtype)}


def fold_bn_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Rewrite {'params', 'batch_stats'} for the fold_bn=True graph.

    Returns a new variables dict with only a 'params' collection: every
    (conv, bn) trunk pair folded, all other params passed through
    unchanged. Raises if a BN has no paired conv (a structure this
    network never produces).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def walk(p: Dict[str, Any], st: Dict[str, Any]) -> Dict[str, Any]:
        out = {}
        consumed = set()
        for conv_name, bn_name in _PAIRS:
            if bn_name in p:
                if conv_name not in p:
                    raise ValueError(f"BN '{bn_name}' has no paired conv")
                out[conv_name] = _fold_one(p[conv_name], p[bn_name],
                                           st[bn_name])
                consumed.update((conv_name, bn_name))
        for name, child in p.items():
            if name in consumed:
                continue
            if hasattr(child, "items"):  # dict or flax FrozenDict
                out[name] = walk(child, st.get(name, {}) if
                                 hasattr(st, "get") else {})
            else:
                out[name] = child
        return out

    return {"params": walk(params, stats)}
