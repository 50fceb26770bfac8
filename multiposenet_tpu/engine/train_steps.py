"""Jitted per-subnet train/val steps with data-parallel sharding.

The reference has one Python `Trainer._train_one_epoch` hot loop doing
zero_grad/backward/clip/step on dynamic graphs (reference
training/trainer.py:233-283).  Here each stage is a single donated, jitted,
mesh-sharded step function:

  keypoint stage : image + padded joints + stride-4 mask  ->  targets are
                   synthesized ON DEVICE (ops/heatmap.py) inside the step,
                   BatchNorm in training mode (reference trains BN in this
                   stage, trainer.py:172-174)
  detection stage: image + padded GT boxes, BN frozen (freeze_bn)
  prn stage      : sparse peak/label marks -> gaussian grids ON DEVICE

Parameter freezing (the reference's requires_grad loops,
multipose_*_train.py) is structural: `_apply_updates` skips frozen leaves at
the Python level (they pass through the update untouched, so XLA dead-code
-eliminates their backward entirely) and `optax.masked` keeps optimizer
state only for trainable leaves.  Learning rate arrives as a step argument
so the host-side plateau scheduler never triggers a recompile.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multiposenet_tpu.config import Config
from multiposenet_tpu.engine.inference import preprocess_on_device
from multiposenet_tpu.models.posenet import PoseNet
from multiposenet_tpu.ops.anchors import anchors_for_shape
from multiposenet_tpu.ops.gaussian import blur_matrix, gaussian_blur
from multiposenet_tpu.ops.heatmap import make_heatmaps
from multiposenet_tpu.ops.losses import detection_loss, keypoint_loss, prn_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


# ---------------------------------------------------------------------------
# stage-wise trainability (reference training/multipose_*_train.py:32-89)
# ---------------------------------------------------------------------------

FPN_RESNET = ("conv1", "bn1", "layer1", "layer2", "layer3", "layer4")
FPN_RETINA = ("conv6", "conv7", "latlayer1", "latlayer2", "latlayer3",
              "toplayer0", "toplayer1", "toplayer2")
FPN_KEYPOINT = ("toplayer", "flatlayer1", "flatlayer2", "flatlayer3",
                "smooth1", "smooth2", "smooth3")


def _fpn_group(name: str) -> str:
    if name in FPN_RETINA:
        return "fpn_retina"
    if name in FPN_KEYPOINT:
        return "fpn_keypoint"
    root = name.split("_")[0]
    if name in FPN_RESNET or root in FPN_RESNET:
        return "fpn_resnet"
    raise ValueError(f"unknown fpn submodule {name!r}")


def param_group(path: Tuple[str, ...]) -> str:
    """Map a param-tree path to a freeze group."""
    top = path[0]
    if top == "fpn":
        return _fpn_group(path[1])
    if top == "keypoint_head":
        return "keypoint"
    if top in ("regression_head", "classification_head"):
        return "retinanet"
    if top == "prn":
        return "prn"
    raise ValueError(f"unknown top-level module {top!r}")


TRAINABLE_GROUPS = {
    # multipose_keypoint_train.py:77-89: freeze fpn_retina + retinanet + prn
    "keypoint": {"fpn_resnet", "fpn_keypoint", "keypoint"},
    # multipose_detection_train.py:64-79: freeze resnet trunk + keypoint parts + prn
    "detection": {"fpn_retina", "retinanet"},
    # multipose_prn_train.py:56-59: freeze everything but prn
    "prn": {"prn"},
}


def trainable_mask(params, subnet: str):
    groups = TRAINABLE_GROUPS[subnet]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def leaf_mask(path):
        keys = tuple(k.key for k in path)
        return param_group(keys) in groups

    return jax.tree_util.tree_map_with_path(lambda p, _: leaf_mask(p), params)


# ---------------------------------------------------------------------------
# optimizer
# ---------------------------------------------------------------------------

def clip_by_global_inf_norm(max_norm: float) -> optax.GradientTransformation:
    """Gradient clipping with the reference's exact semantics:
    ``nn.utils.clip_grad_norm(parameters, max_norm, float('inf'))``
    (trainer.py:255-256) — the total norm is the INFINITY norm (max abs
    over all trainable grads) and every grad is scaled by
    ``max_norm / (total_norm + 1e-6)`` when that is < 1."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        inf_norm = jax.tree.reduce(
            jnp.maximum,
            jax.tree.map(lambda g: jnp.max(jnp.abs(g)), updates))
        coef = jnp.minimum(max_norm / (inf_norm + 1e-6), 1.0)
        return jax.tree.map(lambda g: g * coef, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: Config, params, subnet: str) -> optax.GradientTransformation:
    """Adam (torch defaults) with optional inf-norm clip, masked to the
    stage's trainable subset (frozen leaves carry no optimizer state, like
    the reference passing only trainable_vars to torch.optim.Adam)."""
    mask = trainable_mask(params, subnet)
    parts = []
    if cfg.train.max_grad_norm:
        parts.append(clip_by_global_inf_norm(cfg.train.max_grad_norm))
    if cfg.train.optimizer == "adam":
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        if cfg.train.weight_decay:
            parts.append(optax.add_decayed_weights(cfg.train.weight_decay))
    elif cfg.train.optimizer == "sgd":
        parts.append(optax.trace(decay=0.9))
    else:
        raise ValueError(cfg.train.optimizer)
    # note: -lr scaling is applied inside the step (lr is a runtime arg)
    return optax.masked(optax.chain(*parts), mask), mask


def create_train_state(model: PoseNet, cfg: Config, rng, image_hw,
                       subnet: str) -> Tuple[TrainState, optax.GradientTransformation, Any]:
    h, w = image_hw
    variables = model.init(
        rng,
        jnp.zeros((1, h, w, 3), jnp.float32),
        jnp.zeros((1, cfg.model.prn_height, cfg.model.prn_width, 17), jnp.float32),
        method=PoseNet.init_all,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx, mask = make_optimizer(cfg, params, subnet)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=tx.init(params))
    return state, tx, mask


def _apply_updates(state: TrainState, grads, tx, mask, lr, new_batch_stats):
    """Apply -lr-scaled optimizer updates to the TRAINABLE leaves only.

    Frozen leaves are skipped at the PYTHON level (`mask` is a static bool
    tree): their param buffers pass through the step untouched and their
    gradients become dead values XLA dead-code-eliminates — including the
    entire backward through frozen-only subgraphs.  Measured round 4 on
    v5e (docs/PERF.md "Training roofline"): the detection stage no longer
    computes the frozen ResNet trunk's weight gradients at all, and the
    keypoint/PRN stages stop materializing + rewriting zero-update frozen
    params (e.g. the 71M-param PRN MLP inside the keypoint step).
    `optax.masked` already keeps optimizer state (and the inf-norm clip's
    reduction set) restricted to the same trainable leaves, so the update
    math is bit-identical to the old where-mask formulation."""
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree.map(
        lambda p, u, m: optax.apply_updates(p, -lr * u) if m else p,
        state.params, updates, mask)
    return state.replace(step=state.step + 1, params=new_params,
                         batch_stats=new_batch_stats, opt_state=new_opt)


def _shardings(mesh: Optional[Mesh]):
    if mesh is None:
        return None, None
    return NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))


# ---------------------------------------------------------------------------
# keypoint stage
# ---------------------------------------------------------------------------

def make_keypoint_steps(model: PoseNet, cfg: Config, tx, mask,
                        mesh: Optional[Mesh] = None):
    """Returns (train_step, val_step).

    batch = {
      'image':  (B, H, W, 3) uint8 RGB (augmented, on host)
      'joints': (B, maxP, 18, 3) float32 — augmented joints, pad v=2
      'mask':   (B, H/4, W/4) float32 — resized mask_miss in [0, 1]
    }
    """
    stride = cfg.data.feat_stride
    num_j = cfg.model.num_joints
    sigma = cfg.data.sigma

    def loss_from_batch(params, batch_stats, batch, train: bool):
        imgs = preprocess_on_device(batch["image"])
        gh, gw = imgs.shape[1] // stride, imgs.shape[2] // stride
        heat = jax.vmap(
            lambda j: make_heatmaps(j, gh, gw, stride, sigma))(batch["joints"])
        hmask = jnp.repeat(batch["mask"][..., None], num_j, axis=-1)

        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            (pred, saved), updated = model.apply(
                variables, imgs, True, method=PoseNet.keypoint_forward,
                mutable=["batch_stats"])
            new_stats = updated["batch_stats"]
        else:
            pred, saved = model.apply(
                variables, imgs, False, method=PoseNet.keypoint_forward)
            new_stats = batch_stats
        loss, logs = keypoint_loss(saved, heat, hmask, num_j)
        return loss, (logs, new_stats)

    rep, dat = _shardings(mesh)
    # cfg.train.donate_state: in-place state buffer reuse (halves peak HBM
    # for params+opt state); off = keep the old state readable after a step
    jit_kw: Dict[str, Any] = (
        dict(donate_argnums=(0,)) if cfg.train.donate_state else {})
    if mesh is not None:
        jit_kw.update(in_shardings=(rep, dat, rep), out_shardings=(rep, rep))

    @functools.partial(jax.jit, **jit_kw)
    def train_step(state: TrainState, batch, lr):
        (loss, (logs, new_stats)), grads = jax.value_and_grad(
            loss_from_batch, has_aux=True)(state.params, state.batch_stats,
                                           batch, True)
        new_state = _apply_updates(state, grads, tx, mask, lr, new_stats)
        logs = dict(logs, loss=loss)
        return new_state, logs

    val_kw: Dict[str, Any] = {}
    if mesh is not None:
        val_kw.update(in_shardings=(rep, dat), out_shardings=rep)

    @functools.partial(jax.jit, **val_kw)
    def val_step(state: TrainState, batch):
        loss, (logs, _) = loss_from_batch(state.params, state.batch_stats,
                                          batch, False)
        return dict(logs, loss=loss)

    return train_step, val_step


# ---------------------------------------------------------------------------
# detection stage
# ---------------------------------------------------------------------------

def make_detection_steps(model: PoseNet, cfg: Config, tx, mask,
                         mesh: Optional[Mesh] = None,
                         image_hw: Optional[Tuple[int, int]] = None):
    """batch = {'image': (B,H,W,3) uint8, 'boxes': (B,N,5) float32 pad -1}."""
    hw = image_hw or (cfg.data.inp_size, cfg.data.inp_size)
    anchors = jnp.asarray(anchors_for_shape(tuple(hw), cfg.anchors))
    det = cfg.detection

    def loss_from_batch(params, batch_stats, batch):
        imgs = preprocess_on_device(batch["image"])
        variables = {"params": params, "batch_stats": batch_stats}
        # BN frozen outside keypoint stage (reference trainer.py:172-174)
        cls, reg = model.apply(variables, imgs, False,
                               method=PoseNet.detection_forward)
        loss, logs = detection_loss(
            cls, reg, anchors, batch["boxes"],
            alpha=det.focal_alpha, gamma=det.focal_gamma,
            pos_iou=det.pos_iou, neg_iou=det.neg_iou, beta=det.smooth_l1_beta)
        return loss, logs

    rep, dat = _shardings(mesh)
    # cfg.train.donate_state: in-place state buffer reuse (halves peak HBM
    # for params+opt state); off = keep the old state readable after a step
    jit_kw: Dict[str, Any] = (
        dict(donate_argnums=(0,)) if cfg.train.donate_state else {})
    if mesh is not None:
        jit_kw.update(in_shardings=(rep, dat, rep), out_shardings=(rep, rep))

    @functools.partial(jax.jit, **jit_kw)
    def train_step(state: TrainState, batch, lr):
        (loss, logs), grads = jax.value_and_grad(
            loss_from_batch, has_aux=True)(state.params, state.batch_stats, batch)
        new_state = _apply_updates(state, grads, tx, mask, lr, state.batch_stats)
        return new_state, dict(logs, loss=loss)

    val_kw: Dict[str, Any] = {}
    if mesh is not None:
        val_kw.update(in_shardings=(rep, dat), out_shardings=rep)

    @functools.partial(jax.jit, **val_kw)
    def val_step(state: TrainState, batch):
        loss, logs = loss_from_batch(state.params, state.batch_stats, batch)
        return dict(logs, loss=loss)

    return train_step, val_step


# ---------------------------------------------------------------------------
# PRN stage
# ---------------------------------------------------------------------------

def make_prn_steps(model: PoseNet, cfg: Config, tx, mask,
                   mesh: Optional[Mesh] = None,
                   grid_impl: str = "conv"):
    """batch = {'weights_marks': (B,gh,gw,17) f32 one-hot multi-person marks,
                'label_marks':   (B,gh,gw,17) f32 one-hot own-person marks}

    The gaussian blurs the reference does per-sample in dataloader workers
    (prn_data_pipeline.py:105-107: weights sigma=1 'nearest', labels sigma=2
    'constant') run here on device, batched.

    grid_impl selects the blur formulation; both are exactly equivalent
    (tests/test_train_steps.py::test_prn_grid_impls_equivalent).  MEASURED
    round 4 on v5e (bf16, batch 256, tools/bench_train_mfu.py --prn-grids):
    'conv' (separable depthwise) 8.5-8.9 ms/step vs 'matmul' (the dense
    blur-operator einsums that WIN inside the batch-64 fused INFERENCE
    graph, engine/inference.py) 10.6 ms/step.  In the train step the marks
    are already dense (B,gh,gw,17) activations in a conv-friendly layout,
    so the depthwise conv keeps the win and stays the default; docs/PERF.md
    "Training roofline" records both.
    """
    gh, gw = cfg.model.prn_height, cfg.model.prn_width

    def _blur_mm(x, sigma, mode):
        hi = jax.lax.Precision.HIGHEST
        by = jnp.asarray(blur_matrix(gh, sigma, mode))
        bx = jnp.asarray(blur_matrix(gw, sigma, mode))
        x = jnp.einsum("yh,bhxj->byxj", by, x, precision=hi)
        return jnp.einsum("xw,bywj->byxj", bx, x, precision=hi)

    def build_grids(batch):
        if grid_impl == "matmul":
            w = _blur_mm(batch["weights_marks"], 1.0, "nearest")
            lbl = _blur_mm(batch["label_marks"], 2.0, "constant")
        else:
            w = gaussian_blur(batch["weights_marks"], sigma=1.0, mode="nearest")
            lbl = gaussian_blur(batch["label_marks"], sigma=2.0, mode="constant")
        return w, lbl

    def loss_from_batch(params, batch, train: bool, rng=None):
        grids, labels = build_grids(batch)
        variables = {"params": params}
        kw = {}
        if train:
            kw["rngs"] = {"dropout": rng}
        out = model.apply(variables, grids, train,
                          method=PoseNet.prn_forward, **kw)
        return prn_loss(out, labels)

    rep, dat = _shardings(mesh)
    # cfg.train.donate_state: in-place state buffer reuse (halves peak HBM
    # for params+opt state); off = keep the old state readable after a step
    jit_kw: Dict[str, Any] = (
        dict(donate_argnums=(0,)) if cfg.train.donate_state else {})
    if mesh is not None:
        jit_kw.update(in_shardings=(rep, dat, rep, rep), out_shardings=(rep, rep))

    @functools.partial(jax.jit, **jit_kw)
    def train_step(state: TrainState, batch, lr, rng):
        def lf(params):
            return loss_from_batch(params, batch, True, rng)
        (loss, logs), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
        new_state = _apply_updates(state, grads, tx, mask, lr, state.batch_stats)
        return new_state, dict(logs, loss=loss)

    val_kw: Dict[str, Any] = {}
    if mesh is not None:
        val_kw.update(in_shardings=(rep, dat), out_shardings=rep)

    @functools.partial(jax.jit, **val_kw)
    def val_step(state: TrainState, batch):
        loss, logs = loss_from_batch(state.params, batch, False)
        return dict(logs, loss=loss)

    return train_step, val_step


STEP_FACTORIES: Dict[str, Callable] = {
    "keypoint": make_keypoint_steps,
    "detection": make_detection_steps,
    "prn": make_prn_steps,
}
