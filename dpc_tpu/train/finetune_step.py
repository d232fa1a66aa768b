"""Jitted, mesh-sharded supervised classification steps (LC model).

TPU-native equivalent of the reference finetune hot loop
(``eval/test.py:218-301``): cross-entropy over LC logits, BN running-state
threading, pmean'd grads, per-epoch LR injected as a step argument so the
multi-step-restart schedule never recompiles.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from dpc_tpu.core.config import DPCConfig, EvalConfig, dtype_of
from dpc_tpu.data import device_augment
from dpc_tpu.models import lc
from dpc_tpu.parallel.mesh import (DATA_AXIS, MODEL_AXIS, peer_sample_keys,
                                   shard_key)


def _clip_layout(mesh, batch_size: int):
    """Resolve the downstream clip-sharding layout for ``mesh``.

    Returns (shard_clips, clip_spec, reduce_axes, bn_axis).  Like the
    pretrain steps (``pretrain_step.make_pretrain_step``), a mesh with a
    'model' axis of size m > 1 shards CLIPS over ('data', 'model'): every
    peer runs the LC forward on its own B/(d·m) sub-batch.  LC is simpler
    than pretrain — cross-entropy is per-sample, so no embedding regroup
    is needed at all: the per-peer mean loss pmean'd over both axes IS the
    data group's mean, and grads/metrics/BN-EMA reduce the same way.  BN
    batch statistics sync over 'model' so they span the data shard's full
    local_b samples — the reference's per-GPU (per-data-shard) semantics,
    making {data:d, model:m} compute exactly what {data:d} computes
    (pinned in tests/test_finetune_mp.py).
    """
    n_data = mesh.shape[DATA_AXIS]
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    shard_clips = n_model > 1
    if shard_clips and (batch_size // n_data) % n_model:
        raise ValueError(
            f"per-data-group batch {batch_size // n_data} not divisible "
            f"by model_parallel={n_model}")
    clip_spec = P((DATA_AXIS, MODEL_AXIS)) if shard_clips else P(DATA_AXIS)
    reduce_axes = (DATA_AXIS, MODEL_AXIS) if shard_clips else DATA_AXIS
    bn_axis = MODEL_AXIS if shard_clips else None
    return shard_clips, clip_spec, reduce_axes, bn_axis


class FinetuneState(NamedTuple):
    params: Any
    state: Any          # BN running stats
    opt_state: Any
    step: jax.Array


def softmax_xent(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
        logits, labels))


def _accuracy(logits: jax.Array, labels: jax.Array, k: int) -> jax.Array:
    _, idx = jax.lax.top_k(logits, min(k, logits.shape[-1]))
    return jnp.mean(jnp.any(idx == labels[:, None], axis=-1)
                    .astype(jnp.float32))


def make_finetune_step(model_cfg: DPCConfig, eval_cfg: EvalConfig, mesh,
                       tx: optax.GradientTransformation, *,
                       donate: bool = True):
    """(state, batch, labels, key, lr_scale) → (state, metrics).

    ``lr_scale`` multiplies the update (schedule without recompilation);
    batch ``[B, N, SL, H, W, 3]`` + labels ``[B]`` sharded over 'data'
    (over ('data','model') when the mesh has a model axis — clips are
    sharded across the whole mesh, see ``_clip_layout``; with in-step
    dropout the {d,m} ≡ {d} equivalence is statistical, not bitwise:
    peers hold different samples so their dropout draws decorrelate).
    """
    dtype = dtype_of(model_cfg.compute_dtype)
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    shard_clips, clip_spec, reduce_axes, bn_axis = _clip_layout(
        mesh, eval_cfg.batch_size)
    # stochastic recipe: fold only when forced 'on' (measured −3.3% on
    # chip; probe_fold.py)
    fold, in_norm = device_augment.resolve_fold(eval_cfg)

    def fwd(params, bn_state, batch, key):
        return lc.apply_lc(
            params, bn_state, batch, cfg=model_cfg,
            num_classes=eval_cfg.num_classes, dropout=eval_cfg.dropout,
            train=True, key=key, dtype=dtype, axis_name=bn_axis,
            input_norm=in_norm)

    if eval_cfg.remat:
        # recompute activations in the backward instead of dying on HBM
        # OOM — same fallback the pretrain driver uses
        fwd = jax.checkpoint(
            fwd,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)

    def loss_fn(params, bn_state, batch, labels, key):
        logits, _, new_bn = fwd(params, bn_state, batch, key)
        logits = logits[:, 0, :]
        loss = softmax_xent(logits, labels)
        metrics = {"loss": loss,
                   "top1": _accuracy(logits, labels, 1),
                   "top5": _accuracy(logits, labels, 5)}
        return loss, (metrics, new_bn)

    def device_step(state: FinetuneState, batch, labels, key, lr_scale):
        key = shard_key(key, state.step)
        if eval_cfg.device_augment:
            key, akey = jax.random.split(key)
            sample_keys = peer_sample_keys(akey, batch.shape[0],
                                           shard_clips, n_model)
            batch = device_augment.finetune_augment_batch(
                akey, batch, model_cfg.img_dim, mode="train",
                normalize_out=not fold, sample_keys=sample_keys)
        if shard_clips:
            # peers hold DIFFERENT samples: decorrelate their dropout
            key = jax.random.fold_in(key, jax.lax.axis_index(MODEL_AXIS))
        (_, (metrics, new_bn)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.state, batch,
                                   labels, key)
        # the per-peer loss is a mean over its own rows, so pmean over
        # ('data','model') — equal-size sub-batches — IS the global-batch
        # mean grad: no regroup collective at all (CE is per-sample,
        # unlike pretrain's cross-batch NCE pool)
        grads = jax.lax.pmean(grads, reduce_axes)
        metrics = jax.lax.pmean(metrics, reduce_axes)
        # BN running stats are per-replica in the reference (DataParallel);
        # we average them across replicas — strictly better statistics,
        # identical in the single-device case.  (With clip sharding the
        # batch stats already sync over 'model' — see _clip_layout — so
        # peers agree and this pmean reduces to the {data}-only one.)
        new_bn = jax.lax.pmean(new_bn, reduce_axes)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(state.params, updates)
        return FinetuneState(params, new_bn, opt_state,
                             state.step + 1), metrics

    sharded = jax.shard_map(
        device_step, mesh=mesh,
        in_specs=(P(), clip_spec, clip_spec, P(), P()),
        out_specs=(P(), P()), check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_finetune_eval_step(model_cfg: DPCConfig, eval_cfg: EvalConfig,
                            mesh):
    """Validation: eval-mode forward (running BN stats, no dropout).

    ``key`` drives the device half of the val augmentation recipe when
    ``device_augment`` (the reference's val transform is stochastic too:
    crop p=.3, flip, weak jitter — ``eval/test.py:150-176``); unused
    otherwise.  Clip-sharded over ('data','model') when the mesh has a
    model axis, like the train step (eval mode uses running BN stats, so
    the forward is purely per-sample — the split is exact)."""
    dtype = dtype_of(model_cfg.compute_dtype)
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    shard_clips, clip_spec, reduce_axes, _ = _clip_layout(
        mesh, eval_cfg.batch_size)
    fold, in_norm = device_augment.resolve_fold(eval_cfg)

    def device_step(params, bn_state, batch, labels, key):
        if eval_cfg.device_augment:
            key = shard_key(key)
            sample_keys = peer_sample_keys(key, batch.shape[0],
                                           shard_clips, n_model)
            batch = device_augment.finetune_augment_batch(
                key, batch, model_cfg.img_dim, mode="val",
                normalize_out=not fold, sample_keys=sample_keys)
        logits, _, _ = lc.apply_lc(
            params, bn_state, batch, cfg=model_cfg,
            num_classes=eval_cfg.num_classes, dropout=eval_cfg.dropout,
            train=False, dtype=dtype, input_norm=in_norm)
        logits = logits[:, 0, :]
        return jax.lax.pmean({
            "loss": softmax_xent(logits, labels),
            "top1": _accuracy(logits, labels, 1),
            "top5": _accuracy(logits, labels, 5)}, reduce_axes)

    sharded = jax.shard_map(
        device_step, mesh=mesh,
        in_specs=(P(), P(), clip_spec, clip_spec, P()),
        out_specs=P(), check_vma=False)
    return jax.jit(sharded)


def make_test_forward(model_cfg: DPCConfig, eval_cfg: EvalConfig,
                      test_crop: int = 224):
    """Single-device jitted forward for dense test-time evaluation: the
    window axis rides the batch axis (``eval/test.py:314-321``).

    Honors ``eval_cfg.device_augment`` identically to
    :func:`make_test_forward_sharded` (uint8 ROI windows in, the
    deterministic test recipe runs here), so the two forwards share one
    input contract."""
    dtype = dtype_of(model_cfg.compute_dtype)

    # dense test: 'auto' folds (uint8 windows feed the stem directly —
    # the f32 input is never materialised; measured +5.8%, probe_fold.py)
    fold, in_norm = device_augment.resolve_fold(eval_cfg, dense_test=True)

    @jax.jit
    def forward(params, bn_state, windows):
        if eval_cfg.device_augment:
            windows = device_augment.test_preprocess_batch(
                windows, model_cfg.img_dim, test_crop,
                five_crop=eval_cfg.five_crop, normalize_out=not fold)
        logits, _, _ = lc.apply_lc(
            params, bn_state, windows, cfg=model_cfg,
            num_classes=eval_cfg.num_classes, dropout=eval_cfg.dropout,
            train=False, dtype=dtype, input_norm=in_norm)
        return logits[:, 0, :]

    return forward


def make_test_forward_sharded(model_cfg: DPCConfig, eval_cfg: EvalConfig,
                              mesh, test_crop: int = 224):
    """Mesh-sharded dense-test forward: one fixed ``[WB, N, SL, H, W, C]``
    window batch (windows pooled across videos) sharded over 'data'.

    One compiled shape for the whole test set — the reference evaluates
    one whole video per step on GPU0's DataParallel gather
    (``eval/test.py:314-315``), recompiling nothing but idling every
    other device whenever a video has few windows.

    With ``eval_cfg.device_augment`` the batch is uint8 ROI-decoded
    windows and the deterministic test recipe (center/5-crop → NEAREST
    scale → normalize) runs here, bit-identically to the host chain;
    the 5-crop variant returns ``[5*WB_local]`` rows per shard (crops
    contiguous per window — the caller accounts rows ×5).

    A mesh with a model axis shards the window rows over
    ('data','model') — the forward is per-row, so a pod provisioned
    {data×model} for pretraining runs the dense test on the same mesh
    shape with every chip busy (row order is preserved: the combined
    spec splits the leading axis row-major over the device grid)."""
    dtype = dtype_of(model_cfg.compute_dtype)
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    row_spec = (P((DATA_AXIS, MODEL_AXIS)) if n_model > 1
                else P(DATA_AXIS))

    fold, in_norm = device_augment.resolve_fold(eval_cfg, dense_test=True)

    def device_fwd(params, bn_state, windows):
        if eval_cfg.device_augment:
            windows = device_augment.test_preprocess_batch(
                windows, model_cfg.img_dim, test_crop,
                five_crop=eval_cfg.five_crop, normalize_out=not fold)
        logits, _, _ = lc.apply_lc(
            params, bn_state, windows, cfg=model_cfg,
            num_classes=eval_cfg.num_classes, dropout=eval_cfg.dropout,
            train=False, dtype=dtype, input_norm=in_norm)
        return logits[:, 0, :]

    sharded = jax.shard_map(
        device_fwd, mesh=mesh,
        in_specs=(P(), P(), row_spec), out_specs=row_spec,
        check_vma=False)
    return jax.jit(sharded)
