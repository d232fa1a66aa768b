"""Device mesh and sharding helpers.

The reference's entire parallelism story is single-process
``nn.DataParallel`` (``dpc/main.py:65``).  The TPU-native equivalent is one
``jax.sharding.Mesh`` over the slice with the batch axis sharded along
``'data'``; gradients are ``pmean``'d over ICI inside a ``shard_map``'d
train step.  The mesh carries a second ``'model'`` axis (size 1 by default)
so tensor-style shardings can be introduced without re-plumbing callers.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_devices: int = 0, model_parallel: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ('data', 'model') mesh.

    ``num_devices`` 0 means all visible devices.  ``model_parallel`` splits
    off an inner axis that rides the fastest ICI links (adjacent devices).
    """
    if devices is None:
        devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by "
                         f"model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def shard_key(key: jax.Array, step=None, axis: str = DATA_AXIS) -> jax.Array:
    """Per-data-shard RNG stream, for use INSIDE a ``shard_map``'d step.

    Folds the shard's ``axis_index`` (and optionally the optimizer step)
    into the host-passed key, so:

      * streams are DISTINCT across 'data' shards — otherwise every shard
        applies the identical random augmentation/dropout to its local
        rows (correlated noise the reference's DataParallel never has:
        its workers draw from one host RNG sequence);
      * streams are IDENTICAL across 'model' peers as returned here.
        Steps that shard CLIPS over the model axis (the pretrain AND
        finetune steps when ``model_parallel > 1``) ``fold_in`` the model
        ``axis_index`` themselves, because their peers hold DIFFERENT
        samples and need decorrelated dropout; steps where model peers
        genuinely replicate a computation must keep the synced stream;
      * streams are distinct across steps without the host re-seeding.

    Every train/eval step (``pretrain_step``, ``finetune_step``) derives
    its in-step randomness through this helper.
    """
    key = jax.random.fold_in(key, jax.lax.axis_index(axis))
    if step is not None:
        key = jax.random.fold_in(key, step)
    return key


def peer_sample_keys(akey: jax.Array, rows_local: int, shard_clips: bool,
                     n_model: int) -> jax.Array:
    """Per-sample augmentation key streams, invariant to the clip split.

    For use INSIDE a step that shards clips over the model axis: the
    full data group's key set is drawn once (``rows_local × n_model``
    keys from the 'model'-synced ``akey``) and each peer slices its own
    ``rows_local`` chunk by ``axis_index`` — so every sample draws the
    SAME augmentation whether its data group runs on 1 or m peers.
    This is load-bearing for the ``{d,m} ≡ {d}`` equality pins
    (``tests/test_train_step.py``, ``tests/test_finetune_mp.py``); all
    clip-sharding steps must derive their sample keys through here so
    the layout stays in lockstep with ``batch_sharding``'s row-major
    ('data', 'model') split."""
    if not shard_clips:
        return jax.random.split(akey, rows_local)
    keys = jax.random.split(akey, rows_local * n_model)
    im = jax.lax.axis_index(MODEL_AXIS)
    return jax.lax.dynamic_slice_in_dim(keys, im * rows_local,
                                        rows_local, 0)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding.

    With a model axis of size > 1 the train/eval steps shard CLIPS over
    ('data', 'model') (every peer encodes its own sub-batch —
    ``train/pretrain_step.py``, ``train/finetune_step.py``), so the host
    batch is placed the same way; a pure-data mesh keeps the plain 'data'
    split."""
    if mesh.shape.get(MODEL_AXIS, 1) > 1:
        return NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS)))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Shard a host batch's leading axis over 'data'.

    Single-process: a plain device_put.  Multi-process (one jax process
    per host, ``jax.distributed.initialize``): each process passes its
    LOCAL slice (global_batch / process_count samples) and the global
    array is assembled across hosts.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            batch)
    return jax.device_put(batch, sharding)


def init_multihost() -> tuple[int, int]:
    """Initialise the JAX distributed runtime (idempotent) and return
    (process_index, process_count) — the loader's (shard_id, num_shards).

    Must not touch ``jax.process_count()`` (or any backend query) before
    ``initialize()``: that initialises the XLA backends, after which
    ``initialize()`` always raises — and a blanket except would then
    silently degrade every host to an independent single-process run
    (shard 0/1 of the data each, duplicate training, no error)."""
    if not jax.distributed.is_initialized():
        try:
            jax.distributed.initialize()
        except ValueError:
            # no coordinator address / automatic peer discovery in this
            # environment: a genuine single-process run
            pass
    return jax.process_index(), jax.process_count()


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))
