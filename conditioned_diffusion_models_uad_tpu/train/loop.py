"""The training loop: pjit data-parallel steps, epochs, validation, checkpoints.

Capability parity with the reference's orchestration
(reference: src/train.py:31-250 + Lightning Trainer semantics it relies on):

* per-fold fit with seed control                       (src/train.py:67-82)
* validation every N epochs, best/last checkpointing on the val loss
                                                       (configs/trainer/default.yaml:10,
                                                        configs/callbacks/checkpoint.yaml)
* checkpoint resume                                    (src/train.py:50-57,129-133)
* optimizer per task: Adam for the DDPM (DDPM_2D.py:305-306),
  AdamW(wd .05, betas .9/.95) for SparK (Spark_2D.py:123-124)
* fast_dev_run / overfit-batches debug modes           (src/utils/utils.py:47-61,
                                                        configs/trainer/default.yaml:11)

TPU-first design:
* ONE jitted train step: on-device slice gather → on-device augmentation →
  simplex noise → UNet fwd/bwd → optax update, with the state buffers donated.
  The host only feeds int32 index arrays — there is no per-step host→device
  tensor traffic (the reference ships full slice batches from torchio workers).
* the batch axis is sharded over the 1-D data mesh; parameters are replicated
  and XLA all-reduces the grads over ICI (the DDP equivalent, SURVEY.md §2.7).
* `train_epoch_scan` optionally runs a whole epoch as one `lax.scan` over the
  stacked index arrays — zero Python dispatch between steps.
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.augment import aug_intensity_batch, full_augment_batch
from ..data.datamodules import TrainSliceSource
from ..parallel.mesh import batch_sharding, replicated_sharding
from .checkpoint import FoldCheckpointer


@dataclasses.dataclass
class TrainerConfig:
    max_epochs: int = 1200
    check_val_every_n_epoch: int = 10
    # epochs dispatched as ONE device program (scan over epochs of the epoch
    # scan). None = auto: chunk up to the next val/checkpoint boundary —
    # per-epoch dispatch overhead is RTT-bound on tunneled hosts (measured
    # 0.049 s/epoch on the SparK protocol, PARITY r5). 1 restores the
    # per-epoch dispatch. Only active with epoch_scan.
    epochs_per_dispatch: int | None = None
    seed: int = 42
    ckpt_dir: str = "./checkpoints"
    resume: bool = False
    log_every_n_steps: int = 50
    fast_dev_run: bool = False  # 1 epoch, 1 batch, no ckpt (ref utils.py:47-61)
    overfit_batches: int = 0  # >0: restrict each epoch to the first N batches
    aug_intensity: bool = True
    aug_full: bool = False  # also spatial/noise/motion families (get_augment)
    epoch_scan: bool = True  # run each epoch as one lax.scan
    limit_val_batches: Optional[int] = None
    save_last: bool = True  # callbacks.checkpoint.save_last (ref checkpoint.yaml)


class _AsyncCheckpointWriter:
    """ONE background checkpoint cycle in flight: the (slow, tunneled) D2H
    state fetch + orbax write overlap the next epochs' device compute
    instead of stalling the fit loop (~50 s/cycle measured synchronous on a
    degraded link, VERDICT r4 #2). The writer consumes an ON-DEVICE
    snapshot (jitted tree-copy — fresh buffers, so the train loop donating
    the live state cannot invalidate what the writer is fetching).
    Exceptions surface on the next submit() or join()."""

    def __init__(self):
        self._fut = None
        self._pool = None

    def submit(self, fn) -> None:
        from concurrent.futures import ThreadPoolExecutor

        if self._pool is None:
            self._pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ckpt-writer"
            )
        self.join()  # serialize cycles (meta.json + orbax paths are shared)
        self._fut = self._pool.submit(fn)

    def join(self) -> None:
        if self._fut is not None:
            fut, self._fut = self._fut, None
            fut.result()


def make_optimizer(task) -> optax.GradientTransformation:
    """Task-appropriate optimizer (see module docstring)."""
    cfg = task.cfg
    if hasattr(cfg, "weight_decay"):  # SparK pretraining
        return optax.adamw(cfg.lr, b1=cfg.b1, b2=cfg.b2, weight_decay=cfg.weight_decay)
    return optax.adam(cfg.lr)


def init_state(task, key: jax.Array, tx: optax.GradientTransformation) -> dict:
    """Training state as a plain pytree dict (orbax/serialization friendly)."""
    variables = task.init(key)
    return {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": tx.init(variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }


def state_variables(state: dict) -> dict:
    return {"params": state["params"], "batch_stats": state["batch_stats"]}


class Trainer:
    """Fit/validate/checkpoint one task on one fold."""

    def __init__(
        self,
        task,
        cfg: TrainerConfig,
        mesh: Optional[Mesh] = None,
        logger=None,
    ):
        self.task = task
        self.cfg = cfg
        self.mesh = mesh
        self.logger = logger
        self.tx = make_optimizer(task)
        self._data_cache: dict = {}
        self._build_steps()

    # ------------------------------------------------------------------ #
    def _build_steps(self):
        task, tx, cfg = self.task, self.tx, self.cfg

        def gathered_batch(data, vol_idx, slice_idx, key, augment):
            vols, masks = data
            v = vols[vol_idx, :, :, slice_idx][..., None]  # [B, H, W, 1]
            m = masks[vol_idx, :, :, slice_idx][..., None]
            if augment and cfg.aug_full:
                v, m = full_augment_batch(key, v, m)
            elif augment and cfg.aug_intensity:
                v = aug_intensity_batch(key, v)
            return {"vol": v, "mask": m}

        def train_step(state, data, vol_idx, slice_idx, key):
            k_aug, k_loss = jax.random.split(jax.random.fold_in(key, state["step"]))
            batch = gathered_batch(data, vol_idx, slice_idx, k_aug, augment=True)

            def loss_fn(params):
                variables = {"params": params, "batch_stats": state["batch_stats"]}
                loss, (new_stats, _aux) = task.loss(variables, batch, k_loss, train=True)
                return loss, new_stats

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state["params"]
            )
            updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
            params = optax.apply_updates(state["params"], updates)
            return {
                "params": params,
                "batch_stats": new_stats,
                "opt_state": opt_state,
                "step": state["step"] + 1,
            }, loss

        def val_step(state, data, vol_idx, slice_idx, key):
            batch = gathered_batch(data, vol_idx, slice_idx, key, augment=False)
            variables = state_variables(state)
            loss, _ = task.loss(variables, batch, key, train=False)
            return loss

        def epoch_scan(state, data, vol_idx_all, slice_idx_all, key):
            def body(st, idxs):
                vi, si = idxs
                return train_step(st, data, vi, si, key)

            return jax.lax.scan(body, state, (vol_idx_all, slice_idx_all))

        def multi_epoch_scan(state, data, vi_all, si_all, base_key, epoch_idx):
            """Several epochs as ONE dispatch: scan over epochs of the scan
            over steps. vi_all/si_all are [E, S, B]; epoch e's key is
            fold_in(base_key, epoch_idx[e]) computed IN-program (eager
            per-epoch fold_ins would cost one tunnel RTT each — the exact
            overhead this path removes; fold_in on a traced index is bitwise
            the eager fold_in). Per-epoch dispatch overhead measured 0.049
            s/epoch RTT-bound on the SparK protocol (PARITY r5) — chunking
            to the val interval divides it by the chunk length."""

            def epoch_body(st, per_epoch):
                vi, si, e = per_epoch
                return epoch_scan(st, data, vi, si,
                                  jax.random.fold_in(base_key, e))

            return jax.lax.scan(
                epoch_body, state, (vi_all, si_all, epoch_idx)
            )  # losses [E, S]

        if self.mesh is not None:
            rep = replicated_sharding(self.mesh)
            shb = batch_sharding(self.mesh)
            self._train_step = jax.jit(
                train_step,
                in_shardings=(rep, rep, shb, shb, rep),
                out_shardings=(rep, rep),
                donate_argnums=(0,),
            )
            # epoch scan: index arrays are [S, B]; shard the batch axis (1)
            shb2 = NamedSharding(self.mesh, P(None, self.mesh.axis_names[0]))
            self._epoch_scan = jax.jit(
                epoch_scan,
                in_shardings=(rep, rep, shb2, shb2, rep),
                out_shardings=(rep, rep),
                donate_argnums=(0,),
            )
            # multi-epoch chunk: [E, S, B] index arrays, batch axis (2)
            shb3 = NamedSharding(
                self.mesh, P(None, None, self.mesh.axis_names[0])
            )
            self._multi_epoch_scan = jax.jit(
                multi_epoch_scan,
                in_shardings=(rep, rep, shb3, shb3, rep, rep),
                out_shardings=(rep, rep),
                donate_argnums=(0,),
            )
            self._val_step = jax.jit(
                val_step, in_shardings=(rep, rep, shb, shb, rep), out_shardings=rep
            )
        else:
            self._train_step = jax.jit(train_step, donate_argnums=(0,))
            self._epoch_scan = jax.jit(epoch_scan, donate_argnums=(0,))
            self._multi_epoch_scan = jax.jit(
                multi_epoch_scan, donate_argnums=(0,)
            )
            self._val_step = jax.jit(val_step)

    # ------------------------------------------------------------------ #
    def _epoch_index_arrays(self, source: TrainSliceSource, rng, limit=None):
        vis, sis = [], []
        for vi, si in source.epoch_indices(rng):
            vi, si = self._pad_batch_idx(vi, si)
            vis.append(vi)
            sis.append(si)
            if limit is not None and len(vis) >= limit:
                break
        if not vis:
            return None, None
        # wrap-pad any remainder batch to the common size so the epoch stacks
        # into one [S, B] array (and shards evenly)
        bs = max(len(v) for v in vis)
        for i, (vi, si) in enumerate(zip(vis, sis)):
            if len(vi) != bs:
                idx = np.resize(np.arange(len(vi)), bs)
                vis[i], sis[i] = vi[idx], si[idx]
        return np.stack(vis), np.stack(sis)

    def _pad_batch_idx(self, vi: np.ndarray, si: np.ndarray):
        """Pad an index batch up to a multiple of the mesh size by wrapping
        (small datasets / remainder batches must still shard evenly; the
        duplicated samples only reweight a monitoring loss slightly)."""
        if self.mesh is None:
            return vi, si
        m = int(self.mesh.devices.size)
        n = len(vi)
        target = ((n + m - 1) // m) * m
        if target == n:
            return vi, si
        pad = target - n
        idx = np.resize(np.arange(n), target)[n:]
        return (
            np.concatenate([vi, vi[idx]]),
            np.concatenate([si, si[idx]]),
        )

    def _device_data(self, source: TrainSliceSource):
        """Replicate the stacked volumes across the mesh ONCE (committed
        buffers) so repeated step calls incur no host↔device traffic. Cached
        per source: `validate` runs every N epochs and must NOT re-upload the
        val set each time (a repeated multi-MB H2D over the tunnel)."""
        cached = self._data_cache.get(id(source))
        if cached is not None and cached[0] is source:
            return cached[1]
        data = (source.vols, source.masks)
        if self.mesh is not None:
            data = jax.device_put(data, replicated_sharding(self.mesh))
        else:
            data = jax.device_put(data)
        # keep the source ref so a dead id can't alias a new object
        self._data_cache[id(source)] = (source, data)
        return data

    def validate(self, state, source: TrainSliceSource, key) -> float:
        rng = np.random.default_rng(0)  # deterministic val slices
        losses = []
        data = self._device_data(source)
        limit = self.cfg.limit_val_batches
        for i, (vi, si) in enumerate(source.epoch_indices(rng)):
            if limit is not None and i >= limit:
                break
            vi, si = self._pad_batch_idx(vi, si)
            # keep device scalars; ONE stacked fetch below (a per-batch
            # float() would pay one tunnel RTT per val batch)
            losses.append(
                self._val_step(state, data, vi, si, jax.random.fold_in(key, i))
            )
        if not losses:
            return float("nan")
        vals = np.asarray(jnp.stack(losses), dtype=np.float64)
        return float(np.mean(vals))  # f64 host mean, as the per-batch float() path did

    # ------------------------------------------------------------------ #
    def fit(
        self,
        train_source: TrainSliceSource,
        val_source: Optional[TrainSliceSource] = None,
        fold: int = 0,
        init_variables: Optional[dict] = None,
    ) -> dict:
        """Run the fit loop; returns the final state. Mirrors
        trainer.fit(...) + ModelCheckpoint + resume (src/train.py:129-156)."""
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed + fold)
        k_init, k_train, k_val = jax.random.split(key, 3)

        state = init_state(self.task, k_init, self.tx)
        if init_variables is not None:
            state["params"] = init_variables["params"]
            state["batch_stats"] = init_variables.get(
                "batch_stats", state["batch_stats"]
            )

        ckpt = FoldCheckpointer(cfg.ckpt_dir, fold)
        start_epoch = 0
        if cfg.resume and ckpt.exists("last"):
            state, meta = ckpt.restore("last", target=state)
            start_epoch = int(meta.get("step", 0))

        max_epochs = 1 if cfg.fast_dev_run else cfg.max_epochs
        data = self._device_data(train_source)
        steps, t0 = 0, time.time()
        last_loss = float("nan")
        # checkpoint cycle: on-device snapshot (fresh buffers) + background
        # D2H/write — see _AsyncCheckpointWriter
        writer = _AsyncCheckpointWriter()
        if not hasattr(self, "_snapshot"):
            self._snapshot = jax.jit(
                lambda s: jax.tree_util.tree_map(jnp.copy, s)
            )

        overfit_arrays = None
        if cfg.overfit_batches and not cfg.fast_dev_run:
            # Lightning overfit semantics: the SAME fixed batches every epoch
            overfit_arrays = self._epoch_index_arrays(
                train_source, np.random.default_rng(cfg.seed), cfg.overfit_batches
            )

        def _log_epoch_losses(loss_epoch, epoch, steps):
            """One epoch's [S] loss stream at log_every_n_steps cadence
            (restores the reference's per-step train/loss rows, Lightning
            logs each step, src/models/DDPM_2D.py:130-135)."""
            n_b = int(loss_epoch.shape[0])
            every = max(1, int(cfg.log_every_n_steps))
            if self.logger is not None:
                for b in range(n_b):
                    if (steps + b + 1) % every == 0 or b == n_b - 1:
                        self.logger.log_metrics(
                            {"train/loss": float(loss_epoch[b]),
                             "epoch": epoch},
                            step=steps + b + 1,
                        )
            return steps + n_b

        val_n = max(1, int(cfg.check_val_every_n_epoch))
        epoch = start_epoch
        while epoch < max_epochs:
            scanning = cfg.epoch_scan and not cfg.fast_dev_run
            # chunk: epochs until the next val/checkpoint boundary (or the
            # end), dispatched as ONE multi-epoch scan — per-epoch dispatch
            # overhead is one tunnel RTT (TrainerConfig.epochs_per_dispatch)
            if val_source is not None and not cfg.fast_dev_run:
                end = min(max_epochs, (epoch // val_n + 1) * val_n)
            else:
                end = max_epochs if scanning and overfit_arrays is None else epoch + 1
            chunk = end - epoch
            if cfg.epochs_per_dispatch is not None:
                chunk = min(chunk, max(1, int(cfg.epochs_per_dispatch)))
            use_chunk = scanning and overfit_arrays is None and chunk > 1

            if use_chunk:
                vis, sis = [], []
                for e in range(epoch, epoch + chunk):
                    # per-epoch derived rng: the shuffle stream is a function
                    # of (seed, fold, epoch) — identical to the per-epoch
                    # dispatch path, so chunking never changes the data order
                    epoch_rng = np.random.default_rng([cfg.seed + fold, e])
                    vi_all, si_all = self._epoch_index_arrays(
                        train_source, epoch_rng, None
                    )
                    if vi_all is None:
                        raise ValueError("empty training source")
                    vis.append(vi_all)
                    sis.append(si_all)
                state, losses = self._multi_epoch_scan(
                    state, data, np.stack(vis), np.stack(sis), k_train,
                    np.arange(epoch, epoch + chunk, dtype=np.int32),
                )
                # ONE stacked fetch for the whole chunk's loss stream
                loss_host = np.asarray(jax.device_get(losses), np.float64)
                for ei in range(loss_host.shape[0]):
                    steps = _log_epoch_losses(loss_host[ei], epoch + ei, steps)
                last_loss = float(loss_host[-1, -1])
                epoch += chunk
            else:
                if overfit_arrays is not None:
                    vi_all, si_all = overfit_arrays
                else:
                    limit = 1 if cfg.fast_dev_run else None
                    # per-epoch derived rng: the shuffle stream is a function
                    # of (seed, fold, epoch), so a resumed run at epoch k
                    # draws the SAME orders epochs 0..k-1 would have been
                    # followed by — not a replay of the start of training
                    epoch_rng = np.random.default_rng([cfg.seed + fold, epoch])
                    vi_all, si_all = self._epoch_index_arrays(
                        train_source, epoch_rng, limit
                    )
                if vi_all is None:
                    raise ValueError("empty training source")

                if scanning:
                    state, losses = self._epoch_scan(
                        state, data, vi_all, si_all,
                        jax.random.fold_in(k_train, epoch),
                    )
                    loss_host = np.asarray(
                        jax.device_get(losses), dtype=np.float64
                    )
                    steps = _log_epoch_losses(loss_host, epoch, steps)
                    last_loss = float(loss_host[-1])
                else:
                    every = max(1, int(cfg.log_every_n_steps))
                    n_b = vi_all.shape[0]
                    for b in range(n_b):
                        state, loss = self._train_step(
                            state, data, vi_all[b], si_all[b],
                            jax.random.fold_in(k_train, epoch),
                        )
                        steps += 1
                        # value-fetch (a device sync) only at the logging
                        # cadence or epoch end — a per-step D2H fetch would
                        # serialize the tunneled transport the loop otherwise
                        # keeps enqueued
                        if steps % every == 0 or b == n_b - 1:
                            last_loss = float(loss)
                            if self.logger is not None:
                                self.logger.log_metrics(
                                    {"train/loss": last_loss, "epoch": epoch},
                                    step=steps,
                                )
                epoch += 1

            # `epoch` has already advanced past the chunk: the boundary test
            # is the pre-advance `(e + 1) % N == 0 or e == max_epochs - 1`
            run_val = (
                val_source is not None
                and not cfg.fast_dev_run
                and (epoch % val_n == 0 or epoch == max_epochs)
            )
            if run_val:
                val_loss = self.validate(state, val_source, k_val)
                if self.logger is not None:
                    self.logger.log_metrics(
                        {"val/loss_comb": val_loss, "epoch": epoch - 1},
                        step=steps,
                    )
                # the save cycle runs on the background writer against an
                # on-device snapshot; when 'last' is off, only the 'best'
                # subset (params+batch_stats, ~1/3 of the payload — the Adam
                # moments stay on device) ever crosses the D2H link
                is_best = ckpt.is_best(val_loss)
                if is_best or cfg.save_last:
                    from .checkpoint import variables_only

                    snap = self._snapshot(
                        state if cfg.save_last else variables_only(state)
                    )

                    def _write(snap=snap, n_done=epoch, val_loss=val_loss,
                               is_best=is_best):
                        host_state = jax.device_get(snap)
                        if is_best:
                            ckpt.maybe_save_best(host_state, n_done, val_loss)
                        if cfg.save_last:
                            ckpt.save_last(host_state, n_done, val_loss)

                    writer.submit(_write)

        writer.join()
        if not cfg.fast_dev_run and val_source is None and cfg.save_last:
            ckpt.save_last(jax.device_get(state), max_epochs)

        if self.logger is not None:
            self.logger.log_metrics(
                {"train/steps_per_sec": steps / max(time.time() - t0, 1e-9)},
                step=steps,
            )
        return state
