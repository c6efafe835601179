"""Run orchestration (L2): fold loop, fit, test-after-training, result pickling.

Capability parity with the reference's `train(cfg)`
(reference: src/train.py:31-250):

* seed + fold loop over `start_fold..num_folds`            (src/train.py:67-82)
* datamodule/task instantiation from the composed config   (src/train.py:88-98)
* SparK-encoder checkpoint import into the cDDPM           (DDPM_2D.py:79-96)
* fit with best/last checkpointing, resume support         (src/train.py:129-156)
* onlyEval: restore a checkpoint and skip fit              (src/train.py:159-161)
* test after training: per-modality gated testsets, a val pass that fits the
  Dice threshold followed by the test pass that applies it (src/train.py:182-230,
  utils_eval.py:92-93,262-297)
* preds_dict pickled per fold + scalar summaries logged    (src/train.py:217-237)

TPU-first: the volume reconstruction inside the eval loop runs slice-parallel
over the device mesh (eval/reconstruct.py); everything after the residual is
the fused device post-processing chain of eval/harness.py.
"""
from __future__ import annotations

import logging
import os
import pickle
from typing import Optional

import jax
import numpy as np

from .config import RunConfig
from .data.datamodules import EVAL_MODULES, IXI, SETS_BY_MODE
from .eval.harness import EvalSession
from .eval.reconstruct import VolumeReconstructor
from .log import CSVLogger, MultiLogger, WandbLogger, log_hyperparameters, summarize
from .models.tasks import DDPMTask, DDPMTaskConfig, SparkTask, import_spark_encoder
from .parallel.mesh import local_mesh
from .train.checkpoint import FoldCheckpointer, find_run_checkpoint
from .train.loop import Trainer, init_state, make_optimizer, state_variables


def build_task(cfg: RunConfig):
    if cfg.task == "Spark_2D":
        return SparkTask(cfg.model)
    return DDPMTask(cfg.model)


def _restore_variables(task, ckpt_path_or_dir: str, which: str, fold: int):
    """Restore {'params','batch_stats'} from a run dir or explicit fold dir."""
    import orbax.checkpoint as ocp

    path = ckpt_path_or_dir
    if not os.path.basename(path) in ("best", "last"):
        path = find_run_checkpoint(path, which, fold)
    state = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    return {"params": state["params"], "batch_stats": state.get("batch_stats", {})}


def _load_torch_state_dict(path: str) -> dict:
    """Read a reference torch/Lightning .ckpt file into {key: np.ndarray}.
    Migration entry point: `load_checkpoint=<file.ckpt>` /
    `pretrained_encoder=<file.ckpt>` accept the reference repo's own saved
    checkpoints (Lightning ModelCheckpoint output, src/train.py:129-161)."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover - torch present in this image
        raise RuntimeError(
            f"importing the torch checkpoint {path!r} requires torch"
        ) from e

    try:
        # safe path first: no arbitrary-pickle code execution from an
        # externally produced checkpoint file
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # Lightning ckpts embed non-tensor objects (hparams, callbacks) that
        # weights_only rejects; fall back only on explicit opt-in
        if os.environ.get("UAD_UNSAFE_TORCH_LOAD", "") in ("", "0"):
            raise RuntimeError(
                f"{path!r} is not loadable with torch.load(weights_only=True) "
                "(it embeds pickled non-tensor objects, which execute code at "
                "load time). If you trust this file, set "
                "UAD_UNSAFE_TORCH_LOAD=1 to allow the unsafe loader."
            )
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


def evaluate(
    cfg: RunConfig,
    task,
    variables: dict,
    fold: int,
    logger,
    mesh=None,
) -> dict:
    """Val-threshold-fit → test protocol over the configured testsets."""
    is_patched = getattr(cfg.model, "patched", False)
    recon = VolumeReconstructor(
        task,
        mesh=mesh,
        num_eval_slices=getattr(cfg.model, "num_eval_slices", None),
        patched=is_patched,
    )
    key = jax.random.PRNGKey(cfg.seed + 1000 + fold)
    # per-volume noise keys for grouped dispatches: ONE tiny device program
    # builds the [G, 2] stack fold_in(key, i) per member — each volume then
    # draws the SAME noise it would draw dispatched alone, so eval metrics
    # are invariant to volumes_per_call / fused_dispatch / mesh layout
    # (vmapped fold_in is bitwise fold_in; reference counterpart: fresh
    # noise per call, generate_noise.py:19-25 — the freedom that permits
    # pinning the keying to the volume index)
    fold_keys = jax.jit(
        lambda k, idx: jax.vmap(lambda i: jax.random.fold_in(k, i))(idx)
    )
    preds = {"val": {}, "test": {}}
    allowed = SETS_BY_MODE.get(cfg.data.mode, list(EVAL_MODULES))

    # every condition that silently disables the one-dispatch fused eval path
    # says WHY, once per run — on heterogeneous datasets the user would
    # otherwise quietly lose the headline eval optimization
    warned_fallbacks: set = set()
    log = logging.getLogger(__name__)

    def _warn_fallback(reason: str, msg: str, *args) -> None:
        if reason in warned_fallbacks:
            return
        warned_fallbacks.add(reason)
        log.warning(
            "eval.fused_dispatch is on but " + msg +
            " — falling back to the separate-dispatch eval path.", *args,
        )

    sets = [s for s in cfg.data.testsets if s in allowed]
    for setname in sets:
        # 'IXI' is the healthy hold-out (FPR-quantile thresholds on the val
        # stage, ref utils_eval.py:289-297); lesion sets come from EVAL_MODULES
        if setname == "IXI":
            module = IXI(cfg.data, fold=fold)
        else:
            module = EVAL_MODULES[setname](cfg.data, fold)
        threshold = None
        for stage in ("val", "test"):
            ds = module.val_eval() if stage == "val" else module.test_eval()
            session = EvalSession(
                cfg.eval, setname, stage,
                threshold=threshold if stage == "test" else None,
                logger=logger,
            )
            # three-stage pipeline: volume i+1 loads on reader threads (native
            # NIfTI reads release the GIL) and volume i's host-side metrics run
            # on a scorer thread WHILE volume i+1 reconstructs on device —
            # per-volume wall-clock becomes max(reconstruct, metrics), not sum
            from concurrent.futures import ThreadPoolExecutor

            from .native.binding import PrefetchLoader

            # pre-upload subject arrays from the loader threads so the async
            # H2D transfers overlap the previous group's device compute
            # (EvalConfig.preupload; measured 31% of the dispatch on a
            # degraded link). The device twins live under '_dev' — every
            # decision / host-binarization path keeps the original numpy.
            preupload = (
                cfg.eval.preupload
                and cfg.data.preprocess_backend != "device"
                and not cfg.eval.save_output_images
            )

            def _load(i):
                sub = ds[i]
                if preupload:
                    sub = dict(sub)
                    sub["_dev"] = {
                        k: jax.device_put(v)
                        for k in ("vol", "vol_orig", "mask_orig", "seg_orig")
                        if isinstance(v := sub.get(k), np.ndarray)
                    }
                return sub

            def _dev(sub, k):
                return sub.get("_dev", {}).get(k, sub.get(k))

            loader = PrefetchLoader(
                range(len(ds)), _load,
                num_threads=max(1, int(cfg.eval.loader_threads)),
                prefetch=max(1, int(cfg.eval.loader_prefetch)),
            )
            # UAD_EVAL_TIMING=1: per-stage phase breakdown (loader wait /
            # recon dispatch / scorer backpressure / test_step / test_end)
            # printed to stderr — the knob the e2e wall-clock profiling uses
            timing = os.environ.get("UAD_EVAL_TIMING", "") not in ("", "0")
            import time as _t

            ph = {"load": 0.0, "recon": 0.0, "wait": 0.0, "step": []}

            def _timed_step(*a, **kw):
                t0 = _t.perf_counter()
                session.test_step(*a, **kw)
                ph["step"].append(_t.perf_counter() - t0)

            n_workers = max(1, int(cfg.eval.scorer_threads))
            group_n = max(1, int(cfg.eval.volumes_per_call))
            # one-dispatch reconstruct+score (EvalConfig.fused_dispatch):
            # grouped volumes run reco -> residual -> metrics as ONE device
            # program with ONE packed group fetch. Per-group fallbacks below
            # keep host-path volumes / mixed shapes on the separate path.
            # On a mesh the group axis is volume-parallel (each device scores
            # whole volumes), which needs the group to divide by the mesh —
            # e.g. volumes_per_call=16 on a v5e-8 keeps every chip at the
            # measured-best batch-576 UNet layout
            n_mesh = 1 if mesh is None else int(mesh.devices.size)
            fused_dispatch_ok = (
                cfg.eval.fused_dispatch
                and group_n % n_mesh == 0
                and not cfg.eval.save_output_images
            )
            if cfg.eval.fused_dispatch and group_n % n_mesh != 0:
                _warn_fallback(
                    "mesh",
                    "eval.volumes_per_call=%d does not divide by the "
                    "%d-device mesh (set it to a mesh multiple, e.g. %d)",
                    group_n, n_mesh, 2 * n_mesh,
                )
            if cfg.eval.fused_dispatch and cfg.eval.save_output_images:
                _warn_fallback(
                    "save_images",
                    "eval.save_output_images needs the full volumes on host",
                )
            from .eval.fused import parse_packed
            from .eval.harness import FUSED_MIN_VOXELS

            with ThreadPoolExecutor(max_workers=n_workers) as scorer:
                pending: list = []
                score_fn = getattr(task, "anomaly_scores", None)

                def _submit(i, sub, reco, raux, t1):
                    while len(pending) >= n_workers:
                        pending.pop(0).result()
                    ph["wait"] += _t.perf_counter() - t1
                    # volumes above the fused-scoring gate consume orig/mask
                    # on device: hand them the pre-uploaded twins (the host
                    # path below the gate binarizes on host numpy — keep the
                    # originals there)
                    fused_vol = sub["vol_orig"].size > FUSED_MIN_VOXELS
                    seg_avail = bool(sub.get("seg_available", True))
                    pending.append(scorer.submit(
                        _timed_step if timing else session.test_step,
                        reco,
                        _dev(sub, "vol_orig") if fused_vol else sub["vol_orig"],
                        sub.get("seg_orig") if seg_avail else None,
                        _dev(sub, "mask_orig") if fused_vol else sub["mask_orig"],
                        batch_idx=i,
                        ID=sub.get("ID", str(i)),
                        label_vol=sub.get("label", 0),
                        # device scalars; the scorer thread fetches them
                        aux={"loss": raux["loss"], "latent": raux["latent"],
                             "score_fn": score_fn},
                        seg_dev=(
                            _dev(sub, "seg_orig")
                            if fused_vol and seg_avail else None
                        ),
                    ))

                def _score_group(group, diff_g, packed_g, flags, llen):
                    """Scorer-thread body of the fused dispatch: ONE packed
                    D2H fetch for the group, then per-volume recording."""
                    statics = flags["statics"]
                    done = 0
                    try:
                        buf = np.asarray(packed_g)  # blocks on the program
                        for j, (i, sub) in enumerate(group):
                            t0 = _t.perf_counter()
                            seg_orig = sub.get("seg_orig")
                            # honest per-volume flag: a lesion-set subject
                            # with no seg file must be recorded as seg-less
                            # (matching the host path's data_seg=None
                            # handling), not scored "against" the zeros
                            # placeholder volume as if it were a real seg
                            seg_avail = bool(sub.get("seg_available", True))
                            parsed = parse_packed(
                                buf[j], tuple(sub["vol_orig"].shape), llen,
                                statics["pack_seg"], statics["pack_maps"],
                            )
                            session.test_step_precomputed(
                                parsed, diff_g[j], flags,
                                seg_available=seg_avail,
                                batch_idx=i,
                                ID=sub.get("ID", str(i)),
                                label_vol=sub.get("label", 0),
                                score_fn=score_fn,
                                data_seg=(
                                    seg_orig
                                    if seg_avail
                                    and isinstance(seg_orig, np.ndarray)
                                    else None
                                ),
                                seg_dev=_dev(sub, "seg_orig"),
                            )
                            done = j + 1
                            if timing:
                                ph["step"].append(_t.perf_counter() - t0)
                    except BaseException:
                        for i, _ in group[done:]:
                            session._abort_turn(int(i))
                        raise

                def _group_keys(group):
                    """[G, 2] per-volume keys, tail-padded with the last
                    member's key (its duplicate reconstruction is discarded)."""
                    idxs = [i for i, _ in group]
                    idxs += [idxs[-1]] * (group_n - len(idxs))
                    return fold_keys(key, np.asarray(idxs, np.int32))

                def _dispatch_fused(group):
                    subs = [s for _, s in group]
                    t0 = _t.perf_counter()
                    flags = session._fused_flags(
                        tuple(subs[0]["vol_orig"].shape),
                        seg_is_host=isinstance(
                            subs[0].get("seg_orig"), np.ndarray
                        ),
                    )
                    # the dispatch consumes the pre-uploaded device twins;
                    # decisions above used the original host arrays
                    devs = [dict(s, **s.get("_dev", {})) for s in subs]
                    padded = devs + [devs[-1]] * (group_n - len(devs))
                    diff_g, packed_g = recon.batch_call_scored(
                        variables, padded, _group_keys(group), flags,
                    )
                    llen = recon.latent_len(variables, subs[0]["vol"], key)
                    t1 = _t.perf_counter()
                    ph["recon"] += t1 - t0
                    while len(pending) >= n_workers:
                        pending.pop(0).result()
                    ph["wait"] += _t.perf_counter() - t1
                    pending.append(scorer.submit(
                        _score_group, group, diff_g, packed_g, flags, llen,
                    ))

                def _group_fusable(group):
                    if not fused_dispatch_ok:
                        return False
                    shapes_o = {tuple(s["vol_orig"].shape) for _, s in group}
                    # .shape only — np.asarray on a device-resident "vol"
                    # would pull the whole volume D2H just to read its shape
                    shapes_v = {tuple(s["vol"].shape) for _, s in group}
                    if len(shapes_o) != 1 or len(shapes_v) != 1:
                        _warn_fallback(
                            "mixed_shapes",
                            "a dispatch group mixes volume shapes "
                            "(orig %s / model %s); heterogeneous-resolution "
                            "datasets keep the separate path per mixed group "
                            "(datamodule.shape_bucket can homogenize them)",
                            sorted(shapes_o), sorted(shapes_v),
                        )
                        return False
                    if int(np.prod(next(iter(shapes_o)))) <= FUSED_MIN_VOXELS:
                        _warn_fallback(
                            "small_volumes",
                            "volumes of shape %s are below the fused-path "
                            "size gate (%d voxels); small volumes score on "
                            "the host where fetch cost is negligible",
                            next(iter(shapes_o)), FUSED_MIN_VOXELS,
                        )
                        return False
                    return True

                def _dispatch(group):
                    # one device program per group. Every volume draws its
                    # noise from fold_in(key, i) — at group_n=1 directly, in
                    # larger groups via the [G, 2] per-volume key stack — so
                    # grouping (the batch-576 UNet layout at group 2) never
                    # moves the metrics. A short TAIL group (dataset size not
                    # a multiple of group_n) is padded by repeating its last
                    # volume so it reuses the full-group compiled program — a
                    # second single-volume executable would cost a whole
                    # extra XLA compile (~60 s on the tunnel) to save one
                    # duplicated reconstruction
                    if _group_fusable(group):
                        return _dispatch_fused(group)
                    t0 = _t.perf_counter()
                    if group_n == 1:
                        i0, sub0 = group[0]
                        res = [recon(variables, _dev(sub0, "vol"),
                                     jax.random.fold_in(key, i0),
                                     return_aux=True)]
                    else:
                        vols = [_dev(s, "vol") for _, s in group]
                        vols += [vols[-1]] * (group_n - len(group))
                        res = recon.batch_call(
                            variables, vols, _group_keys(group),
                        )[: len(group)]
                    t1 = _t.perf_counter()
                    ph["recon"] += t1 - t0
                    for (i, sub), (reco, raux) in zip(group, res):
                        _submit(i, sub, reco, raux, t1)
                        t1 = _t.perf_counter()

                # SHAPE-BUCKETED grouping: volumes group by identical
                # (orig, model) shapes, not raw dataset order, so a
                # heterogeneous-resolution dataset (full-res evaluation,
                # resized_evaluation=false; ref utils_eval.py:24-27) keeps
                # the one-dispatch fused path for every full bucket instead
                # of abandoning it at the first shape change. Out-of-order
                # dispatch is safe: eval_dict rows land in dataset order via
                # the commit reorder buffer (harness._commit_in_order). On a
                # uniform-shape dataset exactly one bucket exists and the
                # dispatch order is today's dataset order. At most
                # (#distinct shapes × group_n) volumes buffer in RAM.
                buckets: dict = {}
                t_mark = _t.perf_counter()
                for i, sub in enumerate(loader):
                    t0 = _t.perf_counter()
                    ph["load"] += t0 - t_mark
                    sig = (
                        tuple(sub["vol_orig"].shape),
                        tuple(sub["vol"].shape),
                    )
                    bucket = buckets.setdefault(sig, [])
                    bucket.append((i, sub))
                    if len(bucket) >= group_n:
                        _dispatch(bucket)
                        buckets[sig] = []
                    t_mark = _t.perf_counter()
                for bucket in buckets.values():
                    if bucket:  # leftover partial buckets, tail-padded
                        _dispatch(bucket)
                t0 = _t.perf_counter()
                for f in pending:
                    f.result()
                ph["wait"] += _t.perf_counter() - t0
            t0 = _t.perf_counter()
            result = session.test_end()
            if timing:
                import sys

                steps = ph["step"] or [0.0]
                with open("/proc/self/statm") as f:
                    rss_gb = int(f.read().split()[1]) * 4096 / 1e9
                print(
                    f"[eval-timing] {setname}/{stage} n={len(ds)} "
                    f"load={ph['load']:.1f}s recon_dispatch={ph['recon']:.1f}s "
                    f"backpressure={ph['wait']:.1f}s "
                    f"step_sum={sum(steps):.1f}s step_max={max(steps):.2f}s "
                    f"test_end={_t.perf_counter() - t0:.1f}s rss={rss_gb:.1f}GB",
                    file=sys.stderr, flush=True,
                )
            if stage == "val":
                threshold = dict(session.threshold) or None
                if threshold is None and session.threshholds_healthy:
                    threshold = {"total": session.threshholds_healthy["thresh_1p"]}
            preds[stage][setname] = result
            logger.log_metrics(summarize(result, f"{stage}/{setname}/fold-{fold}"))

    out_path = os.path.join(cfg.run_dir, f"{fold}_preds_dict.pkl")
    os.makedirs(cfg.run_dir, exist_ok=True)
    with open(out_path, "wb") as f:
        pickle.dump(preds, f)
    return preds


def train(cfg: RunConfig) -> dict:
    """The full run: per-fold fit (unless only_eval) + evaluation."""
    os.makedirs(cfg.run_dir, exist_ok=True)
    cfg.eval.out_dir = cfg.run_dir  # image grids land under <run>/grid
    import math

    n_dev = cfg.n_devices or jax.device_count()
    # the data axis must divide the training batch
    n_dev = math.gcd(cfg.data.batch_size, n_dev)
    mesh = local_mesh(n_dev) if n_dev > 1 else None
    results = {}

    for fold in range(cfg.start_fold, cfg.num_folds):
        active = []
        if cfg.logger.use_csv:
            active.append(CSVLogger(cfg.run_dir, name=f"csv_fold{fold}"))
        if cfg.logger.use_wandb:
            active.append(WandbLogger(
                cfg.run_dir,
                project=cfg.logger.project or f"uad_{cfg.datamodule_name}",
                group=cfg.logger.group or cfg.name,
            ))
        logger = MultiLogger(*active)
        task = build_task(cfg)
        log_hyperparameters(logger, cfg)

        trainer_cfg = cfg.trainer
        trainer_cfg.ckpt_dir = os.path.join(cfg.run_dir, "checkpoints")
        trainer_cfg.seed = cfg.seed
        trainer_cfg.resume = trainer_cfg.resume or cfg.resume_train
        trainer = Trainer(task, trainer_cfg, mesh=mesh, logger=logger)

        init_variables = None
        if cfg.pretrained_encoder and isinstance(task, DDPMTask):
            # SparK -> cDDPM conditioning-encoder surgery (DDPM_2D.py:79-96)
            base = init_state(task, jax.random.PRNGKey(cfg.seed), make_optimizer(task))
            if os.path.isfile(cfg.pretrained_encoder):
                # a reference torch SparK pretrain checkpoint (.ckpt file)
                from .utils.convert_torch import import_reference_spark_encoder

                init_variables = import_reference_spark_encoder(
                    state_variables(base),
                    _load_torch_state_dict(cfg.pretrained_encoder),
                    cfg.model.encoder_backbone,
                )
            else:
                spark_vars = _restore_variables(
                    task, cfg.pretrained_encoder, cfg.checkpoint, fold
                )
                init_variables = import_spark_encoder(
                    state_variables(base), spark_vars
                )

        if cfg.only_eval:
            src_dir = cfg.load_checkpoint or os.path.join(cfg.run_dir, "checkpoints")
            if os.path.isfile(src_dir):
                # a reference torch Lightning checkpoint file: convert in place
                if not isinstance(task, DDPMTask):
                    raise ValueError(
                        "torch .ckpt import supports the cDDPM task family "
                        "(Lightning DDPM_2D checkpoints)"
                    )
                from .utils.convert_torch import convert_reference_ddpm_checkpoint

                variables = convert_reference_ddpm_checkpoint(
                    _load_torch_state_dict(src_dir), task
                )
            else:
                variables = _restore_variables(task, src_dir, cfg.checkpoint, fold)
        else:
            dm = IXI(cfg.data, fold=fold)
            state = trainer.fit(
                dm.train_slices(),
                val_source=dm.val_slices(),
                fold=fold,
                init_variables=init_variables,
            )
            variables = state_variables(jax.device_get(state))

        results[fold] = evaluate(cfg, task, variables, fold, logger, mesh=mesh)
        logger.finish()
    return results
