"""Anomaly-detection evaluation harness: per-volume scoring + aggregation.

Capability parity with the reference's model-agnostic eval mixin
(reference: src/utils/utils_eval.py):

* ``get_eval_dictionary``  — the ~90-key result schema             (ref :324-445)
* ``EvalSession.test_step``— per-volume pipeline: residual → brain-mask
  erosion → 3D median → pixel AUROC/AUPRC → greedy threshold search (val) or
  val-derived threshold (test) → connected-component filter → Dice, confusion
  stats, Hausdorff → per-slice metrics → slice/sample anomaly scores
                                                                    (ref :18-194)
* ``EvalSession.test_end`` — nan-mean/std aggregation; val-stage global
  threshold fit over pooled residuals (lesion sets) or FPR-quantile thresholds
  (healthy sets)                                                    (ref :196-297)
* ``log_images``           — 4-panel grid (orig/reco/residual/seg) every 10th
  slice, saved under <out_dir>/grid                                 (ref :586-628)

The device↔host split (SURVEY.md §7): the residual/erosion/median chain and
the masked slice means run fused on device (`postprocess.py`); the
data-dependent parts (ROC sorting, connected components, greedy search,
Hausdorff) run on host numpy over the small [H,W,D] volume.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import metrics as M
from . import postprocess as P
from .fused import parse_packed, volume_eval_program

HEALTHY_SETS = ("IXI",)

# volumes above this voxel count score through the ONE-dispatch fused device
# program (ONE packed fetch); smaller ones take the host/sklearn path
# (fetch cost is negligible and tiny-array device sorts are not worth a
# compile). Tests lower this to force the fused path on small fixtures.
FUSED_MIN_VOXELS = 100_000


def get_eval_dictionary() -> dict:
    """The reference's eval-result schema (utils_eval.py:324-445). Keys that
    belong to dead reference paths (KLD/gradELBO/age) are kept so downstream
    consumers of the pickled dict see the same shape."""
    keys_lists = [
        "IDs", "x", "reconstructions", "diffs", "diffs_volume", "Segmentation",
        "reconstructionTimes", "latentSpace", "Age", "AgeGroup",
        "l1reconstructionErrors", "l1recoErrorAll", "l1recoErrorUnhealthy",
        "l1recoErrorHealthy", "l2recoErrorAll", "l2recoErrorUnhealthy",
        "l2recoErrorHealthy", "l2reconstructionErrors",
        "HausPerVol", "TPPerVol", "FPPerVol", "FNPerVol", "TNPerVol",
        "TPRPerVol", "FPRPerVol", "TPTotal", "FPTotal", "FNTotal", "TNTotal",
        "TPRTotal", "FPRTotal", "PrecisionPerVol", "RecallPerVol",
        "PrecisionPerSlice", "RecallPerSlice", "lesionSizePerSlice",
        "lesionSizePerVol", "Dice", "DiceScorePerSlice", "DiceScorePerVol",
        "BestDicePerVol", "BestThresholdPerVol", "AUCPerVol", "AUPRCPerVol",
        "SpecificityPerVol", "AccuracyPerVol",
        "TPgradELBO", "FPgradELBO", "FNgradELBO", "TNgradELBO",
        "TPRgradELBO", "FPRgradELBO", "DicegradELBO", "DiceScorePerVolgradELBO",
        "BestDicePerVolgradELBO", "BestThresholdPerVolgradELBO",
        "AUCPerVolgradELBO", "AUPRCPerVolgradELBO", "KLD_to_learned_prior",
        "AUCAnomalyCombPerSlice", "AUPRCAnomalyCombPerSlice",
        "AnomalyScoreCombPerSlice", "AUCAnomalyKLDPerSlice",
        "AUPRCAnomalyKLDPerSlice", "AnomalyScoreKLDPerSlice",
        "AUCAnomalyRecoPerSlice", "AUPRCAnomalyRecoPerSlice",
        "AnomalyScoreRecoPerSlice", "AnomalyScoreRecoBinPerSlice",
        "AnomalyScoreAgePerSlice", "AUCAnomalyAgePerSlice",
        "AUPRCAnomalyAgePerSlice", "labelPerSlice", "labelPerVol",
        "AnomalyScoreCombPerVol", "AnomalyScoreCombiPerVol",
        "AnomalyScoreCombMeanPerVol", "AnomalyScoreRegPerVol",
        "AnomalyScoreRegMeanPerVol", "AnomalyScoreRecoPerVol",
        "AnomalyScoreCombPriorPerVol", "AnomalyScoreCombiPriorPerVol",
        "AnomalyScoreAgePerVol", "AnomalyScoreRecoMeanPerVol",
        "DiceScoreKLPerVol", "DiceScoreKLCombPerVol", "BestDiceKLCombPerVol",
        "BestDiceKLPerVol", "AUCKLCombPerVol", "AUPRCKLCombPerVol",
        "AUCKLPerVol", "AUPRCKLPerVol", "TPKLCombPerVol", "FPKLCombPerVol",
        "TNKLCombPerVol", "FNKLCombPerVol", "TPRKLCombPerVol", "FPRKLCombPerVol",
        "TPKLPerVol", "FPKLPerVol", "TNKLPerVol", "FNKLPerVol", "TPRKLPerVol",
        "FPRKLPerVol",
    ]
    d = {k: [] for k in keys_lists}
    d.update(
        {
            "l1reconstructionErrorMean": 0.0,
            "l1reconstructionErrorStd": 0.0,
            "l2reconstructionErrorMean": 0.0,
            "l2reconstructionErrorStd": 0.0,
        }
    )
    return d


@dataclasses.dataclass
class EvalConfig:
    """Knobs of the eval chain (reference cfg.* reads in utils_eval.py)."""

    resized_evaluation: bool = True
    new_size: Sequence[int] = (160, 190, 160)
    residualmode: str = "l1"
    erode_brainmask: bool = True
    median_filtering: bool = True
    kernelsize_median: int = 5
    eval_seg: bool = True
    threshold: str = "auto"  # 'auto' or a float
    cc_min_size: int = 8  # drop components <= 7 voxels (ref :500)
    # 'host' = scipy label on the fetched map (reference-identical library);
    # 'device' = label-propagation CC inside the fused program (eval/cc.py,
    # same partition; host never runs scipy) — only affects the fused path
    cc_backend: str = "host"
    # 'host' = bbox-cropped scipy distance transforms (fast for small
    # lesions); 'device' = exact separable squared-EDT on the accelerator
    # (eval/hausdorff.py — ms-flat regardless of lesion extent, two scalar
    # fetches). Identical values (squared distances are f32-exact integers)
    hausdorff_backend: str = "host"
    # HBM budget for the val-stage pooled residuals (fused path). Up to this
    # many MB the exact concatenated pool + one-dispatch greedy fit is used;
    # beyond it pooling switches to O(1)-memory value histograms
    # (metrics.find_best_val_hist) so arbitrarily many/large val volumes
    # cannot OOM the device. 0 forces histograms from the first volume.
    pool_device_budget_mb: int = 2048
    save_output_images: bool = False
    save_to_disc: bool = True
    use_postprocessed_score: bool = True
    out_dir: str = "."
    # volumes scored concurrently with device reconstruction of later volumes;
    # test_step commits atomically, so >1 worker is safe. Default 2: even on a
    # single-core host the host-side residue (CC filter, Hausdorff) of volume
    # i overlaps volume i+1's device wait (numpy/scipy release the GIL)
    scorer_threads: int = 2
    # eval subject loader: reader threads (native NIfTI reads release the
    # GIL) and volumes buffered ahead of reconstruction
    loader_threads: int = 2
    loader_prefetch: int = 2
    # volumes reconstructed per device dispatch (eval.volumes_per_call=2 runs
    # the UNet at the measured-best batch-576 layout and halves dispatch round
    # trips). Every group member draws its noise from its OWN
    # fold_in(key, volume_idx) key inside the grouped program, so this is a
    # pure dispatch-layout knob: metrics are identical at 1, 2, or 16
    volumes_per_call: int = 1
    # pre-upload each eval subject's arrays (vol/orig/mask/seg) to the device
    # from the LOADER threads (host-preprocess mode only): the async H2D
    # transfers then ride behind the previous group's device compute instead
    # of serializing into the dispatch. Measured: upload is ~31% of the fused
    # group dispatch on a degraded link (0.24 s of 0.77 s at 42 MB/s H2D),
    # ~2% on a nominal 1.2 GB/s link. Host copies are kept for every
    # decision/binarization path, so results are identical.
    preupload: bool = True
    # chain the scoring program onto the reconstruction dispatch: ONE device
    # program + ONE packed fetch per volume group instead of 1 + G dispatches
    # and G fetches (bit-identical results — the same programs, chained).
    # On a multi-device mesh the group axis is volume-parallel (each device
    # scores whole volumes locally) and needs volumes_per_call to be a
    # multiple of the mesh size. Auto-falls-back to separate dispatches for
    # host-path volumes (below FUSED_MIN_VOXELS), mixed-shape groups,
    # save_output_images, or a group that does not divide by the mesh
    fused_dispatch: bool = True

    def __post_init__(self):
        for knob in ("cc_backend", "hausdorff_backend"):
            v = getattr(self, knob)
            if v not in ("host", "device"):
                raise ValueError(
                    f"{knob} must be 'host' or 'device', got {v!r}"
                )


class EvalSession:
    """One val or test pass over a dataset: call `test_step` per volume, then
    `test_end`. Mirrors the reference mixin state (self.eval_dict,
    self.diffs_list/seg_list accumulation, self.threshold handoff)."""

    def __init__(
        self,
        cfg: EvalConfig,
        dataset_name: str,
        stage: str,  # 'val' | 'test'
        threshold: Optional[dict] = None,  # val-fit threshold for the test stage
        logger=None,  # optional: saved image grids are pushed via log_image
    ):
        self.cfg = cfg
        self.dataset = dataset_name
        self.stage = stage
        self.logger = logger
        self.eval_dict = get_eval_dictionary()
        self.threshold = dict(threshold) if threshold else {}
        self.threshholds_healthy: dict = {}
        self._diffs_list: list = []
        self._seg_list: list = []
        self.is_healthy = dataset_name in HEALTHY_SETS
        # test_step computes into locals and commits atomically AND IN
        # batch_idx ORDER: scorer threads evaluate volumes concurrently, but
        # the eval_dict rows land in dataset order like the reference's
        # serialized loop (so pickled per-volume lists are reproducible and
        # aligned). Callers must pass dense 0-based batch_idx values.
        # Ordering is a REORDER BUFFER, not a blocking turnstile: a volume
        # scored out of order parks its commit closure and returns its thread
        # — shape-bucketed grouping dispatches out of dataset order, and a
        # blocking wait would deadlock a lone scorer worker that received a
        # later-index group first.
        import threading

        self._commit_cv = threading.Condition()
        self._commit_turn = 0
        self._ready: dict = {}  # batch_idx -> parked commit closure
        self._aborted: set = set()
        self._pool_bytes = 0
        self._hist = None  # (hist_pos, hist_neg) once the pool budget is hit

    # ------------------------------------------------------------------ #
    def _hausdorff(self, pred: np.ndarray, target: np.ndarray) -> float:
        if self.cfg.hausdorff_backend == "device":
            from .hausdorff import hausdorff_distance_device

            return hausdorff_distance_device(pred, target)
        return M.hausdorff_distance(pred, target)

    # ------------------------------------------------------------------ #
    def _record_volume_scores(self, rec, aux, vol_score, label_vol) -> None:
        """Model-forward scalars + sample-wise anomaly scores, shared by the
        host and fused step paths (ref DDPM_2D.py:214-223,267-280 and
        utils_eval.py:185-194)."""
        cfg = self.cfg
        if aux is not None:
            lat = aux.get("latent")
            if lat is not None:
                rec.append(("latentSpace", "append", np.asarray(lat)))
            loss_v = aux.get("loss")
            if loss_v is not None:
                loss_v = float(np.asarray(loss_v))
                score_fn = aux.get("score_fn") or (
                    lambda l: {k: l for k in
                               ("reco", "reg", "comb", "combi",
                                "comb_prior", "combi_prior")}
                )
                scores = score_fn(loss_v)
                rec.append(("AnomalyScoreRegPerVol", "append", scores["reg"]))
                if not cfg.use_postprocessed_score:
                    # score volumes by the model loss instead of the residual
                    # (ref DDPM_2D.py:276-280)
                    rec.extend([
                        ("AnomalyScoreRecoPerVol", "append", scores["reco"]),
                        ("AnomalyScoreCombPerVol", "append", scores["comb"]),
                        ("AnomalyScoreCombiPerVol", "append", scores["combi"]),
                        ("AnomalyScoreCombPriorPerVol", "append",
                         scores["comb_prior"]),
                        ("AnomalyScoreCombiPriorPerVol", "append",
                         scores["combi_prior"]),
                    ])
        if cfg.use_postprocessed_score:
            for k in ("AnomalyScoreRecoPerVol", "AnomalyScoreCombPerVol",
                      "AnomalyScoreCombiPerVol", "AnomalyScoreCombPriorPerVol",
                      "AnomalyScoreCombiPriorPerVol"):
                rec.append((k, "append", vol_score))
        rec.append(("labelPerVol", "append", int(label_vol)))

    # ------------------------------------------------------------------ #
    def _commit_in_order(self, batch_idx: int, apply_fn) -> None:
        """Deposit this volume's commit closure, then drain every
        consecutively-ready commit in batch_idx order. Non-blocking: if
        earlier turns are still in flight the closure parks in the reorder
        buffer and the calling thread is free — whichever thread deposits
        the missing turn drains the run. The expensive device fetches + host
        metrics stay concurrent; only the closures serialize (under the
        lock, exactly one thread drains at a time)."""
        with self._commit_cv:
            self._ready[batch_idx] = apply_fn
            self._drain_locked()

    def _drain_locked(self) -> None:
        while True:
            if self._commit_turn in self._aborted:
                self._aborted.discard(self._commit_turn)
                self._commit_turn += 1
                continue
            fn = self._ready.pop(self._commit_turn, None)
            if fn is None:
                return
            # advance BEFORE running: a closure that raises must not wedge
            # the buffer (its turn is spent either way, like the old
            # turnstile's finally-advance) — the exception propagates to
            # whichever thread is draining, and the remaining parked
            # commits flow on the next deposit
            self._commit_turn += 1
            fn()

    def _abort_turn(self, batch_idx: int) -> None:
        """A failed test_step must still release its commit slot, or every
        later volume's parked commit would wait forever in the buffer."""
        with self._commit_cv:
            if batch_idx >= self._commit_turn:
                self._aborted.add(batch_idx)
                self._ready.pop(batch_idx, None)
                self._drain_locked()

    def test_step(
        self,
        final_volume: np.ndarray,
        data_orig: np.ndarray,
        data_seg: Optional[np.ndarray],
        data_mask: np.ndarray,
        *,
        batch_idx: int = 0,
        ID: str = "",
        label_vol: int = 0,
        aux: Optional[dict] = None,
        seg_dev=None,
    ) -> None:
        """Score one volume. `batch_idx` is KEYWORD-ONLY: it is the commit
        turnstile's ordering token under concurrent scorer threads
        (_commit_in_order), so the contract must be explicit at call sites.
        `seg_dev` optionally hands the device-resident twin of `data_seg`
        (eval pre-upload): device consumers use it, host binarization keeps
        the numpy `data_seg`."""
        try:
            return self._test_step_impl(
                final_volume, data_orig, data_seg, data_mask,
                batch_idx=batch_idx, ID=ID, label_vol=label_vol, aux=aux,
                seg_dev=seg_dev,
            )
        except BaseException:
            self._abort_turn(int(batch_idx))
            raise

    def _test_step_impl(
        self,
        final_volume: np.ndarray,  # [H, W, D] reconstruction in [0,1]
        data_orig: np.ndarray,  # [H, W, D]
        data_seg: Optional[np.ndarray],  # [H, W, D] or None
        data_mask: np.ndarray,  # [H, W, D]
        *,
        batch_idx: int = 0,
        ID: str = "",
        label_vol: int = 0,
        aux: Optional[dict] = None,  # model-side eval scalars, see below
        seg_dev=None,  # device twin of data_seg (see test_step)
    ) -> None:
        """`aux` carries the model-forward eval scalars the reference's task
        modules record before delegating to _test_step (DDPM_2D.py:214-280,
        Spark_2D.py:86-112): 'loss' (device scalar — the diffusion/MIM eval
        loss), 'latent' (slice-mean conditioning features or None), and
        'score_fn' (task.anomaly_scores: loss -> the AnomalyScore*PerVol
        family used when use_postprocessed_score is off)."""
        cfg = self.cfg
        final_volume = jnp.asarray(final_volume, dtype=jnp.float32)
        if not cfg.resized_evaluation and final_volume.shape != data_orig.shape:
            # full-resolution evaluation: upsample the model-res reconstruction
            # onto the ORIG grid (the reference's new_size constant is replaced
            # by the actual full-res shape — the two must match for the
            # residual, ref utils_eval.py:24-27)
            final_volume = P.resize_trilinear(
                # .shape only — np.asarray on a (possibly pre-uploaded
                # device) orig volume would pull it D2H just to read dims
                final_volume, tuple(data_orig.shape)
            )
        orig = jnp.asarray(data_orig, dtype=jnp.float32)
        mask = jnp.asarray(data_mask, dtype=jnp.float32)
        seg_src = seg_dev if seg_dev is not None else data_seg
        seg = (
            jnp.asarray(seg_src, dtype=jnp.float32)
            if seg_src is not None
            else jnp.zeros_like(mask)
        )

        if orig.size > FUSED_MIN_VOXELS:
            return self._test_step_fused(
                final_volume, orig, mask, seg,
                seg_available=data_seg is not None,
                batch_idx=batch_idx, ID=ID, label_vol=label_vol, aux=aux,
                data_seg=data_seg,
            )

        # all eval_dict mutations are deferred to one atomic commit
        rec: list = []

        # reconstruction errors w.r.t. anomal/normal regions (ref :36-49)
        errs = P.reco_errors(orig, final_volume, seg)
        for k, v in errs.items():
            rec.append((k, "append", float(v)))

        # fused device chain: residual → erosion → median (ref :28-69)
        erode_iters = int(orig.shape[1]) // 25 if cfg.erode_brainmask else 0
        diff = P.postprocess_residual(
            orig,
            final_volume,
            mask,
            residualmode=cfg.residualmode,
            erode_iterations=erode_iters,
            median_kernel=cfg.kernelsize_median if cfg.median_filtering else 1,
        )
        slice_scores = np.asarray(P.slice_anomaly_scores(diff, mask))
        vol_score = float(P.volume_anomaly_score(diff, mask))
        diff_dev = diff  # keep the device residual for the fused metric kernel
        diff = np.asarray(diff)
        # binarize from the ORIGINAL host arrays — no device round trip
        seg_np = (
            np.asarray(data_seg) > 0 if data_seg is not None
            else np.zeros(diff.shape, bool)
        )
        mask_np = np.asarray(data_mask) > 0

        if cfg.save_output_images:
            self._log_images(
                diff, np.asarray(orig), seg_np, mask_np,
                np.asarray(final_volume), ID,
            )

        # --- segmentation metrics (lesion sets only, ref :77-144) -------- #
        if cfg.eval_seg and not self.is_healthy:
            flat_diff = diff.ravel()
            flat_seg = seg_np.ravel()
            if flat_diff.size > 100_000:
                # whole-volume voxel arrays: AUROC + AP + the 10-step greedy
                # threshold search run as ONE fused device program instead of
                # two sklearn passes + 20 host dice evaluations
                AUC, AUPRC, bestDice, bestThresh = M.seg_metrics_device(
                    diff_dev, seg > 0  # both already on device: no re-upload
                )
            else:
                AUC, _, _, _ = M.compute_roc(flat_diff, flat_seg)
                AUPRC, _, _, _ = M.compute_prc(flat_diff, flat_seg)
                bestDice, bestThresh = M.find_best_val(
                    flat_diff, flat_seg, val_range=(0, float(diff.max())),
                    max_steps=10,
                )
            if "test" in self.stage:
                bestThresh = self.threshold["total"]
            th = bestThresh if cfg.threshold == "auto" else float(cfg.threshold)
            thresholded = diff > th
            thresholded = M.filter_3d_connected_components(
                thresholded, min_size=cfg.cc_min_size
            )

            diceScore = M.dice(thresholded, flat_seg)
            TP, FP, TN, FN = M.confusion_counts(thresholded, flat_seg)
            prec, recall, spec, acc = M.precision_recall_specificity_accuracy(
                thresholded, flat_seg
            )
            rec.extend([
                ("lesionSizePerVol", "append", int(flat_seg.sum())),
                ("DiceScorePerVol", "append", diceScore),
                ("BestDicePerVol", "append", bestDice),
                ("BestThresholdPerVol", "append", bestThresh),
                ("AUCPerVol", "append", AUC),
                ("AUPRCPerVol", "append", AUPRC),
                ("TPPerVol", "append", TP),
                ("FPPerVol", "append", FP),
                ("TNPerVol", "append", TN),
                ("FNPerVol", "append", FN),
                ("TPRPerVol", "append", M.tpr(thresholded, flat_seg)),
                ("FPRPerVol", "append", M.fpr(thresholded, flat_seg)),
                ("IDs", "append", ID),
                ("AccuracyPerVol", "append", acc),
                ("PrecisionPerVol", "append", prec),
                ("RecallPerVol", "append", recall),
                ("SpecificityPerVol", "append", spec),
                ("HausPerVol", "append", M.hausdorff_distance(thresholded, seg_np)),
            ])

            # per-slice metrics on lesion slices (ref :137-144); depth is the
            # LAST axis here (reference iterates the first axis of its
            # permuted volume — same set of slices). Vectorized over depth:
            # per-slice TP/FP/FN via axis reductions instead of a python loop.
            pred_all = diff > bestThresh
            seg_sz = seg_np.sum(axis=(0, 1))
            lesion = seg_sz > 0
            tp_s = (pred_all & seg_np).sum(axis=(0, 1)).astype(np.float64)
            fp_s = (pred_all & ~seg_np).sum(axis=(0, 1)).astype(np.float64)
            fn_s = ((~pred_all) & seg_np).sum(axis=(0, 1)).astype(np.float64)
            pred_sz = tp_s + fp_s
            with np.errstate(divide="ignore", invalid="ignore"):
                dice_s = np.where(
                    pred_sz + seg_sz > 0, 2 * tp_s / (pred_sz + seg_sz), np.nan
                )
                prec_s = np.where(pred_sz > 0, tp_s / pred_sz, 0.0)
                rec_s = np.where(tp_s + fn_s > 0, tp_s / (tp_s + fn_s), 0.0)
            rec.extend([
                ("DiceScorePerSlice", "extend", dice_s[lesion].tolist()),
                ("PrecisionPerSlice", "extend", prec_s[lesion].tolist()),
                ("RecallPerSlice", "extend", rec_s[lesion].tolist()),
                ("lesionSizePerSlice", "extend", seg_sz[lesion].astype(int).tolist()),
            ])


        # slice-wise anomaly scores + labels (ref :154-183)
        if diff.ndim != 2:
            slice_labels = [
                int(seg_np[..., s].any()) for s in range(seg_np.shape[-1])
            ]
            if not self.is_healthy:
                AUC_s, _, _, _ = M.compute_roc(slice_scores, np.array(slice_labels))
                AUPRC_s, _, _, _ = M.compute_prc(slice_scores, np.array(slice_labels))
                rec.extend([
                    ("AUCAnomalyRecoPerSlice", "append", AUC_s),
                    ("AUPRCAnomalyRecoPerSlice", "append", AUPRC_s),
                    ("labelPerSlice", "extend", slice_labels),
                    ("AnomalyScoreRecoPerSlice", "extend", slice_scores.tolist()),
                ])

        self._record_volume_scores(rec, aux, vol_score, label_vol)

        # --- ordered atomic commit: one volume's rows land together, in
        # dataset order ----------------------------------------------------- #
        def _apply():
            for k, mode, v in rec:
                getattr(self.eval_dict[k], mode)(v)
            if "val" in self.stage:  # pooling for the global threshold fit
                self._diffs_list.append(diff.ravel())
                self._seg_list.append(seg_np.ravel().astype(np.int8))

        self._commit_in_order(batch_idx, _apply)

    # ------------------------------------------------------------------ #
    def _log_images(self, diff, orig, seg_np, mask_np, reco, ID) -> None:
        """Save the 4-panel grids and push them to the logger (the reference
        logs every grid figure to wandb, utils_eval.py:627)."""
        paths = log_images(
            self.cfg, diff, orig, seg_np, mask_np, reco, ID, self.dataset,
        )
        if self.logger is not None and hasattr(self.logger, "log_image"):
            for p in paths:
                self.logger.log_image(f"{self.dataset}/{self.stage}/grid", p)

    # ------------------------------------------------------------------ #
    def _fused_flags(self, orig_shape, seg_is_host: bool) -> dict:
        """The static/threshold configuration of the fused scoring program for
        this session's stage — shared by the in-step dispatch below and the
        one-dispatch-per-group reconstruct+score path (orchestrate)."""
        cfg = self.cfg
        eval_seg = cfg.eval_seg and not self.is_healthy
        th_record = float("nan")
        th_apply = float("nan")
        if eval_seg:
            if "test" in self.stage:
                th_record = float(self.threshold["total"])
            if cfg.threshold != "auto":
                th_apply = float(cfg.threshold)
        # cc_min_size <= 0 means no filtering at all — the fused program then
        # computes neither the filtered map nor the confusion counts, so fall
        # back to the host-map path in that (degenerate) configuration
        cc_on_device = cfg.cc_backend == "device" and cfg.cc_min_size > 0
        hd_in_program = (
            eval_seg and cc_on_device and cfg.hausdorff_backend == "device"
        )
        # the binary maps only need to reach the host when a map consumer
        # runs there (scipy CC filter or bbox Hausdorff); with both on device
        # the confusion-count scalars replace them and the fetch shrinks to
        # the scalar/per-slice/latent block
        maps_needed = eval_seg and (not cc_on_device or not hd_in_program)
        # seg volumes that live on device (preprocess_backend='device') come
        # back inside the same packed fetch, bit-packed; host-resident ones
        # never cross the link at all
        pack_seg = maps_needed and not seg_is_host
        return {
            "th_record": th_record,
            "th_apply": th_apply,
            "statics": dict(
                residualmode=cfg.residualmode,
                erode_iterations=(
                    int(orig_shape[1]) // 25 if cfg.erode_brainmask else 0
                ),
                median_kernel=(
                    cfg.kernelsize_median if cfg.median_filtering else 1
                ),
                eval_seg=eval_seg,
                cc_min_size=cfg.cc_min_size if cc_on_device else 0,
                pack_seg=pack_seg,
                with_hausdorff=hd_in_program,
                pack_maps=maps_needed,
            ),
        }

    def _test_step_fused(
        self,
        final_volume,  # device [H, W, D] f32
        orig,  # device [H, W, D] f32
        mask,  # device [H, W, D] f32
        seg,  # device [H, W, D] f32 (zeros when unavailable)
        *,
        seg_available: bool,
        batch_idx: int,
        ID: str,
        label_vol: int,
        aux: Optional[dict],
        data_seg=None,  # the CALLER's seg: host numpy in host-preprocess mode
    ) -> None:
        """Large-volume scoring through `volume_eval_program`: one device
        dispatch, ONE packed D2H fetch (scalars + Hausdorff + eval loss +
        latent + per-slice reductions + bit-packed threshold/seg maps), the
        residual kept on device for the val-stage threshold pooling. Produces
        the same eval_dict rows as the host path (parity-tested)."""
        cfg = self.cfg
        flags = self._fused_flags(
            tuple(orig.shape),
            seg_is_host=not seg_available or isinstance(data_seg, np.ndarray),
        )
        # seg_available=False means data_seg is None (zeros volume): nothing
        # to pack — treat as host-resident for the pack_seg decision
        have_loss = aux is not None and aux.get("loss") is not None
        have_latent = aux is not None and aux.get("latent") is not None
        aux_loss = (
            jnp.asarray(aux["loss"], jnp.float32)
            if have_loss
            else jnp.float32(jnp.nan)
        )
        aux_latent = (
            jnp.asarray(aux["latent"], jnp.float32)
            if have_latent
            else jnp.zeros((0,), jnp.float32)
        )

        diff_dev, packed_dev = volume_eval_program(
            orig, final_volume, mask, seg,
            jnp.float32(flags["th_record"]), jnp.float32(flags["th_apply"]),
            aux_loss, aux_latent,
            **flags["statics"],
        )
        parsed = parse_packed(  # the ONE per-volume D2H fetch
            packed_dev, tuple(orig.shape), int(aux_latent.shape[0]),
            flags["statics"]["pack_seg"], flags["statics"]["pack_maps"],
        )
        return self._record_fused(
            parsed, diff_dev, flags,
            orig=orig, mask=mask, seg=seg, final_volume=final_volume,
            seg_available=seg_available, batch_idx=batch_idx, ID=ID,
            label_vol=label_vol, aux=aux, data_seg=data_seg,
        )

    def test_step_precomputed(
        self,
        parsed: dict,  # parse_packed output for this volume
        diff_dev,  # device residual [H, W, D] (val-stage pooling input)
        flags: dict,  # this session's _fused_flags(...)
        *,
        seg_available: bool,
        batch_idx: int,
        ID: str,
        label_vol: int,
        score_fn=None,
        data_seg=None,
        seg_dev=None,  # the seg volume (device or host) for val-stage pooling
    ) -> None:
        """Commit one volume whose scoring program ALREADY ran fused into the
        reconstruction dispatch (one program + one packed fetch per group,
        eval/reconstruct.py::batch_call_scored). Identical recording to
        `test_step`'s fused path."""
        try:
            aux = {"score_fn": score_fn} if score_fn is not None else {}
            # the packed buffer always carries loss/latent slots in this path
            aux["loss"] = parsed["scalars"]["aux_loss"]
            aux["latent"] = (
                parsed["latent"] if parsed["latent"].size else None
            )
            return self._record_fused(
                parsed, diff_dev, flags,
                orig=None, mask=None,
                seg=(
                    seg_dev if seg_dev is not None
                    else jnp.zeros(diff_dev.shape, jnp.float32)
                ),
                final_volume=None,
                seg_available=seg_available, batch_idx=batch_idx, ID=ID,
                label_vol=label_vol, aux=aux, data_seg=data_seg,
            )
        except BaseException:
            self._abort_turn(int(batch_idx))
            raise

    def _record_fused(
        self,
        parsed: dict,
        diff_dev,
        flags: dict,
        *,
        orig,  # device arrays, or None in the precomputed path
        mask,
        seg,
        final_volume,
        seg_available: bool,
        batch_idx: int,
        ID: str,
        label_vol: int,
        aux: Optional[dict],
        data_seg,
    ) -> None:
        cfg = self.cfg
        statics = flags["statics"]
        eval_seg = statics["eval_seg"]
        maps_needed = statics["pack_maps"]
        pack_seg = statics["pack_seg"]
        cc_on_device = statics["cc_min_size"] > 0
        hd_in_program = statics["with_hausdorff"]
        have_loss = aux is not None and aux.get("loss") is not None
        # .size avoids materializing a device latent (no extra D2H here)
        have_latent = (
            aux is not None
            and aux.get("latent") is not None
            and aux["latent"].size > 0
        )
        vol_size = int(np.prod(diff_dev.shape))
        s = parsed["scalars"]
        per_slice = parsed["per_slice"]
        slice_scores = per_slice[:, 0]
        seg_sz = per_slice[:, 1]
        vol_score = s["vol_score"]
        # the packed fetch already carried the aux values — hand the host
        # floats (not device scalars) to the shared recorder below
        if aux is not None:
            aux = dict(aux)
            if have_loss:
                aux["loss"] = s["aux_loss"]
            if have_latent:
                aux["latent"] = parsed["latent"]

        rec: list = [
            (k, "append", s[k])
            for k in ("l1recoErrorAll", "l2recoErrorAll", "l1recoErrorUnhealthy",
                      "l1recoErrorHealthy", "l2recoErrorUnhealthy",
                      "l2recoErrorHealthy")
        ]

        if cfg.save_output_images and orig is not None:
            # opt-in debugging: fetches the images (orchestrate keeps the
            # separate-dispatch path when this is on, so orig is available)
            self._log_images(
                np.asarray(diff_dev), np.asarray(orig),
                np.asarray(seg) > 0, np.asarray(mask) > 0,
                np.asarray(final_volume), ID,
            )

        if eval_seg:
            # connected components + metrics on the CC-filtered map (ref
            # :100-135). With cc_backend='device' the filter already ran
            # inside the fused program and the confusion counts arrived in
            # the scalar block; otherwise the map rode the fetch bit-packed
            # and scipy labels it here
            if maps_needed:
                thresholded = parsed["thresholded"]
                if not cc_on_device:
                    thresholded = M.filter_3d_connected_components(
                        thresholded, min_size=cfg.cc_min_size
                    )
                if pack_seg:
                    # device-resident seg (preprocess_backend=device): it rode
                    # the same packed fetch, 1 bit/voxel
                    seg_np = parsed["seg"]
                elif not seg_available:
                    seg_np = np.zeros(thresholded.shape, bool)
                else:
                    # host-preprocessed subjects: binarize the ORIGINAL host
                    # array — no device round trip
                    seg_np = np.asarray(data_seg) > 0
            if cc_on_device:
                TP, FP, TN, FN = (
                    int(s["tp"]), int(s["fp"]), int(s["tn"]), int(s["fn"])
                )
            else:
                TP, FP, TN, FN = M.confusion_counts(thresholded, seg_np)
            if hd_in_program:
                a, b = s["haus_pt"], s["haus_tp"]
                haus = (
                    float("nan") if (a < 0 or b < 0)
                    else float(np.sqrt(max(a, b)))
                )
            else:
                haus = self._hausdorff(thresholded, seg_np)
            prec = TP / (TP + FP) if (TP + FP) > 0 else 0.0
            recall = TP / (TP + FN) if (TP + FN) > 0 else 0.0
            spec = TN / (TN + FP + 1e-7)
            acc = (TP + TN) / vol_size
            dice_v = (
                2 * TP / (2 * TP + FP + FN)
                if (2 * TP + FP + FN) > 0 else float("nan")
            )
            tpr_v = TP / (TP + FN) if (TP + FN) > 0 else float("nan")
            # reference quirk kept: FPR = FP / (FP + TP) (utils_eval.py:571)
            fpr_v = FP / (FP + TP) if (FP + TP) > 0 else float("nan")
            rec.extend([
                ("lesionSizePerVol", "append", int(s["lesion_size"])),
                ("DiceScorePerVol", "append", dice_v),
                ("BestDicePerVol", "append", s["best_dice"]),
                ("BestThresholdPerVol", "append", s["th_record"]),
                ("AUCPerVol", "append", s["auroc"]),
                ("AUPRCPerVol", "append", s["auprc"]),
                ("TPPerVol", "append", TP),
                ("FPPerVol", "append", FP),
                ("TNPerVol", "append", TN),
                ("FNPerVol", "append", FN),
                ("TPRPerVol", "append", tpr_v),
                ("FPRPerVol", "append", fpr_v),
                ("IDs", "append", ID),
                ("AccuracyPerVol", "append", acc),
                ("PrecisionPerVol", "append", prec),
                ("RecallPerVol", "append", recall),
                ("SpecificityPerVol", "append", spec),
                ("HausPerVol", "append", haus),
            ])

            # per-slice metrics from the device reductions (ref :137-144)
            lesion = seg_sz > 0
            tp_s, fp_s, fn_s = per_slice[:, 2], per_slice[:, 3], per_slice[:, 4]
            pred_sz = tp_s + fp_s
            with np.errstate(divide="ignore", invalid="ignore"):
                dice_s = np.where(
                    pred_sz + seg_sz > 0, 2 * tp_s / (pred_sz + seg_sz), np.nan
                )
                prec_s = np.where(pred_sz > 0, tp_s / pred_sz, 0.0)
                rec_s = np.where(tp_s + fn_s > 0, tp_s / (tp_s + fn_s), 0.0)
            rec.extend([
                ("DiceScorePerSlice", "extend", dice_s[lesion].tolist()),
                ("PrecisionPerSlice", "extend", prec_s[lesion].tolist()),
                ("RecallPerSlice", "extend", rec_s[lesion].tolist()),
                ("lesionSizePerSlice", "extend",
                 seg_sz[lesion].astype(int).tolist()),
            ])

        # slice-wise anomaly scores + labels (ref :154-183)
        slice_labels = (seg_sz > 0).astype(int).tolist()
        if not self.is_healthy:
            AUC_s, _, _, _ = M.compute_roc(slice_scores, np.array(slice_labels))
            AUPRC_s, _, _, _ = M.compute_prc(slice_scores, np.array(slice_labels))
            rec.extend([
                ("AUCAnomalyRecoPerSlice", "append", AUC_s),
                ("AUPRCAnomalyRecoPerSlice", "append", AUPRC_s),
                ("labelPerSlice", "extend", slice_labels),
                ("AnomalyScoreRecoPerSlice", "extend", slice_scores.tolist()),
            ])

        self._record_volume_scores(rec, aux, vol_score, label_vol)

        def _apply():
            for k, mode, v in rec:
                getattr(self.eval_dict[k], mode)(v)
            if "val" in self.stage:
                # pool ON DEVICE: the residual never crosses to host; the
                # global threshold fit runs as one fused device search. Past
                # the HBM budget, fold everything into bounded value
                # histograms instead of retaining raw voxels
                nbytes = diff_dev.size * 4
                budget = int(self.cfg.pool_device_budget_mb) * (1 << 20)
                if self._hist is None and self._pool_bytes + nbytes > budget:
                    self._hist = M.hist_pool_init()
                    for a, s in zip(self._diffs_list, self._seg_list):
                        self._hist = M.hist_pool_update(*self._hist, a, s)
                    self._diffs_list, self._seg_list = [], []
                    self._pool_bytes = 0
                if self._hist is not None:
                    self._hist = M.hist_pool_update(
                        *self._hist, diff_dev.ravel(), (seg > 0).ravel()
                    )
                else:
                    self._diffs_list.append(diff_dev.ravel())
                    self._seg_list.append((seg > 0).ravel())
                    self._pool_bytes += nbytes

        self._commit_in_order(batch_idx, _apply)

    # ------------------------------------------------------------------ #
    def test_end(self) -> dict:
        """Aggregate (nan)mean/std over volumes; fit the val threshold
        (ref _test_end, utils_eval.py:196-297). Returns the eval dict."""
        d = self.eval_dict

        def agg(key, out, nan=True):
            vals = np.asarray(d[key], dtype=np.float64)
            if vals.size == 0:
                d[out + "Mean"], d[out + "Std"] = float("nan"), float("nan")
                return
            mean = np.nanmean(vals) if nan else np.mean(vals)
            std = np.nanstd(vals) if nan else np.std(vals)
            d[out + "Mean"], d[out + "Std"] = float(mean), float(std)

        for key in (
            "l1recoErrorAll", "l2recoErrorAll", "l1recoErrorHealthy",
            "l1recoErrorUnhealthy", "l2recoErrorHealthy", "l2recoErrorUnhealthy",
            "AUPRCPerVol", "AUCPerVol",
        ):
            agg(key, key)
        agg("DiceScorePerVol", "DicePerVol")
        for key in (
            "BestDicePerVol", "BestThresholdPerVol", "PrecisionPerVol",
            "RecallPerVol", "PrecisionPerSlice", "RecallPerSlice",
            "AccuracyPerVol", "SpecificityPerVol",
        ):
            agg(key, key, nan=False)
        for key in ("TPPerVol", "FPPerVol", "TNPerVol", "FNPerVol", "TPRPerVol", "FPRPerVol"):
            agg(key, key)
        haus = np.asarray(d["HausPerVol"], dtype=np.float64)
        haus = haus[np.isfinite(haus)]
        d["HausPerVolMean"] = float(np.nanmean(haus)) if haus.size else float("nan")
        d["HausPerVolStd"] = float(np.nanstd(haus)) if haus.size else float("nan")

        if "val" in self.stage:
            pool_on_device = any(
                not isinstance(a, np.ndarray) for a in self._diffs_list
            )
            if not self.is_healthy and self._hist is not None:
                # bounded histogram pool (budget exceeded during the run)
                bestDice, bestThresh = M.find_best_val_hist(*self._hist)
                self.threshold["total"] = bestThresh
            elif not self.is_healthy and self._diffs_list:
                if pool_on_device or sum(
                    a.size for a in self._diffs_list
                ) > 4_000_000:
                    # pooled fit fully on device: concatenate the (already
                    # device-resident) per-volume residuals and run the greedy
                    # search as ONE fused program — the pool never crosses the
                    # D2H link
                    diffs = jnp.concatenate(
                        [jnp.asarray(a).ravel() for a in self._diffs_list]
                    )
                    segs = jnp.concatenate(
                        [jnp.asarray(a).ravel() for a in self._seg_list]
                    )
                    bestDice, bestThresh = M.find_best_val_device(
                        diffs, segs,
                        val_range=(0, float(diffs.max())), max_steps=10,
                    )
                else:
                    diffs = np.concatenate(self._diffs_list)
                    segs = np.concatenate(self._seg_list).astype(bool)
                    bestDice, bestThresh = M.find_best_val(
                        diffs, segs,
                        val_range=(0, float(diffs.max())), max_steps=10,
                    )
                self.threshold["total"] = bestThresh
            elif self._hist is not None:
                # healthy sets past the pool budget: quantiles from the value
                # histogram (seg is all-zero on healthy sets, so the total
                # value distribution is hist_pos + hist_neg)
                qs = M.quantiles_from_hist(
                    np.asarray(self._hist[0] + self._hist[1]),
                    [0.99, 0.95, 0.90],
                )
                self.threshholds_healthy = {
                    "thresh_1p": qs[0], "thresh_5p": qs[1], "thresh_10p": qs[2],
                }
                d["t_1p"], d["t_5p"], d["t_10p"] = qs
            elif self._diffs_list:
                # healthy sets: FPR-quantile thresholds (ref :289-297)
                if pool_on_device:
                    diffs = jnp.concatenate(
                        [jnp.asarray(a).ravel() for a in self._diffs_list]
                    )
                    # one unstable device sort (jnp.quantile's stable sort
                    # costs ~35x more at pooled sizes; values identical)
                    qs = np.asarray(
                        M.quantiles_device(diffs, (0.99, 0.95, 0.90))
                    )
                else:
                    diffs = np.concatenate(self._diffs_list)
                    qs = np.quantile(diffs, [0.99, 0.95, 0.90])
                self.threshholds_healthy = {
                    "thresh_1p": float(qs[0]),
                    "thresh_5p": float(qs[1]),
                    "thresh_10p": float(qs[2]),
                }
                d["t_1p"] = self.threshholds_healthy["thresh_1p"]
                d["t_5p"] = self.threshholds_healthy["thresh_5p"]
                d["t_10p"] = self.threshholds_healthy["thresh_10p"]
        return d


def log_images(
    cfg: EvalConfig,
    diff_volume: np.ndarray,
    data_orig: np.ndarray,
    data_seg: np.ndarray,
    data_mask: np.ndarray,
    final_volume: np.ndarray,
    ID: str,
    dataset_name: str,
) -> list:
    """4-panel grid (orig / reco / residual-inferno / seg) every 10th slice
    (ref log_images, utils_eval.py:586-628). Returns saved paths."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.colors as colors
    import matplotlib.pyplot as plt

    grid_dir = os.path.join(cfg.out_dir, "grid")
    os.makedirs(grid_dir, exist_ok=True)
    paths = []
    vmax = float(diff_volume.max()) + 0.01
    for j in range(0, diff_volume.shape[-1], 10):
        fig, ax = plt.subplots(1, 4, figsize=(16, 4))
        fig.subplots_adjust(wspace=0.0)
        ax[0].imshow(np.rot90(data_orig[..., j], 3), "gray")
        ax[1].imshow(np.rot90(final_volume[..., j], 3), "gray")
        ax[2].imshow(
            np.rot90(diff_volume[..., j], 3), "inferno",
            norm=colors.Normalize(vmin=0, vmax=vmax),
        )
        ax[3].imshow(np.rot90(data_seg[..., j], 3), "gray")
        for axes in ax:
            axes.set_xticks([])
            axes.set_yticks([])
            for side in ("top", "right", "bottom", "left"):
                axes.spines[side].set_visible(False)
        plt.tight_layout()
        if cfg.save_to_disc:
            p = os.path.join(grid_dir, f"{ID}_{j}_Grid.png")
            plt.savefig(p, bbox_inches="tight")
            paths.append(p)
        plt.close(fig)
    return paths
