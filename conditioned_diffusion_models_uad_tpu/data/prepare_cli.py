"""Offline dataset-preparation CLI.

The reference ships shell pipelines (prepare_IXI.sh / prepare_Brats21.sh /
prepare_MSLUB.sh) driving ANTs/HD-BET/SimpleITK stages; this is the framework's
equivalent entry point over data/preprocessing.py:

    python -m conditioned_diffusion_models_uad_tpu.data.prepare_cli \
        --dataset IXI --input /raw/IXI --output $DATA_DIR/Data/IXI \
        [--atlas /path/SRI24.nii.gz] [--threads 4]

Input layout: a directory of NIfTI images (*.nii / *.nii.gz); `--seg-suffix`
pairs segmentation files for lesion datasets (e.g. BraTS `_seg`).
"""
from __future__ import annotations

import argparse
import glob
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", choices=("IXI", "Brats21", "MSLUB"), required=True)
    p.add_argument("--input", required=True, help="directory of raw NIfTI images")
    p.add_argument("--output", required=True)
    p.add_argument("--atlas", default=None,
                   help="atlas NIfTI for affine registration (e.g. SRI24)")
    p.add_argument("--seg-suffix", default="_seg",
                   help="suffix marking segmentation files to pair + carry")
    p.add_argument("--threads", type=int, default=4)
    args = p.parse_args(argv)

    from .nifti import read_nifti
    from .preprocessing import DATASET_STAGES, prepare_subject
    from ..native.binding import PrefetchLoader

    import dataclasses

    cfg = DATASET_STAGES[args.dataset]
    atlas = None
    if args.atlas:
        atlas, _ = read_nifti(args.atlas)
        cfg = dataclasses.replace(cfg, register=True)

    imgs = sorted(
        f for f in glob.glob(os.path.join(args.input, "*.nii*"))
        if args.seg_suffix not in os.path.basename(f)
    )
    if not imgs:
        print(f"no NIfTI images found in {args.input}", file=sys.stderr)
        return 1

    def seg_for(img):
        base = img
        for ext in (".nii.gz", ".nii"):
            if base.endswith(ext):
                base = base[: -len(ext)]
                cand = f"{base}{args.seg_suffix}{ext}"
                if os.path.exists(cand):
                    return cand
        return None

    def run_one(img):
        out = prepare_subject(img, args.output, cfg, atlas=atlas,
                              seg_path=seg_for(img))
        return img, out

    done = 0
    for img, out in PrefetchLoader(imgs, run_one, num_threads=args.threads):
        done += 1
        print(f"[{done}/{len(imgs)}] {os.path.basename(img)} -> {out['img']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
