#!/usr/bin/env bash
# On-chip dress rehearsal of the real product path (VERDICT r3 item 2b):
# `run.py experiment=cDDPM/DDPM_cond_spark_2D` at FLAGSHIP size on synthetic
# data for a few epochs — verifies checkpoints/CSV/preds land and that the
# steady-state s/step matches the train-roofline table (PARITY.md).
#
# Usage: tools/dress_rehearsal.sh [data_dir] [log_dir] [epochs]
set -euo pipefail
DATA_DIR="${1:-/tmp/rehearsal_data}"
LOG_DIR="${2:-/tmp/rehearsal_logs}"
EPOCHS="${3:-10}"
cd "$(dirname "$0")/.."

if [ ! -d "$DATA_DIR/Data" ]; then
  python - "$DATA_DIR" <<'EOF'
import sys
from conditioned_diffusion_models_uad_tpu.data.synthetic import build_synthetic_root
# 64 train volumes at flagship acquisition size (192x192x100 -> model 96x96)
# give 2 full batch-32 steps per epoch; 2 val volumes keep the val-loss /
# checkpoint-selection path running every epoch
build_synthetic_root(sys.argv[1], shape=(192, 192, 100), n_train=64, n_val=2,
                     n_test=2, n_eval=2)
print("flagship fixture built:", sys.argv[1])
EOF
fi

DATA_DIR="$DATA_DIR" LOG_DIR="$LOG_DIR" exec python -u run.py \
  experiment=cDDPM/DDPM_cond_spark_2D name=rehearsal \
  "trainer.max_epochs=$EPOCHS" trainer.check_val_every_n_epoch=1 \
  datamodule.batch_size=32
