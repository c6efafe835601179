#!/usr/bin/env bash
# On-chip end-to-end SparK pretraining measurement (VERDICT r4 #6): run the
# REAL Spark_2D_pretrain product path (run.py -> Trainer epoch_scan) at
# flagship acquisition size and a realistic subject count, TWICE with
# different epoch counts on a warm compile cache, and report the marginal
# s/epoch — the measured product-path number the r4 roofline only inferred
# (it measured the device step at 6,098 slices/s in-scan and *concluded*
# loader-bound without an e2e wall-clock).
#
#   marginal s/epoch = (T_long - T_short) / (E_long - E_short)
#   fixed cost (ingest+stack+upload+dispatch setup) = T_short - E_short * marginal
#
# Usage: tools/spark_pretrain_e2e.sh [data_dir] [log_dir] [n_train]
set -euo pipefail
DATA_DIR="${1:-/tmp/spark_e2e_data}"
LOG_DIR="${2:-/tmp/spark_e2e_logs}"
NTRAIN="${3:-64}"
E_SHORT=4
E_LONG=16
cd "$(dirname "$0")/.."

if [ ! -d "$DATA_DIR/Data" ]; then
  python - "$DATA_DIR" "$NTRAIN" <<'EOF'
import sys
from conditioned_diffusion_models_uad_tpu.data.synthetic import build_synthetic_root
# flagship acquisition size (192x192x100 -> model 96x96); n_train subjects
# approximate the reference IXI fold; the train pool is device-resident and
# filled ONCE, so ingest cost amortizes over all 1200 protocol epochs
build_synthetic_root(sys.argv[1], shape=(192, 192, 100),
                     n_train=int(sys.argv[2]), n_val=2, n_test=2, n_eval=2)
print("fixture built:", sys.argv[1])
EOF
fi

echo "== tunnel probe (record next to the numbers) =="
python tools/tunnel_probe.py

run_once () {
  local epochs="$1" name="$2"
  local t0 t1
  t0=$(date +%s.%N)
  # epochs_per_dispatch=1 pins the PER-EPOCH dispatch path: the marginal
  # cost this protocol isolates. Auto-chunking would fold all epochs into
  # one program whose compiled shape depends on max_epochs — the long run
  # would then include a fresh XLA compile and measure nothing marginal.
  DATA_DIR="$DATA_DIR" LOG_DIR="$LOG_DIR" python -u run.py \
    experiment=cDDPM/Spark_2D_pretrain "name=spark_e2e_${name}" \
    "trainer.max_epochs=${epochs}" trainer.check_val_every_n_epoch=1000 \
    trainer.epochs_per_dispatch=1 \
    datamodule.batch_size=32 > "/tmp/spark_e2e_${name}.log" 2>&1
  t1=$(date +%s.%N)
  echo "$t0 $t1" | awk '{printf "%.1f", $2 - $1}'
}

echo "== warm the compile cache (${E_SHORT} epochs, timing discarded) =="
run_once "$E_SHORT" warm > /dev/null || { tail -5 /tmp/spark_e2e_warm.log; exit 1; }
echo "== short run (${E_SHORT} epochs) =="
T_SHORT=$(run_once "$E_SHORT" short)
echo "T_short(${E_SHORT} ep) = ${T_SHORT}s"
echo "== long run (${E_LONG} epochs) =="
T_LONG=$(run_once "$E_LONG" long)
echo "T_long(${E_LONG} ep) = ${T_LONG}s"

python - "$T_SHORT" "$T_LONG" "$E_SHORT" "$E_LONG" "$NTRAIN" <<'EOF'
import json, sys
ts, tl, es, el, n = float(sys.argv[1]), float(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5])
marginal = (tl - ts) / (el - es)
fixed = ts - es * marginal
print(json.dumps({
    "n_train_subjects": n,
    "marginal_s_per_epoch": round(marginal, 2),
    "fixed_ingest_startup_s": round(fixed, 1),
    "protocol_1200_epochs_h": round((fixed + 1200 * marginal) / 3600, 2),
}))
EOF
