#!/usr/bin/env bash
# End-to-end evidence run for the MedMNIST family (D7): the ct flag must
# select the organcmnist subset (medmnist.py:11-17 data_flag_dict maps
# ct/img->organcmnist) and --reduce_samples_cls_scale must truncate train
# when --reduce_samples is disabled (medmnist.py:34-40 elif chain — the
# default reduce_samples=50000 shadows the scale branch upstream too).
#
# The reference mount ships no medmnist npz, so the fixture is synthetic
# but LEARNABLE (class-specific bright patch + noise): convergence well
# above the 9.1% 11-class chance is the pass signal, and the run drives
# the REAL npz reader + flag plumbing, not the synthetic fallback.
#
# Usage: scripts/evidence_medmnist.sh [R]   (default 4 rounds)
set -e
cd "$(dirname "$0")/.."
R=${1:-4}

DATA=$(python - <<'EOF'
from fedcola_tpu.data.fixtures import medmnist_fixture
print(medmnist_fixture("/tmp/fedcola_evidence_medmnist", 2200, 550))
EOF
)

COMMON="--multi-task --seed 5 \
  --datasets MedMNIST MedMNIST --modalities ct ct \
  --data_paths $DATA $DATA \
  --Ks 4 --Cs 1.0 --test_size -1 --split_type iid \
  --model_name mome_test_patch16_32 --algorithm fedavg --eval_type global \
  --eval_every 2 --R $R --E 1 --B 16 --optimizer AdamW --lr 1e-3 \
  --resize 32 --compute_dtype float32 --equal_sampled"

# full train set (reference-default reduce_samples=50000 is a no-op at n=2200)
python main.py --exp_name MedMNIST_ct $COMMON \
  --result_path /tmp/medmnist_ev/full --log_path /tmp/medmnist_ev/full_log

# the cls_scale branch: reachable only with reduce_samples disabled
# (elif, medmnist.py:37) — LOAD must report 1100 train
python main.py --exp_name MedMNIST_ct_half $COMMON \
  --reduce_samples -1 --reduce_samples_cls_scale 0.5 \
  --result_path /tmp/medmnist_ev/half --log_path /tmp/medmnist_ev/half_log
