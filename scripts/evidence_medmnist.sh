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

DATA=/tmp/fedcola_evidence_medmnist
mkdir -p $DATA
python - <<'EOF'
import numpy as np
rng = np.random.RandomState(7)
def make(n):
    ys = rng.randint(0, 11, n)
    imgs = (rng.rand(n, 28, 28) * 60).astype(np.uint8)
    for i, y in enumerate(ys):
        r, c = divmod(int(y), 4)
        imgs[i, 2+6*r:2+6*r+6, 2+6*c:2+6*c+6] += 160
    return imgs, ys.astype(np.int64).reshape(-1, 1)
tr_x, tr_y = make(2200); te_x, te_y = make(550)
np.savez("/tmp/fedcola_evidence_medmnist/organcmnist.npz",
         train_images=tr_x, train_labels=tr_y,
         test_images=te_x, test_labels=te_y)
EOF

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
