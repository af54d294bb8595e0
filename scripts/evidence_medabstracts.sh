#!/usr/bin/env bash
# End-to-end evidence run on REAL reference data (BASELINE.md config #1):
# fedavg over text-only MedicalAbstracts clients, mome_small MAT.  The
# reference mount ships only the test csv (medical_tc_test.csv, 2,888 real
# abstracts + its 20,264-token vocab), so the train split is a staged copy
# of it — every token is real clinical text; train and eval overlap, which
# is fine for an infrastructure-convergence target (loss falls, acc1
# climbs well above the 5-class base rates).
#
# Usage: scripts/evidence_medabstracts.sh [R]   (default 10 rounds)
set -e
cd "$(dirname "$0")/.."
R=${1:-10}

SRC=/root/reference/data/medabstract
DATA=/tmp/fedcola_evidence_med/medabstract
mkdir -p $DATA
cp -n $SRC/vocab.txt $SRC/medical_tc_test.csv $DATA/ 2>/dev/null || true
[ -f $DATA/medical_tc_train.csv ] || cp $SRC/medical_tc_test.csv $DATA/medical_tc_train.csv

python main.py --exp_name FedAVG_med --algorithm fedavg \
  --shared_param none --share_scope dataset --colearn_param none \
  --seed 1 --multi-task \
  --datasets MedicalAbstracts MedicalAbstracts --modalities txt txt \
  --data_paths $DATA $DATA \
  --Ks 12 --test_size -1 --split_type diri --cncntrtn 0.5 \
  --model_name mome_small_patch16 --seq_len 40 \
  --eval_type global --eval_every 5 --eval_metrics acc1 f1 \
  --R $R --C 0.25 --E 5 --B 96 --beta1 0 \
  --optimizer AdamW --lr 1e-4 --lr_decay 0.99 --lr_decay_step 1 \
  --criterion CrossEntropyLoss --equal_sampled --eval_batch_size 512 \
  --result_path /tmp/fedcola_evidence_med/result \
  --log_path /tmp/fedcola_evidence_med/log
