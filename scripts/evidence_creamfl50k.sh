#!/usr/bin/env bash
# CreamFL at the COCO-50k workload (VERDICT r4 item 5): the creamfl
# coco.sh line (reference scripts/coco.sh + creamflserver.py:100-126,
# 293-336) against the 50,000-caption / 10,000-image path-backed fixture
# with the full 25k/5k retrieval eval — exercising the public-set
# staging + KD distillation HBM interplay on top of the already-resident
# 2.28 GB train/eval stores (BENCH_NOTES round-4 ledger).  Public set:
# the LAST 500 train annotation ids from the fixture's coco_train_ids.npy
# (exactly the reference recipe — creamflserver.py:107 loads
# coco_train_ids.npy[-num_pub_samples:] against captions_train2014.json,
# scripts/coco.sh:16), pub_batch_size 128 as in the canonical line.
#
# Usage: scripts/evidence_creamfl50k.sh [R]   (default 10 rounds)
set -e
cd "$(dirname "$0")/.."
R=${1:-10}
OUT=/tmp/fedcola_evidence_creamfl50k

CROOT=$(python - <<'EOF'
from fedcola_tpu.data.fixtures import coco_fixture
print(coco_fixture("/tmp/fedcola_coco50k/10000_5000_224", 10000, 5000, 224))
EOF
)
IROOT=$(python - <<'EOF'
from fedcola_tpu.data.fixtures import cifar100_fixture
print(cifar100_fixture("/tmp/fedcola_cifar_fx", 50000, 10000))
EOF
)
TROOT=$(python - <<'EOF'
from fedcola_tpu.data.fixtures import agnews_fixture
print(agnews_fixture("/tmp/fedcola_agnews_fx", 24000, 4000))
EOF
)

IC=12 TC=12 MC=8
python main.py --exp_name CreamFL50k --algorithm creamfl \
  --shared_param none --share_scope dataset --colearn_param none \
  --interintra_weight 1 --kd_weight 1e-7 --no_mm_contrastive \
  --num_pub_samples 500 --pub_batch_size 128 \
  --pub_data_dir $CROOT/all_images/ \
  --pub_anno_path $CROOT/annotations/captions_train2014.json \
  --seed 1 --multi-task \
  --datasets CIFAR100 AG_NEWS Coco Coco \
  --modalities img txt img+txt img+txt \
  --data_paths $IROOT $TROOT $CROOT $CROOT \
  --Ks $IC $TC $MC --test_size -1 --split_type diri --cncntrtn 0.5 \
  --model_name mome_small_patch16 --resize 224 --imnorm \
  --eval_type global --eval_every 5 --eval_metrics acc1 \
  --R $R --Cs 0.25 --E 5 --B 96 --beta1 0 \
  --optimizer AdamW --lr 1e-4 --lr_decay 0.99 --lr_decay_step 1 \
  --criterion CrossEntropyLoss --use_bert_tokenizer \
  --equal_sampled --eval_batch_size 512 \
  --result_path $OUT/result --log_path $OUT/log
echo "[evidence] results under $OUT/result"
