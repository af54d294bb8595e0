#!/usr/bin/env bash
# 30-round convergence runs for the coco.sh FedIoT and FedProx lines
# (reference scripts/coco.sh FedIoT/FedProx rows) on the 1000-image
# path-backed COCO fixture with the learnable CIFAR100/AG_NEWS
# class-signal fixtures — completing the per-algorithm convergence
# evidence: fedavg/fedcola/fedadam/fedyogi/creamfl already have
# long-horizon trajectories (docs/evidence/README.md), these add the
# remaining two canonical lines beyond their 5-round datapoints.
#
# Usage: scripts/evidence_coco_lines30.sh [R]   (default 30)
set -e
cd "$(dirname "$0")/.."
R=${1:-30}
OUT=/tmp/fedcola_evidence_lines30

CROOT=$(python - <<'EOF'
from fedcola_tpu.data.fixtures import coco_fixture
print(coco_fixture("/tmp/fedcola_bench_coco/1000_250_224", 1000, 250, 224))
EOF
)
IROOT=$(python - <<'EOF'
from fedcola_tpu.data.fixtures import cifar100_fixture
print(cifar100_fixture("/tmp/fedcola_cifar_fx_small", 4800, 1000))
EOF
)
TROOT=$(python - <<'EOF'
from fedcola_tpu.data.fixtures import agnews_fixture
print(agnews_fixture("/tmp/fedcola_agnews_fx_small", 4800, 1000))
EOF
)

IC=12 TC=12 MC=8
COMMON="--seed 1 --multi-task \
  --datasets CIFAR100 AG_NEWS Coco Coco \
  --modalities img txt img+txt img+txt \
  --data_paths $IROOT $TROOT $CROOT $CROOT \
  --Ks $IC $TC $MC --test_size -1 --split_type diri --cncntrtn 0.5 \
  --model_name mome_small_patch16 --resize 224 --imnorm \
  --eval_type global --eval_every 5 --eval_metrics acc1 \
  --R $R --Cs 0.25 --E 5 --B 96 --beta1 0 \
  --optimizer AdamW --lr 1e-4 --lr_decay 0.99 --lr_decay_step 1 \
  --criterion CrossEntropyLoss --use_bert_tokenizer \
  --colearn_param none \
  --equal_sampled --eval_batch_size 512 \
  --result_path $OUT/result --log_path $OUT/log"

python main.py --exp_name FedIoT30 --algorithm fediot \
  --shared_param blocks --share_scope modality_exact $COMMON
python main.py --exp_name FedProx30 --algorithm fedprox \
  --shared_param none --share_scope dataset --mu 0.001 $COMMON
echo "[evidence] results under $OUT/result"
