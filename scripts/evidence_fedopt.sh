#!/usr/bin/env bash
# FedOpt-family evidence runs (L8): fedadam and fedyogi variants of the
# coco.sh FedCola line against the REAL path-backed COCO-format fixture
# (1000 on-disk 224px jpegs, 5 captions/image), with the FedOpt paper's
# separately-tuned server lr (--server_lr 0.1; Reddi et al. 2021 tunes
# ~0.1-1 — the flag-shared client lr 1e-4 caps per-element movement at
# ~1e-4/round and plateaus, documented in BENCH_NOTES round 3).
# Reference semantics: src/algorithm/fedadam.py:7-62, fedyogi.py:7-63.
#
# Usage: scripts/evidence_fedopt.sh [R]   (default 10 rounds, eval every 5)
set -e
cd "$(dirname "$0")/.."
R=${1:-10}
OUT=/tmp/fedcola_evidence_fedopt

CROOT=$(python - <<'EOF'
from fedcola_tpu.data.fixtures import coco_fixture
print(coco_fixture("/tmp/fedcola_bench_coco/1000_250_224", 1000, 250, 224))
EOF
)
# learnable cls-leg fixtures, grid-sized (class-signal stand-ins; the old
# /tmp/missing_* paths fell back to chance-by-construction random labels)
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
  --shared_param attn --share_scope modality --colearn_param none \
  --compensation --with_aux --aux_trained \
  --server_lr 0.1 \
  --equal_sampled --eval_batch_size 512 \
  --result_path $OUT/result --log_path $OUT/log"

python main.py --exp_name FedAdam_coco --algorithm fedadam $COMMON
python main.py --exp_name FedYogi_coco --algorithm fedyogi $COMMON
# the stability datapoint recorded in docs/evidence (server_lr 0.01):
# --server_lr appearing after $COMMON overrides the 0.1 inside it
python main.py --exp_name FedAdam_coco_slr001 --algorithm fedadam \
  $COMMON --server_lr 0.01
