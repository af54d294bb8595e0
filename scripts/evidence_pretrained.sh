#!/usr/bin/env bash
# --pretrained composed end-to-end at flagship shape (VERDICT r4 item 3):
# every canonical script line passes --pretrained (reference
# scripts/coco.sh:13-17 -> pretrain_vit, mome.py:788-816), but real timm
# downloads are infra-blocked here — so a fixed LOCAL timm-layout
# ViT-small checkpoint (random-but-structured; write_timm_vit_checkpoint)
# is injected through the FEDCOLA_PRETRAIN_* env hook of
# models/pretrained.py, and the coco.sh FedCola line runs from it on the
# path-backed 1000-image fixture: pretrained init -> aux build -> server
# aux exchange -> rounds -> checkpoints, as one system.
#
# Usage: scripts/evidence_pretrained.sh [R]   (default 5 rounds)
set -e
cd "$(dirname "$0")/.."
R=${1:-5}
OUT=/tmp/fedcola_evidence_pretrained

CKPT=$(python - <<'EOF'
from fedcola_tpu.models.pretrained import write_timm_vit_checkpoint
print(write_timm_vit_checkpoint(
    "/tmp/fedcola_pretrain_vit_small_patch16_224.npz",
    embed_dim=384, depth=12, img_size=224, patch_size=16, seed=5))
EOF
)
export FEDCOLA_PRETRAIN_VIT_SMALL_PATCH16_224=$CKPT
echo "[evidence] pretrained checkpoint at $CKPT"

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
python main.py --exp_name FedColaPretrained --algorithm fedavg \
  --shared_param attn --share_scope modality --colearn_param none \
  --compensation --with_aux --aux_trained --pretrained \
  --seed 1 --multi-task \
  --datasets CIFAR100 AG_NEWS Coco Coco \
  --modalities img txt img+txt img+txt \
  --data_paths $IROOT $TROOT $CROOT $CROOT \
  --Ks $IC $TC $MC --test_size -1 --split_type diri --cncntrtn 0.5 \
  --model_name mome_small_patch16 --resize 224 --imnorm \
  --eval_type global --eval_every 1 --eval_metrics acc1 \
  --R $R --Cs 0.25 --E 5 --B 96 --beta1 0 \
  --optimizer AdamW --lr 1e-4 --lr_decay 0.99 --lr_decay_step 1 \
  --criterion CrossEntropyLoss --use_bert_tokenizer \
  --equal_sampled --eval_batch_size 512 \
  --result_path $OUT/result --log_path $OUT/log
echo "[evidence] results under $OUT/result"
