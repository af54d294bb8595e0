#!/usr/bin/env bash
# End-to-end evidence run: every algorithm line of the ported
# scripts/flickr.sh against a REAL path-backed Flickr30k-format fixture
# (1000 on-disk 224px jpegs, 5 captions/image, learnable image<->caption
# code), server retrieval eval on a COCO-format fixture (flickr.sh's final
# dataset is Coco).  CIFAR100/AG_NEWS use the LEARNABLE class-signal
# fixtures (this environment has no egress to download the real sets;
# the fixtures carry a real class signal so central acc1 measures
# learning, not chance — fedcola_tpu/data/fixtures.py).
#
# Usage: scripts/evidence_flickr.sh [R]   (default 5 rounds, eval at R)
set -e
cd "$(dirname "$0")/.."
R=${1:-5}

FIX=$(python - <<'EOF'
from fedcola_tpu.data.fixtures import coco_fixture, flickr_fixture
f = flickr_fixture("/tmp/fedcola_evidence_flickr/1000_250_224", 1000, 250, 224)
c = coco_fixture("/tmp/fedcola_bench_coco/1000_250_224", 1000, 250, 224)
print(f, c)
EOF
)
FROOT=$(echo $FIX | cut -d' ' -f1)
CROOT=$(echo $FIX | cut -d' ' -f2)
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
  --datasets CIFAR100 AG_NEWS Flickr30k Coco \
  --modalities img txt img+txt img+txt \
  --data_paths $IROOT $TROOT $FROOT $CROOT \
  --Ks $IC $TC $MC --test_size -1 --split_type diri --cncntrtn 0.5 \
  --model_name mome_small_patch16 --resize 224 --imnorm \
  --eval_type global --eval_every $R --eval_metrics acc1 \
  --R $R --C 0.25 --E 5 --B 112 --beta1 0 \
  --optimizer AdamW --lr 1e-4 --lr_decay 0.99 --lr_decay_step 1 \
  --criterion CrossEntropyLoss --equal_sampled --eval_batch_size 512 \
  --result_path /tmp/fedcola_evidence_flickr/result \
  --log_path /tmp/fedcola_evidence_flickr/log"

python main.py --exp_name FedAVG_fl  --algorithm fedavg  --shared_param none   --share_scope dataset        --colearn_param none $COMMON
python main.py --exp_name FedCola_fl --algorithm fedavg  --shared_param attn   --share_scope modality       --colearn_param none --compensation --with_aux --aux_trained $COMMON
python main.py --exp_name FedIoT_fl  --algorithm fediot  --shared_param blocks --share_scope modality_exact --colearn_param none $COMMON
python main.py --exp_name FedProx_fl --algorithm fedprox --shared_param none   --share_scope dataset        --colearn_param none --mu 0.001 $COMMON
python main.py --exp_name CreamFL_fl --algorithm creamfl --shared_param none   --share_scope dataset        --colearn_param none \
  --interintra_weight 1 --kd_weight 1e-7 --num_pub_samples 500 --no_mm_contrastive --pub_batch_size 128 $COMMON
