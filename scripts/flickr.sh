#!/usr/bin/env bash
# Flickr30k experiments (reference scripts/flickr.sh): same populations as
# coco.sh with Flickr30k as the mm client dataset, B=112.
set -e

IC=12 TC=12 MC=8
ALPHA=0.5
C=0.25
B=112
ROOT=${ROOT:-}

COMMON="--seed 1 --multi-task \
  --datasets CIFAR100 AG_NEWS Flickr30k Coco \
  --modalities img txt img+txt img+txt \
  --data_paths ${ROOT}data/cifar100 ${ROOT}data/agnews ${ROOT}data/flickr30k ${ROOT}data/coco \
  --Ks $IC $TC $MC --test_size -1 --split_type diri --cncntrtn $ALPHA \
  --model_name mome_small_patch16 --resize 224 --imnorm \
  --eval_type global --eval_every 1 --eval_metrics acc1 \
  --R 30 --C $C --E 5 --B $B --beta1 0 \
  --optimizer AdamW --lr 1e-4 --lr_decay 0.99 --lr_decay_step 1 \
  --criterion CrossEntropyLoss --use_bert_tokenizer --pretrained \
  --equal_sampled --eval_batch_size 512"

python main.py --exp_name FedAVG  --algorithm fedavg  --shared_param none   --share_scope dataset        --colearn_param none $COMMON
python main.py --exp_name FedCola --algorithm fedavg  --shared_param attn   --share_scope modality       --colearn_param none --compensation --with_aux --aux_trained $COMMON
python main.py --exp_name FedIoT  --algorithm fediot  --shared_param blocks --share_scope modality_exact --colearn_param none $COMMON
python main.py --exp_name FedProx --algorithm fedprox --shared_param none   --share_scope dataset        --colearn_param none --mu 0.001 $COMMON
python main.py --exp_name CreamFL --algorithm creamfl --shared_param none   --share_scope dataset        --colearn_param none \
  --interintra_weight 1 --kd_weight 1e-7 --num_pub_samples 500 --no_mm_contrastive --pub_batch_size 128 $COMMON
