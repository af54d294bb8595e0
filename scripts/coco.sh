#!/usr/bin/env bash
# Canonical COCO experiments (the reference's scripts/coco.sh configurations,
# runnable unmodified on fedcola_tpu).  12 img (CIFAR100) + 12 txt (AG_NEWS)
# + 8 img+txt (COCO) clients, Dirichlet(0.5), 30 rounds, 5 local epochs.
set -e

IC=12 TC=12 MC=8        # clients per dataset
ALPHA=0.5               # dirichlet concentration
C=0.25                  # per-dataset sampling fraction
B=96                    # local batch size
ROOT=${ROOT:-}          # dataset root prefix

COMMON="--seed 1 --multi-task \
  --datasets CIFAR100 AG_NEWS Coco Coco \
  --modalities img txt img+txt img+txt \
  --data_paths ${ROOT}data/cifar100 ${ROOT}data/agnews ${ROOT}data/coco ${ROOT}data/coco \
  --Ks $IC $TC $MC --test_size -1 --split_type diri --cncntrtn $ALPHA \
  --model_name mome_small_patch16 --resize 224 --imnorm \
  --eval_type global --eval_every 1 --eval_metrics acc1 \
  --R 30 --Cs $C --E 5 --B $B --beta1 0 \
  --optimizer AdamW --lr 1e-4 --lr_decay 0.99 --lr_decay_step 1 \
  --criterion CrossEntropyLoss --use_bert_tokenizer --pretrained \
  --equal_sampled --eval_batch_size 512"

# FedAvg baseline
python main.py --exp_name FedAVG  --algorithm fedavg  --shared_param none  --share_scope dataset        --colearn_param none $COMMON
# FedCola: cross-modal attention sharing + aux + compensation
python main.py --exp_name FedCola --algorithm fedavg  --shared_param attn  --share_scope modality       --colearn_param none --compensation --with_aux --aux_trained $COMMON
# FedIoT: block sharing within exact modality
python main.py --exp_name FedIoT  --algorithm fediot  --shared_param blocks --share_scope modality_exact --colearn_param none $COMMON
# FedProx
python main.py --exp_name FedProx --algorithm fedprox --shared_param none  --share_scope dataset        --colearn_param none --mu 0.001 $COMMON
# CreamFL
python main.py --exp_name CreamFL --algorithm creamfl --shared_param none  --share_scope dataset        --colearn_param none \
  --interintra_weight 1 --kd_weight 1e-7 --num_pub_samples 500 --no_mm_contrastive --pub_batch_size 128 \
  --pub_data_dir ${ROOT}data/coco/all_images/ --pub_anno_path ${ROOT}data/coco/annotations/captions_train2014.json $COMMON
