#!/bin/bash
export INTERIORNET_STREETLEARN_PATH=${INTERIORNET_STREETLEARN_PATH:-data}

CKPT=${CKPT:-pretrained_models/interiornet_t.pth}
EXPNAME=interiornet_t

python test_streetlearn_interiornet.py --exp ${EXPNAME} --transformer_depth 6 \
        --fusion_transformer --ckpt $CKPT \
        --datapath=$INTERIORNET_STREETLEARN_PATH --dataset interiornet \
        --streetlearn_interiornet_type T
