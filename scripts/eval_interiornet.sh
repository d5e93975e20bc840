#!/bin/bash
export INTERIORNET_STREETLEARN_PATH=${INTERIORNET_STREETLEARN_PATH:-data}

CKPT=${CKPT:-pretrained_models/interiornet.pth}
EXPNAME=interiornet

python test_streetlearn_interiornet.py --exp ${EXPNAME} --transformer_depth 6 \
        --fusion_transformer --ckpt $CKPT \
        --datapath=$INTERIORNET_STREETLEARN_PATH --dataset interiornet
