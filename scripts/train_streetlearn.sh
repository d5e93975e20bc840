#!/bin/bash
export INTERIORNET_STREETLEARN_PATH=${INTERIORNET_STREETLEARN_PATH:-data}

EXPNAME=streetlearn

python train.py --name ${EXPNAME} --batch=6 \
        --lr=5e-4 --fusion_transformer --transformer_depth 6 \
        --w_tr 10 --w_rot 10 --steps 120000 \
        --datapath=$INTERIORNET_STREETLEARN_PATH --dataset streetlearn
