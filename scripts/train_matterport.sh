#!/bin/bash
export MATTERPORT_PATH=${MATTERPORT_PATH:-matterport}

EXPNAME=matterport

python train.py --name ${EXPNAME} --batch=6 \
        --lr=5e-4 --fusion_transformer --transformer_depth 6 \
        --w_tr 10 --w_rot 10 --steps 120000 \
        --datapath=$MATTERPORT_PATH --dataset matterport
