#!/bin/bash
export MATTERPORT_PATH=${MATTERPORT_PATH:-matterport}

# TRAINED
# CKPT=output/matterport/checkpoints/120000.ckpt
# PRETRAINED (reference torch checkpoint, converted on the fly)
CKPT=${CKPT:-pretrained_models/matterport.pth}

EXPNAME=matterport

python test_matterport.py --exp ${EXPNAME} --transformer_depth 6 \
        --fusion_transformer --ckpt $CKPT \
        --datapath=$MATTERPORT_PATH
