#!/bin/bash
# Canonical train + test commands for the four paper models
# (capability parity with the reference deploy script,
# MICCAI2023_ProtoASNet_Deploy.sh:14-77).
set -e

DATA_CSV=${DATA_CSV:-data/as/manifest.csv}
SAVE_DIR=${SAVE_DIR:-logs}

############ ProtoASNet (video) — the paper model ############
python main.py --config_path=protoasnet_tpu/configs/ours_protoasnet_video.yml \
    --run_name=ours_protoasnet_video --save_dir="$SAVE_DIR" \
    --data.data_info_file="$DATA_CSV"
python main.py --config_path=protoasnet_tpu/configs/ours_protoasnet_video.yml \
    --run_name=ours_protoasnet_video --save_dir="$SAVE_DIR" \
    --data.data_info_file="$DATA_CSV" \
    --eval_only=true --eval_data_type=test \
    --model.checkpoint_path="$SAVE_DIR/ours_protoasnet_video/model_best.ckpt"

############ ProtoASNet (image) ############
python main.py --config_path=protoasnet_tpu/configs/ours_protoasnet_image.yml \
    --run_name=ours_protoasnet_image --save_dir="$SAVE_DIR" \
    --data.data_info_file="$DATA_CSV"
python main.py --config_path=protoasnet_tpu/configs/ours_protoasnet_image.yml \
    --run_name=ours_protoasnet_image --save_dir="$SAVE_DIR" \
    --data.data_info_file="$DATA_CSV" \
    --eval_only=true --eval_data_type=test \
    --model.checkpoint_path="$SAVE_DIR/ours_protoasnet_image/model_best.ckpt"

############ XProtoNet baseline (video) ############
python main.py --config_path=protoasnet_tpu/configs/baseline_xprotonet_video.yml \
    --run_name=baseline_xprotonet_video --save_dir="$SAVE_DIR" \
    --data.data_info_file="$DATA_CSV"

############ ProtoPNet baseline (staged) ############
python main.py --config_path=protoasnet_tpu/configs/baseline_protopnet.yml \
    --run_name=baseline_protopnet --save_dir="$SAVE_DIR" \
    --data.data_info_file="$DATA_CSV"
