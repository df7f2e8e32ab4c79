#!/bin/bash
# bf16 vs fp32 convergence study for the IMAGE flagship
# (Ours_ProtoASNet_Image hyperparameters, shortened to 40 epochs) on the
# class-conditioned synthetic fixture, real TPU chip.
set -u
ROOT=/tmp/bf16_study_img
mkdir -p $ROOT
export PYTHONPATH=/root/repo:/root/.axon_site
python - <<'PY'
from protoasnet_tpu.data.synthetic import make_synthetic_dataset
csv = make_synthetic_dataset("/tmp/bf16_study_img/data", num_videos=120,
                             height=224, width=224, min_frames=4,
                             max_frames=8, seed=13,
                             splits=("train","train","train","val","test"))
print(csv)
PY
for DT in float32 bfloat16; do
  rm -rf $ROOT/run_$DT
  python /root/repo/main.py \
    --config_path=/root/repo/protoasnet_tpu/configs/ours_protoasnet_image.yml \
    --run_name=study_$DT --save_dir=$ROOT/run_$DT \
    --data.data_info_file=$ROOT/data/manifest.csv \
    --model.pretrained=False --model.dtype=$DT \
    --train.num_train_epochs=40 \
    --render_prototypes=False \
    > $ROOT/log_$DT.txt 2>&1
  echo "=== $DT done rc=$?"
done
echo ALL_DONE
