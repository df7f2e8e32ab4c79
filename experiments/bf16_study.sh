#!/bin/bash
# bf16 vs fp32 convergence study: FULL flagship 51-epoch schedule
# (warm->joint->push-every-5, ReduceLROnPlateau, grad-accum 20) on the
# class-conditioned synthetic fixture, on the real TPU chip.
set -u
ROOT=/tmp/bf16_study
mkdir -p $ROOT
export PYTHONPATH=/root/repo:/root/.axon_site
python - <<'PY'
from protoasnet_tpu.data.synthetic import make_synthetic_dataset
csv = make_synthetic_dataset("/tmp/bf16_study/data", num_videos=100,
                             height=112, width=112, min_frames=32,
                             max_frames=64, seed=11,
                             splits=("train","train","train","val","test"))
print(csv)
PY
for DT in float32 bfloat16; do
  rm -rf $ROOT/run_$DT
  python /root/repo/main.py \
    --config_path=/root/repo/protoasnet_tpu/configs/ours_protoasnet_video.yml \
    --run_name=study_$DT --save_dir=$ROOT/run_$DT \
    --data.data_info_file=$ROOT/data/manifest.csv \
    --model.pretrained=False --model.dtype=$DT \
    --train.on_device_metrics=True \
    --render_prototypes=False \
    > $ROOT/log_$DT.txt 2>&1
  echo "=== $DT done rc=$?"
done
echo ALL_DONE
