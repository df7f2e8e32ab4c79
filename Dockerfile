# Container for protoasnet_tpu (the reference's docker_setup.sh:12-22 is a
# `docker run` against the CUDA pytorch image; the TPU-native equivalent is
# an image with jax[tpu] that the TPU VM runtime exposes chips into).
#
# Build:   docker build -t protoasnet-tpu .
# Train:   docker run --privileged --network host \
#              -v /path/to/data:/data protoasnet-tpu \
#              python main.py --config_path=protoasnet_tpu/configs/ours_protoasnet_video.yml \
#                  --data.data_info_file=/data/annotations.csv --save_dir=/data/logs
# Serve:   docker run --privileged --network host \
#              -v /path/to/run:/run_dir protoasnet-tpu \
#              python -m protoasnet_tpu.server --run_dir /run_dir --int8
#          (SIGTERM from `docker stop` drains in-flight batches; during
#          startup it exits immediately with 143 — SERVING.md.)
#
# --privileged + host networking is the standard TPU-VM container setup so
# libtpu can reach the accelerator devices; on Cloud TPU use a base image
# matching your runtime's libtpu, or the ct5lp-* images.
#
# NOTE: no container runtime exists in the dev environment this repo is
# built in, so this image is provided and documented but not CI-built
# there; the pinned deps mirror setup.py.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential ffmpeg libgl1 libglib2.0-0 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app

# TPU jax first (brings libtpu); then the framework's deps.
RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY setup.py pyproject.toml README.md ./
COPY protoasnet_tpu ./protoasnet_tpu
COPY native ./native
COPY main.py explain.py bench.py deploy.sh ./

RUN pip install --no-cache-dir -e .

# the native loader core builds lazily on first use; prebuild it here so
# the first training step doesn't pay the compile
RUN make -C native || true

ENV PYTHONUNBUFFERED=1
EXPOSE 8300

CMD ["python", "-m", "protoasnet_tpu.server", "--help"]
