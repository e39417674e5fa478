# TPU-VM image for latentblending_tpu (counterpart of the reference's CUDA
# Dockerfile). Run on a Cloud TPU VM (v5e+); jax[tpu] brings libtpu.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    ffmpeg build-essential git && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/latentblending_tpu
COPY pyproject.toml README.md ./
COPY latentblending_tpu ./latentblending_tpu
COPY native ./native
COPY apps ./apps

RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir .[ui] \
    && make -C native

CMD ["python", "apps/gradio_ui.py", "--server_name", "0.0.0.0"]
