# radtts-tpu container (mirrors the reference's Dockerfile deployment
# surface, /root/reference/Dockerfile:1, rebased from the NGC PyTorch image
# onto a plain Python base + JAX).
#
#   CPU   (tests, checkpoint conversion, dataset preflight):
#       docker build -t radtts-tpu .
#   TPU   (Cloud TPU VM — the libtpu wheel ships via jax[tpu]):
#       docker build --build-arg JAX_EXTRA="[tpu]" \
#           --build-arg PIP_FLAGS="-f https://storage.googleapis.com/jax-releases/libtpu_releases.html" \
#           -t radtts-tpu:tpu .
#
# The image has everything the CLIs need: train.py / inference.py /
# inference_voice_conversion.py / data.py / serve.py / train_vocoder.py.
FROM python:3.12-slim

ENV TZ=America/Los_Angeles \
    DEBIAN_FRONTEND=noninteractive \
    PYTHONUNBUFFERED=1

# g++ compiles the ctypes C++ kernels (radtts_tpu/native/viterbi.cpp) on
# first use; libsndfile/ffmpeg/sox mirror the reference image's audio
# tooling for dataset preparation.
RUN apt-get update -y && \
    apt-get install -y --no-install-recommends \
        g++ make ffmpeg libsndfile1 sox tzdata && \
    rm -rf /var/lib/apt/lists/*

ARG JAX_EXTRA=""
ARG PIP_FLAGS=""

WORKDIR /workspace/radtts-tpu
COPY requirements.txt ./
RUN pip install --no-cache-dir --upgrade pip && \
    pip install --no-cache-dir $PIP_FLAGS -r requirements.txt \
        --extra-index-url https://download.pytorch.org/whl/cpu && \
    if [ -n "$JAX_EXTRA" ]; then \
        pip install --no-cache-dir $PIP_FLAGS "jax$JAX_EXTRA==0.9.0"; fi

COPY . .
RUN pip install --no-cache-dir .

# serve.py's HTTP synthesis daemon default port
EXPOSE 8000

CMD ["python", "serve.py", "--help"]
