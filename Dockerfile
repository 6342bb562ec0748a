# TPU-host image for localrf_tpu (analog of the reference's CUDA Dockerfile,
# ref: /root/reference/Dockerfile). Targets a Cloud TPU VM base; the JAX
# build must match the libtpu of the host.
FROM python:3.12-slim

ENV DEBIAN_FRONTEND=noninteractive
RUN apt-get update && \
    apt-get install -y --no-install-recommends \
      git wget unzip ffmpeg libsm6 libxext6 libgl1 build-essential && \
    rm -rf /var/lib/apt/lists/*

# TPU JAX + the python stack (preprocessing converters additionally need
# torch-cpu; lpips/torchvision only for the one-off weight conversion)
RUN pip install --no-cache-dir \
      "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html && \
    pip install --no-cache-dir \
      flax optax orbax-checkpoint chex einops numpy scipy \
      opencv-python-headless imageio imageio-ffmpeg matplotlib \
      tensorboardX pytest joblib && \
    pip install --no-cache-dir torch --index-url https://download.pytorch.org/whl/cpu

WORKDIR /workspace
COPY . /workspace

# smoke check (CPU backend works everywhere; TPU picked up at runtime)
RUN JAX_PLATFORMS=cpu python -c "import localrf_tpu, jax; print(jax.devices())"

CMD ["/bin/bash"]
