# TPU container for quadruped-gym-tpu (the reference ships a CUDA/PyTorch
# image, Dockerfile.nvidia:1-60; the TPU-native equivalent needs only
# jax[tpu] and the host-side MuJoCo compiler/renderer).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make libgl1 libegl1 libosmesa6 ffmpeg \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace
COPY pyproject.toml README.md ./
COPY quadruped_gym_tpu ./quadruped_gym_tpu
COPY tests ./tests
COPY examples ./examples
COPY bench.py Makefile ./

RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        mujoco gymnasium optax flax orbax-checkpoint matplotlib pandas pytest \
    && pip install --no-cache-dir -e .

# headless rendering for video output
ENV MUJOCO_GL=egl

CMD ["python", "bench.py"]
