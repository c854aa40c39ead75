# Training / serving image, equivalent of the reference's
# contrib/trainer/Dockerfile (tensorflow-gpu base + pip deps) re-targeted at
# Cloud TPU VMs: the jax[tpu] wheel bundles libtpu, so the stock python base
# image is enough — no vendor base image required.
#
#   docker build -t dream-go-tpu .
#   docker run --privileged --net=host dream-go-tpu \
#       python -m dream_go_tpu.cli --gtp --weights /data/dream_go.json
#
# (--privileged/--net=host expose the TPU device nodes on a TPU VM; on a
# CPU-only host everything still runs, just on the XLA CPU backend.)

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY dream_go_tpu ./dream_go_tpu
COPY tools ./tools
COPY contrib ./contrib
COPY bench.py ./

RUN pip install --no-cache-dir ".[tpu]" pytest \
    && python -c "from dream_go_tpu import native; native.available()"

# metrics JSONL / checkpoints / SGF archives live here
VOLUME /data
ENV DG_DATA_DIR=/data

CMD ["python", "-m", "dream_go_tpu.cli", "--help"]
