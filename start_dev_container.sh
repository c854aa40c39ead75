#!/bin/sh
# Interactive dev container with the repo bind-mounted, equivalent of the
# reference's start_dev_container.sh (rust/TF devel image). Run on a Cloud
# TPU VM to get the TPU devices inside the container.
set -e
docker build -t dream-go-tpu-dev .
exec docker run -it --rm --privileged --net=host \
    -v "$(pwd)":/app -v "${DG_DATA_DIR:-$HOME/dream-go-data}":/data \
    dream-go-tpu-dev /bin/bash
