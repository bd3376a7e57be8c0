# hippie-tpu container (reference ships a CUDA torch image, dockerfile:2;
# this one targets Cloud TPU VMs).
#
# Build:  docker build -t hippie-tpu .
# Run:    docker run --privileged --network host hippie-tpu \
#             hippie-tpu train --dataset cellexplorer-celltype
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends gcc && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY hippie_tpu ./hippie_tpu
COPY native ./native
COPY scripts ./scripts
COPY bench.py ./

# jax[tpu] pulls libtpu for Cloud TPU VMs; torch-cpu only for .ckpt interop.
RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir .[interop,plots]

ENTRYPOINT []
CMD ["hippie-tpu", "--help"]
