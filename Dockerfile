# nanocaller-tpu container (CPU backend by default; install jax[tpu]
# instead for TPU hosts). No bioinformatics externals needed — BAM/VCF
# I/O, alignment, MSA and phasing are all in-package.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ zlib1g-dev && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/nanocaller-tpu
COPY pyproject.toml README.md ./
COPY nanocaller_tpu ./nanocaller_tpu
COPY tools ./tools
RUN pip install --no-cache-dir "jax[cpu]" flax optax numpy h5py && \
    pip install --no-cache-dir -e .

ENTRYPOINT ["nanocaller-tpu"]
