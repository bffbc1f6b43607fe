# uvaia-tpu container (packaging parity with the reference's
# Dockerfile, which builds the C toolchain in a Debian base).
#
# The compute path targets TPU via JAX; on a TPU VM swap the base
# install for `pip install 'jax[tpu]' -f
# https://storage.googleapis.com/jax-releases/libtpu_releases.html`.
# CPU jax is installed here so the image also works (slowly) anywhere,
# and so `uvaia -h` smoke-tests in plain docker build environments.
FROM python:3.11-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ \
        liblzma-dev \
        zlib1g-dev \
        libbz2-dev && \
    apt-get clean && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/uvaia-tpu
COPY pyproject.toml README.md ./
COPY uvaia_tpu ./uvaia_tpu

RUN pip install --no-cache-dir jax numpy && \
    pip install --no-cache-dir . && \
    # pre-build the native IO library (io/native.py builds lazily on
    # first use otherwise)
    python -c "from uvaia_tpu.io.native import get_lib; assert get_lib() is not None"

# same smoke test the reference's bioconda recipe runs (meta.yaml:40-42)
RUN uvaia -h > /dev/null

ENTRYPOINT ["uvaia-tpu"]
