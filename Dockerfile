# vietasr_tpu — TPU-native Vietnamese ASR framework.
# (A Dockerfile is a reference TODO, /root/reference/README.md:68-71.)
#
# The image targets Cloud TPU VMs: the host exposes the TPU via
# /dev/accel* + libtpu, which `jax[tpu]` picks up automatically. For a
# CPU-only container (tests, development) install plain `jax` instead.
FROM python:3.12-slim

# native toolchain for the C++ beam-search/LM extension
# (vietasr_tpu/native/, built with g++ on first use)
RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY vietasr_tpu/ vietasr_tpu/
COPY configs/ configs/

# TPU runtime; swap the extra for "jax" on CPU-only hosts
RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        optax numpy scipy websockets pyyaml msgpack && \
    pip install --no-cache-dir -e .

EXPOSE 5000
# web demo (upload + live microphone streaming); see `cli.py --help`
# for transcribe / train / eval subcommands
CMD ["python", "-m", "vietasr_tpu.cli", "serve", \
     "--config", "configs/conformer_ctc_vi_streaming.yaml", \
     "--host", "0.0.0.0", "--port", "5000", "--streaming"]
