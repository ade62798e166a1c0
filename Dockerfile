# RTMODT-TPU container (parity with reference Dockerfile: slim python base,
# pre-populated sample gallery, non-root user, port 7860 for HF Spaces).
# For TPU hosts, base on a TPU-VM image and install jax[tpu] instead.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    libgl1 libglib2.0-0 g++ ffmpeg && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY rtmodt_tpu ./rtmodt_tpu
COPY tools ./tools
COPY web ./web
COPY start.py bench.py ./

# CPU jax by default; swap for jax[tpu] on TPU hosts
RUN pip install --no-cache-dir -e . jax[cpu]

# Build the native components and pre-render the sample gallery at build time
RUN python -m rtmodt_tpu.native.build && \
    python tools/download_samples.py --synthetic-only || true

RUN useradd -m rtmodt && chown -R rtmodt /app
USER rtmodt

ENV PORT=7860
EXPOSE 7860
CMD ["python", "start.py"]
