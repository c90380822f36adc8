#!/bin/bash
# TPU VM environment setup — the reference's 00_setup.sh/01_setup.sh
# (miniconda + pip requirements for CUDA) re-targeted at a Cloud TPU VM.
set -euo pipefail

echo "=== mit_tpu TPU VM setup ==="

PYTHON=${PYTHON:-python3}

if ! command -v "$PYTHON" >/dev/null; then
    echo "python3 not found; install Python >= 3.10 first." >&2
    exit 1
fi

$PYTHON -m pip install --upgrade pip

# JAX with TPU support (pulls libtpu from the Google releases index).
$PYTHON -m pip install -U "jax[tpu]" \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

# Framework dependencies.
$PYTHON -m pip install -U \
    flax optax orbax-checkpoint chex einops numpy pillow regex \
    tokenizers safetensors transformers requests tqdm wandb huggingface_hub \
    pytest

# This package + native components.
$PYTHON -m pip install -e . --no-build-isolation
make -C native

$PYTHON - <<'EOF'
import jax
print("jax", jax.__version__, "devices:", jax.devices())
EOF

echo "=== setup complete ==="
