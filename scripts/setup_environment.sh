#!/usr/bin/env bash
# Environment setup (equivalent of reference/setup_python_environment.sh /
# setup_enki_environment.sh, which build conda envs for x86 / ppc64le GPU
# nodes). On a TPU VM the Python stack is jax[tpu] + flax + optax + orbax;
# this script verifies the environment and builds the native store engine.
set -euo pipefail
cd "$(dirname "$0")/.."

python - <<'EOF'
import importlib
required = ["jax", "flax", "optax", "orbax.checkpoint", "numpy", "scipy",
            "PIL", "imageio", "google.protobuf"]
missing = [m for m in required if importlib.util.find_spec(m) is None]
if missing:
    raise SystemExit(f"missing packages: {missing} — install jax[tpu] flax "
                     f"optax orbax-checkpoint imageio pillow protobuf scipy")
import jax
print("jax", jax.__version__, "devices:", jax.devices())
EOF

./native/build.sh
echo "environment OK"
