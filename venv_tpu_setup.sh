#!/usr/bin/env bash
# Create a TPU virtualenv (counterpart of the reference's venv_gpu_setup.sh).
set -euo pipefail

VENV=venv_tpu
python3 -m venv "$VENV"
# shellcheck disable=SC1091
source "$VENV/bin/activate"
pip install --upgrade pip
pip install -r requirements_tpu.txt
pip install -e .
echo "Activate with: source $VENV/bin/activate"
