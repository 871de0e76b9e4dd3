#!/usr/bin/env bash
# Create a CPU virtualenv (counterpart of the reference's venv_cpu_setup.sh).
set -euo pipefail

VENV=venv_cpu
python3 -m venv "$VENV"
# shellcheck disable=SC1091
source "$VENV/bin/activate"
pip install --upgrade pip
pip install -r requirements_cpu.txt
pip install -e .
echo "Activate with: source $VENV/bin/activate"
