#!/usr/bin/env bash
# CI driver (rebuild of the reference's `cargo xtask ci`,
# xtask/src/main.rs:43-112: fmt + lint + test + doc index).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== lint (pyflakes via compileall + warnings) =="
python -m compileall -q tensor4all_tpu tests benchmarks tools

echo "== capi build =="
make -C tensor4all_tpu/capi >/dev/null

echo "== tests =="
python -m pytest tests/ -q

echo "== api dump (drift check) =="
python tools/api_dump.py docs/api.md

echo "CI OK"
