#!/usr/bin/env bash
# Canonical checks (CPU backend; the TPU bench runs separately).
#   scripts/ci.sh fast   — <3 min suite, run on every change
#   scripts/ci.sh full   — + slow end-to-end goldens (~13 min, 2 workers)
#   scripts/ci.sh bench  — one-line JSON benchmark on the attached chip
set -euo pipefail
cd "$(dirname "$0")/.."
case "${1:-fast}" in
  fast)  exec python -m pytest tests/ -x -q -m "not slow" ;;
  full)  exec python -m pytest tests/ -q ;;
  bench) exec python bench.py ;;
  *) echo "usage: $0 {fast|full|bench}" >&2; exit 2 ;;
esac
