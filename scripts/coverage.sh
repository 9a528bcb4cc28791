#!/usr/bin/env bash
# Coverage report for the fast test tier (parity with the reference's
# coverage.sh, /root/reference/coverage.sh:1-8, which drives grcov).
# Requires `coverage` / `pytest-cov` (not part of this image's frozen
# environment — run wherever pip is available).
set -euo pipefail
cd "$(dirname "$0")/.."
if ! python -c "import pytest_cov" 2>/dev/null; then
    echo "pytest-cov not installed; install with: pip install pytest-cov" >&2
    exit 1
fi
python -m pytest tests/ -q -m "not heavy and not slow" \
    --cov=rustqip_tpu --cov-report=term-missing "$@"
