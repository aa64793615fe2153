#!/bin/bash
# Pre-commit smoke gate (VERDICT r3 item #3: two consecutive rounds shipped a
# red test after a last-minute default flip). Runs the core correctness set —
# numerics, quantizer, calibration, export, compress/serve — in <5 min on the
# 8-device CPU mesh. Installed as .git/hooks/pre-commit by tools/install_hooks.sh
# (re-run it after a fresh clone; hooks are not versioned by git itself).
#
# Skip (emergency only): git commit --no-verify
set -e
cd "$(dirname "$0")/.."
exec python -m pytest \
  tests/test_numerics.py tests/test_quantizer.py tests/test_calibration.py \
  tests/test_export.py tests/test_compress_serve.py \
  -x -q --no-header -p no:cacheprovider -n 4   # 2m43s measured (4 workers)
