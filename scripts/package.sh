#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (BASELINE.json:6).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/engine.zip
zip -qr dist/engine.zip etlframwork_spark -x '*__pycache__*'
echo "wrote dist/engine.zip"
