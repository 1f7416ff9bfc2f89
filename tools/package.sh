#!/usr/bin/env bash
# Package goprowl_spark for spark-submit --py-files (north_rule packaging).
#   tools/package.sh [outdir]   → outdir/goprowl_spark.zip
set -euo pipefail
cd "$(dirname "$0")/.."
out="${1:-dist}"
mkdir -p "$out"
zip -qr "$out/goprowl_spark.zip" goprowl_spark -x '*__pycache__*'
echo "$out/goprowl_spark.zip"
