#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (SURVEY.md §7.2-6).
#
#   tools/package.sh            # -> dist/engine.zip
#   spark-submit --py-files dist/engine.zip \
#       parserpdf_spark/jobs/extract_job.py --input ... --output ... --chunks 4096
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/engine.zip
zip -qr dist/engine.zip parserpdf_spark -x '*__pycache__*'
echo "dist/engine.zip:"
unzip -l dist/engine.zip | tail -2
