#!/bin/sh
# Build the --py-files archive for spark-submit (pure-Python package, no
# build step): dist/filters_spark.zip
set -eu
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/filters_spark.zip
python - <<'EOF'
import zipfile
from pathlib import Path

root = Path(".")
with zipfile.ZipFile("dist/filters_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("filters_spark/**/*.py")):
        z.write(p, p.as_posix())
print("wrote dist/filters_spark.zip")
EOF
echo "submit with:"
echo "  spark-submit --py-files dist/filters_spark.zip scripts/submit_main.py --synthetic 2000 --output /tmp/fs_out"
