#!/usr/bin/env bash
# Build the --py-files artifact: a zip of the opps_feedcrawler_spark package.
#   scripts/package.sh [out.zip]
set -euo pipefail
cd "$(dirname "$0")/.."
out="${1:-dist/opps_feedcrawler_spark.zip}"
mkdir -p "$(dirname "$out")"
rm -f "$out"
python - "$out" <<'PY'
import os, sys, zipfile
out = sys.argv[1]
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("opps_feedcrawler_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print(out)
PY
