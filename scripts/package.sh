#!/bin/sh
# Package the engine for cluster submission:
#   spark-submit --py-files dist/engine.zip jobs/extract.py \
#       --source <iceberg-table-or-parquet> --output-table <iceberg-table>
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/engine.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/engine.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("htmlcleanup_spark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("dist/engine.zip written")
EOF
