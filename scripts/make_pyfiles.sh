#!/bin/bash
# Package the engine for spark-submit --py-files distribution.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/grandiso_networkx_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/grandiso_networkx_spark.zip", "w",
                     zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("grandiso_networkx_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/grandiso_networkx_spark.zip")
EOF
