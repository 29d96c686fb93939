#!/bin/sh
# Build the spark-submit --py-files artifact.
set -e
cd "$(dirname "$0")/.."
rm -f choetl_spark.zip
python - <<'EOF'
import zipfile, os
with zipfile.ZipFile("choetl_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("choetl_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                z.write(os.path.join(root, f))
print("wrote choetl_spark.zip")
EOF
