#!/bin/sh
# Build the --py-files archive for spark-submit (north rule packaging).
set -e
cd "$(dirname "$0")/.."
rm -f wikidata_to_cidoc_crm_spark.zip
python - <<'EOF'
import zipfile, os
with zipfile.ZipFile("wikidata_to_cidoc_crm_spark.zip", "w") as z:
    for root, _, files in os.walk("wikidata_to_cidoc_crm_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                z.write(os.path.join(root, f))
print("wrote wikidata_to_cidoc_crm_spark.zip")
EOF
echo "submit with:"
echo "  spark-submit --py-files wikidata_to_cidoc_crm_spark.zip \\"
echo "      --conf spark.sql.adaptive.enabled=true \\"
echo "      wikidata_to_cidoc_crm_spark/pipeline.py"
