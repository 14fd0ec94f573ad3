#!/usr/bin/env bash
# Build the --py-files archive and spark-submit the operational CLI.
#
#   tools/submit.sh replay --source /tmp/log --table /tmp/t --start 0 --end 99999
#
# Env:
#   SPARK_GRAFT_MASTER  spark master (default local[8]; on a cluster e.g.
#                       yarn / k8s://... / spark://host:7077)
#   SPARK_GRAFT_ZIP     archive path (default /tmp/ethereum_etl_spark.zip)
#
# This is the north-rule deployment surface: the package ships ONLY through
# the zip (no repo on the PYTHONPATH), exactly how a multi-executor cluster
# receives it.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="${SPARK_GRAFT_ZIP:-/tmp/ethereum_etl_spark.zip}"

python - "$REPO" "$ZIP" <<'EOF'
import pathlib, sys, zipfile

repo, zip_path = sys.argv[1], sys.argv[2]
with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted((pathlib.Path(repo) / "ethereum_etl_spark").rglob("*.py")):
        z.write(p, str(p.relative_to(repo)))
print(f"built {zip_path}", file=sys.stderr)
EOF

exec spark-submit --master "${SPARK_GRAFT_MASTER:-local[8]}" \
  --py-files "$ZIP" "$REPO/tools/submit_main.py" "$@"
