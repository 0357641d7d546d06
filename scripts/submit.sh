#!/usr/bin/env bash
# Cluster launch (north_rule: spark-submit --py-files). Example:
#   scripts/submit.sh run --clips /data/clips.parquet --out /data/qc --resume
# On a real cluster swap --master for yarn/k8s and add executor sizing, e.g.
#   --master k8s://... --num-executors 256 --executor-cores 8 \
#   --conf spark.sql.shuffle.partitions=4096
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f /tmp/qcflow.zip
zip -qr /tmp/qcflow.zip qcflow
cat > /tmp/qcflow_submit_entry.py <<'EOF'
import sys
from qcflow.cli import main
sys.exit(main(sys.argv[1:]))
EOF
exec spark-submit \
  --master "${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}" \
  --py-files /tmp/qcflow.zip \
  /tmp/qcflow_submit_entry.py "$@"
