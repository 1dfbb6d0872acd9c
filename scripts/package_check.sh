#!/bin/bash
# spark-submit --py-files packaging check (SURVEY.md §7.1 M5): zip the
# package, generate a tiny input, run the pipeline through spark-submit
# exactly as a cluster deployment would, and assert the run summary.
set -euo pipefail
cd "$(dirname "$0")/.."

WORK=$(mktemp -d)
trap 'rm -rf "$WORK"' EXIT

rm -f "$WORK/das.zip"
zip -qr "$WORK/das.zip" docling_api_spark

python - <<EOF
import sys; sys.path.insert(0, ".")
from docling_api_spark.session import get_spark
from docling_api_spark.gen import transcripts_df
s = get_spark(app_name="pkg-gen", master="local[4]", shuffle_partitions=4)
transcripts_df(s, 50, partitions=4).write.mode("overwrite").parquet("$WORK/in")
s.stop()
EOF

OUT=$(spark-submit --master 'local[4]' --py-files "$WORK/das.zip" \
      docling_api_spark/cli.py run --input "$WORK/in" --output "$WORK/out" \
      2>/dev/null | tail -1)
echo "$OUT"
python - <<EOF
import json
s = json.loads('''$OUT''')
assert s["rows"] > 0 and s["buckets"], s
print("package check OK:", s["rows"], "rows,", len(s["buckets"]), "buckets")
EOF
