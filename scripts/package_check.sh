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

# the corpus surface ships through the same zip (exercises the operator
# and plan layers: extract/quality/dedup/graph/decontam/split/chunk/pack)
python - <<EOF
import sys; sys.path.insert(0, ".")
from docling_api_spark.session import get_spark
s = get_spark(app_name="pkg-docs", master="local[4]", shuffle_partitions=4)
d = s.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id", "text")
d.filter("doc_id % 10 <> 8").write.mode("overwrite").parquet("$WORK/docs")
d.filter("doc_id % 10 = 8").write.mode("overwrite").parquet("$WORK/eval")
s.stop()
EOF
FUNNEL=$(spark-submit --master 'local[4]' --py-files "$WORK/das.zip" \
      docling_api_spark/cli.py corpus --input "$WORK/docs" --eval "$WORK/eval" \
      --output "$WORK/corpus" --ctx-len 128 --stride 96 --near-threshold 0.4 \
      2>/dev/null | tail -1)
echo "$FUNNEL"
python - <<EOF
import json
f = json.loads('''$FUNNEL''')
assert f["n_input"] >= f["n_extracted"] >= f["n_quality"] >= f["n_kept"] > 0, f
assert f["n_kept"] == f["n_train"] + f["n_val"] + f["n_test"], f
print("corpus package check OK:", f["n_kept"], "kept,", f["n_chunks"], "chunks")
EOF

# DSIR selection ships through the same zip (classifier + Gumbel-top-k)
SEL=$(spark-submit --master 'local[4]' --py-files "$WORK/das.zip" \
      docling_api_spark/cli.py select --input "$WORK/docs" \
      --target "$WORK/eval" --raw "$WORK/docs" -k 50 \
      --output "$WORK/selected" 2>/dev/null | tail -1)
echo "$SEL"
python - <<EOF
import json
s = json.loads('''$SEL''')
assert s["selected"] == 50, s
print("select package check OK:", s["selected"], "selected")
EOF
