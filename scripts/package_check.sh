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

# the streaming curation gate ships through the same zip: an
# AvailableNow micro-run in three spark-submit invocations — wave A
# split into 2 micro-batches (max-files-per-trigger=1), wave B landed
# and drained by a SECOND invocation on the same checkpoint (only the
# new files are read), then a THIRD invocation with nothing new, which
# must add zero batches. exactly_once is asserted by the CLI itself
# (kept rows on disk == the funnel's kept total) and re-checked here.
python - <<EOF
import sys; sys.path.insert(0, ".")
from pyspark.sql import functions as F
from docling_api_spark.session import get_spark
s = get_spark(app_name="pkg-stream-gen", master="local[4]", shuffle_partitions=4)
d = s.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id", "text")
d.withColumn("label", F.when(F.col("doc_id") % 3 != 0, "good").otherwise("junk")) \
    .write.mode("overwrite").parquet("$WORK/gate_seed")
d.filter("doc_id < 200").repartition(2).write.mode("overwrite").parquet("$WORK/gate_in")
s.stop()
EOF
GATE () {
    spark-submit --master 'local[4]' --py-files "$WORK/das.zip" \
        docling_api_spark/cli.py gate-stream --input "$WORK/gate_in" \
        --output "$WORK/gate_out" --checkpoint "$WORK/gate_ckpt" \
        --seed "$WORK/gate_seed" --max-files-per-trigger 1 2>/dev/null | tail -1
}
G1=$(GATE); echo "$G1"
python - <<EOF
import sys; sys.path.insert(0, ".")
from docling_api_spark.session import get_spark
s = get_spark(app_name="pkg-stream-gen2", master="local[4]", shuffle_partitions=4)
d = s.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id", "text")
d.filter("doc_id >= 200 AND doc_id < 320").coalesce(1).write.mode("append").parquet("$WORK/gate_in")
s.stop()
EOF
G2=$(GATE); echo "$G2"
G3=$(GATE); echo "$G3"
python - <<EOF
import json
g1, g2, g3 = json.loads('''$G1'''), json.loads('''$G2'''), json.loads('''$G3''')
assert g1["n_batches"] >= 2 and g1["n_kept"] > 0 and g1["exactly_once"], g1
assert g2["n_batches"] > g1["n_batches"] and g2["n_in"] > g1["n_in"], (g1, g2)
assert g2["exactly_once"], g2
assert g3["n_batches"] == g2["n_batches"] and g3["n_in"] == g2["n_in"], (g2, g3)
assert g3["exactly_once"], g3
print("streaming gate package check OK:", g2["n_batches"], "batches,",
      g2["n_kept"], "kept, exactly-once held across 3 invocations")
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
