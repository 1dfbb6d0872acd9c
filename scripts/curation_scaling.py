"""Scaling evidence for the curation layer: N vs 4N cores on the SAME
input (the sandbox analog of the two-cluster-size rule, matching
scripts/scaling_bench.py's method — fresh JVM per level, interleaved
trials, best-of-K per level).

Jobs measured (both pure-JVM, shuffle-light — the shapes that must hold
at 1000 executors):
  - nb_score: hashed-feature explode -> broadcast weight join -> one
    exchange on doc_id (classifier.py)
  - hashed_embeddings: explode -> 64 codegen conditional sums -> one
    exchange (embedding.py)

Input: the sf0.1 documents table replicated REPLICAS× with re-keyed ids
(identical bytes at every level, staged once), model weights trained
once at staging time and loaded from parquet.

Usage: python scripts/curation_scaling.py [sf_dir] [trials]
Writes BENCH/curation_scaling.json and prints a summary line.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
STAGE = "/tmp/curation_scale"
# 800x sf0.1 = 4M docs / ~320M hashed features. Smaller inputs measure
# the per-JOB fixed cost, not the operator: at 20x both levels sit flat
# at ~6 s (pure planning/broadcast/task floor); at 200x the floor is
# still ~25% of the local[16] wall (measured eff 0.55 with a variable
# part scaling ~4.0x). 100 TB lives in the large-input limit, so that
# is what this measures.
REPLICAS = 800
LEVELS = (4, 16)

_RUN_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from docling_api_spark.session import get_spark
import pyspark.sql.functions as F

level = int(sys.argv[1])
spark = get_spark(app_name=f"curation_scale_{{level}}",
                  master=f"local[{{level}}]",
                  shuffle_partitions=max(level, 8))
docs = spark.read.parquet({stage!r} + "/docs")
weights = spark.read.parquet({stage!r} + "/weights")
meta = json.load(open({stage!r} + "/meta.json"))
docs.count()  # warm scan (file listing / footer cache), untimed

from docling_api_spark.operators.classifier import nb_score
t0 = time.time()
nb_score(docs, weights, meta).agg(F.sum("score_scaled")).collect()
t_nb = time.time() - t0

from docling_api_spark.operators.embedding import hashed_embeddings
t0 = time.time()
hashed_embeddings(docs).agg(
    F.sum(F.element_at("embedding_int", 1))).collect()
t_emb = time.time() - t0
print(json.dumps({{"nb_score": t_nb, "embeddings": t_emb}}))
spark.stop()
"""


def stage(sf_dir: str) -> None:
    sys.path.insert(0, str(REPO))
    from pyspark.sql import functions as F

    from docling_api_spark.operators.classifier import nb_train
    from docling_api_spark.session import get_spark

    spark = get_spark(app_name="curation_scale_stage", master="local[32]",
                      shuffle_partitions=32)
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    big = base.crossJoin(
        spark.range(REPLICAS).withColumnRenamed("id", "_rep")
    ).select(
        (F.col("doc_id") * REPLICAS + F.col("_rep")).alias("doc_id"),
        "text",
    )
    big.repartition(32).write.mode("overwrite").parquet(f"{STAGE}/docs")
    seed = base.select(
        "doc_id", "text",
        F.when(F.col("doc_id") % 3 != 0, "good").otherwise("junk")
        .alias("label"),
    )
    weights, meta = nb_train(seed, positive="good")
    weights.write.mode("overwrite").parquet(f"{STAGE}/weights")
    with open(f"{STAGE}/meta.json", "w") as f:
        json.dump(meta, f)
    spark.stop()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    # staging cache keyed on the staging CONFIG, not mere existence — a
    # REPLICAS/sf_dir change must re-stage or the timings would be
    # measured on stale input while the JSON records the new constants
    cfg = {"replicas": REPLICAS, "sf_dir": sf_dir}
    cfg_path = f"{STAGE}/stage_config.json"
    cached = None
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cached = json.load(f)
    if cached != cfg or not os.path.exists(f"{STAGE}/meta.json"):
        stage(sf_dir)
        with open(cfg_path, "w") as f:
            json.dump(cfg, f)
    snippet = _RUN_SNIPPET.format(repo=str(REPO), stage=STAGE)
    results: dict[int, dict[str, list[float]]] = {
        lv: {"nb_score": [], "embeddings": []} for lv in LEVELS}
    for t in range(trials):
        for lv in LEVELS:  # interleaved across levels
            out = subprocess.run(
                [sys.executable, "-c", snippet, str(lv)],
                capture_output=True, text=True, check=True,
            ).stdout.strip().splitlines()[-1]
            for k, v in json.loads(out).items():
                results[lv][k].append(v)
            print(f"trial {t} local[{lv}]: {out}", file=sys.stderr)
    summary = {"levels": LEVELS, "trials": trials, "replicas": REPLICAS,
               "raw": {str(lv): results[lv] for lv in LEVELS}}
    for job in ("nb_score", "embeddings"):
        b4, b16 = (min(results[lv][job]) for lv in LEVELS)
        summary[job] = {
            "best_local4_s": round(b4, 2), "best_local16_s": round(b16, 2),
            "speedup": round(b4 / b16, 2),
            "efficiency": round(b4 / b16 / (LEVELS[1] / LEVELS[0]), 3),
        }
    with open(REPO / "BENCH" / "curation_scaling.json", "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(json.dumps({k: summary[k] for k in ("nb_score", "embeddings")}))


if __name__ == "__main__":
    main()
