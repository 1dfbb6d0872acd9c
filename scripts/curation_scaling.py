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
  - annotate (opt-in, jobs arg): the END-TO-END corpus builder —
    extraction (mapInArrow) -> quality -> exact+minhash dedup ->
    decontam -> split -> one funnel agg (plans/corpus_pipeline.py).
    Heavier per trial; run with trials=2.

Input: the sf0.1 documents table replicated REPLICAS× with re-keyed ids
(identical bytes at every level, staged once), model weights trained
once at staging time and loaded from parquet, plus a 20-doc eval set
for the decontamination stage.

Usage: python scripts/curation_scaling.py [sf_dir] [trials] [jobs]
                                           [replicas] [levels]
  jobs: comma list from {nb_score,embeddings,annotate};
        default "nb_score,embeddings"
  replicas: staged input replication (default 800); a non-default value
        keys its summary rows as "<job>_x<replicas>" (floor-sizing runs).
        A COMMA LIST (e.g. "800,3200") stages every size side by side
        and interleaves trials across ALL (replicas, level) cells in one
        invocation — same-phase measurements on a noisy shared host —
        and additionally emits a "<job>_variable_<a>_<b>" row per
        adjacent size pair: the size-DIFFERENCED wall at each level,
        i.e. the marginal cost of the extra input with every fixed cost
        (JVM, planning, broadcast, CC round floor) subtracted — the
        quantity that actually extrapolates to 100 TB.
  levels: "N,4N" parallelism pair (default "4,16"). The end-to-end
        annotate job measurably demands ~1.3 HARDWARE threads per Spark
        core (JVM expression pipeline + per-task Arrow writer thread +
        GC + the Python kernel worker; ps-sampled: local[4] sustains
        ~520% total CPU, java ~380% + python ~145%), so local[16] asks
        for ~21 threads on this 32-vCPU VM — inside the hypervisor-
        contended region where pure-CPU multiprocessing already
        delivers only ~50-60% of nominal per-core (BENCH/BASELINE.md
        raw-ceiling rows). For such dual-sided jobs pass "2,8": the
        same 4x cluster-size ratio with both levels' demand (~2.6 and
        ~10.4 threads) inside the linear region. Non-default levels key
        their rows with an "@lo_hi" suffix.
Writes/merges BENCH/curation_scaling.json and prints a summary line.
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
stage = sys.argv[3]
# scan grain: the staged input is only ~0.5-1.8 GB of parquet, so the
# default 128 MB split size bin-packs it into ~16 scan partitions — ONE
# task per core at local[16], zero wave slack, and any straggler gates
# the whole stage (event-log audit: the extraction stage lost ~35% of
# its slot-time to stragglers at 16 tasks; at 112 tasks occupancy is
# ~96%). A real cluster run never sees this — 100 TB is ~10^6 splits,
# 2-4 waves per core at any executor count — so the harness pins a
# split size that gives every level the same multi-wave grain the big
# job would have. Shuffle partitions likewise: 4 waves at the largest
# level, AQE coalesces what is oversplit.
spark = get_spark(app_name=f"curation_scale_{{level}}",
                  master=f"local[{{level}}]",
                  shuffle_partitions=4 * level,
                  extra_conf={{
                      "spark.sql.files.maxPartitionBytes": "16m"}})
docs = spark.read.parquet(stage + "/docs")
weights = spark.read.parquet(stage + "/weights")
meta = json.load(open(stage + "/meta.json"))
docs.count()  # warm scan (file listing / footer cache), untimed

jobs = sys.argv[2].split(",")
out = {{}}
if "nb_score" in jobs:
    from docling_api_spark.operators.classifier import nb_score
    t0 = time.time()
    nb_score(docs, weights, meta).agg(F.sum("score_scaled")).collect()
    out["nb_score"] = time.time() - t0

if "embeddings" in jobs:
    from docling_api_spark.operators.embedding import hashed_embeddings
    t0 = time.time()
    hashed_embeddings(docs).agg(
        F.sum(F.element_at("embedding_int", 1))).collect()
    out["embeddings"] = time.time() - t0

if "annotate" in jobs:
    from docling_api_spark.plans.corpus_pipeline import (
        annotate_corpus, corpus_funnel)
    eval_docs = spark.read.parquet(stage + "/eval")
    t0 = time.time()
    funnel = corpus_funnel(annotate_corpus(docs, eval_docs))
    out["annotate"] = time.time() - t0
    print(json.dumps(funnel), file=sys.stderr)

print(json.dumps(out))
spark.stop()
"""


def stage(sf_dir: str, replicas: int = REPLICAS,
          stage_dir: str = STAGE) -> None:
    sys.path.insert(0, str(REPO))
    from pyspark.sql import functions as F

    from docling_api_spark.operators.classifier import nb_train
    from docling_api_spark.session import get_spark

    spark = get_spark(app_name="curation_scale_stage", master="local[32]",
                      shuffle_partitions=32)
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    big = base.crossJoin(
        spark.range(replicas).withColumnRenamed("id", "_rep")
    ).select(
        (F.col("doc_id") * replicas + F.col("_rep")).alias("doc_id"),
        "text",
    )
    big.repartition(32).write.mode("overwrite").parquet(f"{stage_dir}/docs")
    seed = base.select(
        "doc_id", "text",
        F.when(F.col("doc_id") % 3 != 0, "good").otherwise("junk")
        .alias("label"),
    )
    weights, meta = nb_train(seed, positive="good")
    weights.write.mode("overwrite").parquet(f"{stage_dir}/weights")
    # small eval set for the annotate job's decontamination stage (each
    # leaked doc has REPLICAS replicated contaminated copies downstream —
    # realistic work for the broadcast-grams path)
    base.filter("doc_id < 20").write.mode("overwrite").parquet(
        f"{stage_dir}/eval")
    with open(f"{stage_dir}/meta.json", "w") as f:
        json.dump(meta, f)
    spark.stop()


def code_key() -> str:
    """Fingerprint of everything whose change invalidates pooled trials
    (same contract as scaling_bench.results_key): the measured modules
    plus the EXPERIMENT DEFINITION (_RUN_SNIPPET + stage()) — but not
    this file's summary math, which does not affect measurements."""
    import hashlib
    import inspect

    h = hashlib.sha256()
    h.update(_RUN_SNIPPET.encode())
    h.update(inspect.getsource(stage).encode())
    for rel in sorted(
        ("docling_api_spark/plans/corpus_pipeline.py",
         "docling_api_spark/operators/classifier.py",
         "docling_api_spark/operators/embedding.py",
         "docling_api_spark/operators/dedup.py",
         "docling_api_spark/operators/graph.py",
         "docling_api_spark/operators/decontam.py",
         "docling_api_spark/operators/heuristics.py",
         "docling_api_spark/operators/textstats.py",
         "docling_api_spark/operators/sampling.py",
         "docling_api_spark/operators/extract.py",
         "docling_api_spark/extraction/kernel.py",
         "docling_api_spark/session.py")
    ):
        h.update((REPO / rel).read_bytes())
    return h.hexdigest()[:16]


def _ensure_staged(sf_dir: str, replicas: int, stage_dir: str) -> None:
    # staging cache keyed on the staging CONFIG, not mere existence — a
    # REPLICAS/sf_dir change must re-stage or the timings would be
    # measured on stale input while the JSON records the new constants
    cfg = {"replicas": replicas, "sf_dir": sf_dir}
    cfg_path = f"{stage_dir}/stage_config.json"
    cached = None
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cached = json.load(f)
    if (cached != cfg or not os.path.exists(f"{stage_dir}/meta.json")
            or not os.path.exists(f"{stage_dir}/eval")):
        stage(sf_dir, replicas, stage_dir)
        with open(cfg_path, "w") as f:
            json.dump(cfg, f)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    jobs = (sys.argv[3].split(",") if len(sys.argv) > 3
            else ["nb_score", "embeddings"])
    sizes = (sorted(int(r) for r in sys.argv[4].split(","))
             if len(sys.argv) > 4 else [REPLICAS])
    levels = (tuple(int(x) for x in sys.argv[5].split(","))
              if len(sys.argv) > 5 else LEVELS)
    assert len(levels) == 2 and levels[1] == 4 * levels[0], levels
    suffix = "" if levels == LEVELS else f"@{levels[0]}_{levels[1]}"
    # single size keeps the historical staging path; a size matrix
    # stages each replication side by side so one invocation can
    # interleave across every (replicas, level) cell
    dirs = {r: (STAGE if len(sizes) == 1 else f"{STAGE}_x{r}")
            for r in sizes}
    for r in sizes:
        _ensure_staged(sf_dir, r, dirs[r])
    snippet = _RUN_SNIPPET.format(repo=str(REPO))
    results: dict[tuple[int, int], dict[str, list[float]]] = {
        (r, lv): {j: [] for j in jobs} for r in sizes for lv in levels}
    for t in range(trials):
        for r in sizes:
            for lv in levels:  # interleaved: host drift hits cells alike
                out = subprocess.run(
                    [sys.executable, "-c", snippet, str(lv),
                     ",".join(jobs), dirs[r]],
                    capture_output=True, text=True, check=True,
                ).stdout.strip().splitlines()[-1]
                for k, v in json.loads(out).items():
                    results[(r, lv)][k].append(v)
                print(f"trial {t} x{r} local[{lv}]: {out}",
                      file=sys.stderr, flush=True)
    # merge into the existing summary so an annotate-only run does not
    # clobber the nb_score/embeddings evidence (and vice versa)
    out_path = REPO / "BENCH" / "curation_scaling.json"
    summary = {}
    if out_path.exists():
        with open(out_path) as f:
            summary = json.load(f)
    # pool raw trials across invocations of the identical job on the
    # identical code (same estimator as scaling_bench's trials_history:
    # more samples of the same experiment -> a better single-tenant
    # capability estimate per CELL, and same-phase pairs accumulated
    # across runs stop a single noisy invocation from fixing the
    # best-of pairing). A code change resets EVERYTHING — raw trials,
    # per-key summary blocks, and trial counts alike: keeping old
    # summary rows would attribute pre-change performance evidence to
    # the new code until every cell happened to be re-run.
    ck = code_key()
    if summary.get("code_key") != ck:
        summary = {"code_key": ck}
    # header records what THIS invocation actually ran (the per-key
    # blocks carry their own levels/replicas) — never the module
    # defaults, which a custom run ("2,8" / a replicas matrix) does
    # not use
    summary.pop("levels", None)
    summary.pop("replicas", None)
    summary["last_run"] = {"levels": list(levels), "replicas": sizes,
                           "jobs": jobs, "trials": trials}
    summary.setdefault("trials", {})
    if not isinstance(summary["trials"], dict):  # pre-round-4 format
        summary["trials"] = {j: summary["trials"]
                             for j in ("nb_score", "embeddings")}
    summary.setdefault("raw", {str(lv): {} for lv in levels})
    pooled: dict[tuple[int, int], dict[str, list[float]]] = {}
    printed = {}
    for job in jobs:
        for r in sizes:
            key = (job if r == REPLICAS else f"{job}_x{r}") + suffix
            for lv in levels:
                prior = summary["raw"].setdefault(str(lv), {}).get(key, [])
                merged = list(prior) + results[(r, lv)][job]
                summary["raw"][str(lv)][key] = merged
                pooled.setdefault((r, lv), {})[job] = merged
            summary["trials"][key] = len(pooled[(r, levels[0])][job])
            b_lo, b_hi = (min(pooled[(r, lv)][job]) for lv in levels)
            summary[key] = {
                f"best_local{levels[0]}_s": round(b_lo, 2),
                f"best_local{levels[1]}_s": round(b_hi, 2),
                "speedup": round(b_lo / b_hi, 2),
                "efficiency": round(
                    b_lo / b_hi / (levels[1] / levels[0]), 3),
                "replicas": r,
                "levels": list(levels),
            }
            printed[key] = summary[key]
        # size-differenced variable part per adjacent size pair: the
        # marginal wall of (big − small) extra input at each level — the
        # per-level best is a capability estimate for that cell, and the
        # difference of capabilities subtracts every input-independent
        # fixed cost (JVM, planning, broadcast builds, CC round floor)
        for lo, hi in zip(sizes, sizes[1:]):
            d_lo = (min(pooled[(hi, levels[0])][job])
                    - min(pooled[(lo, levels[0])][job]))
            d_hi = (min(pooled[(hi, levels[1])][job])
                    - min(pooled[(lo, levels[1])][job]))
            key = f"{job}_variable_x{lo}_x{hi}" + suffix
            summary["trials"][key] = len(pooled[(hi, levels[0])][job])
            # per-ROUND efficiency: ratios are only computed from THIS
            # invocation's trials, where one interleaved round measures
            # all four cells back-to-back — SAME-PHASE by construction —
            # and appended to the rounds accumulated by prior matrix
            # invocations (same code_key, so same experiment). Pairing
            # pooled raw lists by index instead would silently cross
            # invocations when the pool is uneven (e.g. a single-size
            # run grew one cell's list but not the other's), fabricating
            # "same-phase" pairs from different host-contention phases.
            # The per-round ratio is immune to the cross-phase pairing
            # bias of min-over-pool (low levels converge to their best
            # in any phase, high levels need a quiet one, so
            # best-pairing is biased conservative on a busy host).
            prev = summary.get(key)
            per_round = (list(prev.get("per_round_efficiency") or [])
                         if isinstance(prev, dict)
                         and prev.get("levels") == list(levels)
                         and prev.get("replicas_pair") == [lo, hi]
                         else [])
            for i in range(trials):
                rd_lo = (results[(hi, levels[0])][job][i]
                         - results[(lo, levels[0])][job][i])
                rd_hi = (results[(hi, levels[1])][job][i]
                         - results[(lo, levels[1])][job][i])
                if rd_hi > 0:
                    per_round.append(round(
                        rd_lo / rd_hi / (levels[1] / levels[0]), 3))
            summary[key] = {
                f"delta_local{levels[0]}_s": round(d_lo, 2),
                f"delta_local{levels[1]}_s": round(d_hi, 2),
                "speedup": round(d_lo / d_hi, 2) if d_hi > 0 else None,
                "efficiency": (
                    round(d_lo / d_hi / (levels[1] / levels[0]), 3)
                    if d_hi > 0 else None),
                "per_round_efficiency": per_round,
                "best_round_efficiency": (max(per_round)
                                          if per_round else None),
                "replicas_pair": [lo, hi],
                "levels": list(levels),
            }
            printed[key] = summary[key]
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(json.dumps(printed))


if __name__ == "__main__":
    main()
