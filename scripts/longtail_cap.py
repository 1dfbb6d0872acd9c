"""1 MiB payload-cap long-tail run: the round-4 `max_payload_chars`
job option exercised with data, not just a unit test.

The bench transcript snapshot carries ~1% deliberately-oversize turns
(gen.py PAYLOAD_CLASSES: MAX_PAYLOAD_CHARS + 1..50 chars). At the
default 64 KiB cap they short-circuit to status='error' /
payload_kind='oversize' rows; at --max-payload-chars 1048576 they are
real documents the kernel must extract. This harness measures BOTH
configurations on the identical staged snapshot (same staging +
warmup hygiene as bench.py, trials interleaved across caps so host
phases hit both alike) and reports the oversize rate before/after and
the throughput delta — the long-tail cost a 100 TB operator pays for
raising the cap.

Usage: python scripts/longtail_cap.py [sf_dir] [trials]
Prints one JSON line.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CAPS = (65536, 1048576)


def timed_run(spark, staged: str, cap: int) -> dict:
    from pyspark.sql import functions as F

    from docling_api_spark.extraction.kernel import ExtractOptions
    from docling_api_spark.operators.extract import extract_text_column

    t0 = time.time()
    df = spark.read.parquet(staged)
    ex = extract_text_column(df, options=ExtractOptions(
        max_payload_chars=cap))
    row = ex.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("status") == "success").cast("long")).alias("ok"),
        F.sum((F.col("payload_kind") == "oversize").cast("long"))
        .alias("n_oversize"),
        F.sum(F.length("extracted_text")).alias("out_chars"),
    ).collect()[0]
    dt = time.time() - t0
    return {
        "sec": round(dt, 2),
        "turns": int(row["n"]),
        "turns_per_sec": round(row["n"] / dt, 1),
        "n_success": int(row["ok"]),
        "n_oversize": int(row["n_oversize"]),
        "oversize_rate": round(row["n_oversize"] / row["n"], 6),
        "out_chars": int(row["out_chars"]),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    import bench  # staging + warmup hygiene shared with the bench

    from docling_api_spark.session import get_spark

    spark = get_spark(
        app_name="longtail_cap",
        master=f"local[{bench.CPUS}]",
        shuffle_partitions=bench.CPUS,
        extra_conf={"spark.sql.files.maxPartitionBytes": "16m"},
    )
    staged = bench.stage_transcripts(spark, bench.sf_of(sf_dir))
    bench.warmup(spark, staged)

    runs: dict[int, list[dict]] = {c: [] for c in CAPS}
    for _ in range(trials):
        for cap in CAPS:  # interleaved: host drift hits both caps alike
            r = timed_run(spark, staged, cap)
            runs[cap].append(r)
            print(f"cap={cap}: {r}", file=sys.stderr, flush=True)
    best = {c: max(v, key=lambda d: d["turns_per_sec"])
            for c, v in runs.items()}
    lo, hi = best[CAPS[0]], best[CAPS[1]]
    out = {
        "sf_dir": sf_dir,
        "trials_per_cap": trials,
        "default_cap": {"max_payload_chars": CAPS[0], **lo},
        "raised_cap": {"max_payload_chars": CAPS[1], **hi},
        # long-tail cost of actually extracting the ~1% oversize docs
        # instead of short-circuiting them to error rows
        "throughput_ratio_raised_vs_default": round(
            hi["turns_per_sec"] / lo["turns_per_sec"], 4),
        "oversize_docs_recovered": lo["n_oversize"] - hi["n_oversize"],
        "extra_out_chars": hi["out_chars"] - lo["out_chars"],
        "all_trials_turns_per_sec": {
            str(c): [r["turns_per_sec"] for r in runs[c]] for c in CAPS},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
