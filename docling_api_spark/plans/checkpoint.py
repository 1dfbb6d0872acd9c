"""Manifest-based snapshot/commit emulation (resumability, north rule).

In production framing this is an Iceberg table: each run's appended data
files + a snapshot commit; resume = diff committed snapshots. Iceberg
jars are not in this sandbox (documented substitution, SURVEY.md §7.3.3),
so snapshots are emulated deterministically:

- ``manifest.json`` lists committed (run_id, bucket) pairs (atomic
  tmp+rename write). Data files live under ``data/run_id=R/bucket=B/``;
  a killed run leaves the previous manifest intact, so its partial data
  files belong to a (run_id, bucket) pair that was never committed and
  are invisible to ``committed_view`` — the same way Iceberg orphans
  uncommitted data files. The resume then reprocesses those buckets
  under a new run_id, with no double counting.
- Idempotent re-commit: committing an already-committed bucket is a
  no-op (J3 anti-join semantics; reference stripe_service.py:214-231).

Readers of the output MUST go through ``committed_view`` which filters
to manifest-committed buckets — the Iceberg-snapshot-isolation analog.
"""

from __future__ import annotations

import contextlib
import json
import os
import pathlib
import time


class Manifest:
    def __init__(self, output_dir: str):
        self.dir = pathlib.Path(output_dir)
        self.path = self.dir / "manifest.json"
        self.lock_path = self.dir / "manifest.lock"

    @contextlib.contextmanager
    def _locked(self):
        """Advisory mutation lock: every read-modify-write of
        manifest.json runs under an exclusive ``flock`` on a persistent
        lock file, so a vacuum's lease pruning cannot lose-update a
        concurrent run's commit. Readers stay lock-free (the tmp+rename
        write is atomic). flock is kernel-arbitrated (no stat/steal
        races) and auto-released when the holder dies, so no staleness
        heuristics or grave files are needed. Local-filesystem semantics
        are what this sandbox emulation targets; the production framing
        is an Iceberg catalog's atomic commit, not file locks."""
        self.dir.mkdir(parents=True, exist_ok=True)
        import fcntl

        fd = os.open(self.lock_path, os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    def _read(self) -> dict:
        if not self.path.exists():
            return {"runs": [], "buckets": [], "run_counter": 0,
                    "inflight": {}, "retired": []}
        state = json.loads(self.path.read_text())
        state.setdefault("retired", [])
        if "run_counter" not in state:
            # back-compat migration: the pre-counter era burned ids that
            # len(runs) does NOT count (compaction collapses runs to one
            # entry; crashed runs never appear) — seeding with the list
            # length would REUSE an id whose dir still exists and
            # resurrect its stale rows into the re-committed partitions.
            # Seed from the max numeric suffix across every id we can
            # still see: runs, retired entries, and on-disk data dirs.
            def _suffix(rid: str) -> int:
                try:
                    return int(rid.rsplit("-", 1)[1])
                except (IndexError, ValueError):
                    return -1

            known = [r["run_id"] for r in state["runs"]]
            known += list(state["retired"])
            data = self.dir / "data"
            if data.exists():
                known += [d.name.split("=", 1)[1]
                          for d in data.glob("run_id=*")]
            state["run_counter"] = 1 + max(
                (_suffix(r) for r in known), default=-1
            )
        inflight = state.setdefault("inflight", {})
        if isinstance(inflight, list):  # pre-timestamp lease format:
            # stamp with the manifest file's mtime — a STABLE historical
            # instant (>= the reservation time), so the migrated lease
            # both gets a real grace window and actually ages out.
            # Stamping NOW would restart the window on every read (a
            # vacuum-only workload would never reclaim); stamping 0.0
            # would make every legacy lease instantly reclaimable.
            stamp = self.path.stat().st_mtime
            state["inflight"] = {r: stamp for r in inflight}
        return state

    def _write(self, state: dict) -> None:
        self.dir.mkdir(parents=True, exist_ok=True)
        tmp = self.path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(state, indent=1, sort_keys=True))
        os.replace(tmp, self.path)  # atomic commit

    def committed_buckets(self) -> set[int]:
        return set(self._read()["buckets"])

    def next_run_id(self) -> str:
        """RESERVE the next run id: the incremented counter is persisted
        atomically BEFORE any data is written, so ids are never reused —
        a run that crashes after writing parquet but before committing
        burns its id and its directory stays an invisible orphan until
        vacuum (recycling the id would resurrect the orphan's rows into
        the re-committed (run_id, bucket) partitions). The id is also
        recorded as in-flight: vacuum() will not delete a fresh
        uncommitted dir out from under a live run."""
        with self._locked():
            state = self._read()
            run_id = f"run-{state['run_counter']:04d}"
            state["run_counter"] += 1
            # lease value = reservation time (ops-plane staleness signal
            # for vacuum; nothing in the data plane reads it)
            state["inflight"][run_id] = time.time()
            self._write(state)
        return run_id

    def _settle(self, state: dict, run_id: str) -> None:
        state["inflight"].pop(run_id, None)

    def commit(self, run_id: str, snapshot_id: str, buckets: list[int],
               data_schema_json: str | None = None,
               expect_data: bool = False, n_buckets: int | None = None) -> None:
        """``expect_data=True`` asserts the run's data dir still exists at
        commit time (callers that wrote >0 rows set it): a dir reclaimed
        by a force-vacuum between write and commit must fail the commit
        loudly, never mark buckets committed with their data gone.
        ``n_buckets`` is recorded on first commit and must match on every
        later commit — mixing two bucketings in one output dir silently
        skips re-hashed rows on resume."""
        with self._locked():
            state = self._read()
            if expect_data and not (self.dir / "data" / f"run_id={run_id}").exists():
                raise RuntimeError(
                    f"commit refused: data dir for {run_id} is missing "
                    "(reclaimed by vacuum?) — re-run the buckets"
                )
            if n_buckets is not None:
                recorded = state.get("n_buckets")
                if recorded is not None and recorded != n_buckets:
                    raise ValueError(
                        f"n_buckets mismatch: manifest has {recorded}, "
                        f"commit got {n_buckets}"
                    )
                state["n_buckets"] = n_buckets
            done = set(state["buckets"])  # hoisted: the comprehension
            # would otherwise rebuild the set per bucket (O(B²) while
            # holding the exclusive manifest lock)
            new = [b for b in buckets if b not in done]
            state["runs"].append(
                {"run_id": run_id, "snapshot_id": snapshot_id, "buckets": new}
            )
            state["buckets"] = sorted(set(state["buckets"]) | set(new))
            if data_schema_json:
                # recorded so committed_view can read a data dir that holds
                # no parquet files yet (zero-row runs) without inference
                state["data_schema"] = data_schema_json
            self._settle(state, run_id)
            self._write(state)

    def data_schema_json(self) -> str | None:
        return self._read().get("data_schema")

    def n_buckets(self) -> int | None:
        return self._read().get("n_buckets")

    def replace_runs(self, run_id: str, snapshot_id: str,
                     expect_data: bool = False) -> None:
        """Compaction commit: the single ``run_id`` now carries EVERY
        committed bucket; prior runs' data dirs become orphans (invisible
        to committed_view) and are recorded as RETIRED — vacuum may
        reclaim a retired dir immediately (its rows live on in the
        compacted run), while unknown dirs get the mtime grace window.
        The committed-bucket set is unchanged — resume is unaffected."""
        with self._locked():
            state = self._read()
            if expect_data and not (self.dir / "data" / f"run_id={run_id}").exists():
                raise RuntimeError(
                    f"compaction commit refused: data dir for {run_id} is "
                    "missing (reclaimed by vacuum?)"
                )
            retired = {r["run_id"] for r in state["runs"]} - {run_id}
            state["retired"] = sorted(set(state["retired"]) | retired)
            state["runs"] = [
                {"run_id": run_id, "snapshot_id": snapshot_id,
                 "buckets": list(state["buckets"])}
            ]
            self._settle(state, run_id)
            self._write(state)

    def snapshot(self) -> dict:
        """One consistent, migrated view of the whole manifest state —
        use this when multiple views (runs/leases/retired) must agree
        (e.g. vacuum), instead of N accessor calls that each re-read."""
        return self._read()

    @contextlib.contextmanager
    def mutate(self):
        """Read-modify-write of the whole manifest state under the
        mutation lock: yields the state dict; the (possibly modified)
        dict is atomically written back on normal exit. Used by vacuum so
        its delete-then-prune is one atomic step against concurrent
        commits — a commit landing after the lock is taken sees either
        the pre-vacuum or post-vacuum state, never a half-pruned one."""
        with self._locked():
            state = self._read()
            yield state
            self._write(state)

    def inflight(self) -> set[str]:
        return set(self._read()["inflight"])

    def inflight_leases(self) -> dict[str, float]:
        return dict(self._read()["inflight"])

    def retired(self) -> set[str]:
        return set(self._read()["retired"])

    def runs(self) -> list[dict]:
        return self._read()["runs"]


def manifest_data_reader(spark, manifest: Manifest):
    """DataFrameReader for the manifest's data dir: uses the recorded
    write schema when present so a file-less (zero-row) dir reads as
    empty instead of failing schema inference. Shared by committed_view
    and compact()."""
    from pyspark.sql import types as T

    schema_json = manifest.data_schema_json()
    if schema_json:
        return spark.read.schema(T.StructType.fromJson(json.loads(schema_json)))
    return spark.read  # pre-schema manifests: infer as before


def committed_view(spark, output_dir: str):
    """Snapshot-isolated read: only manifest-committed (run_id, bucket)
    pairs are visible; orphan files from killed runs are filtered by the
    partition columns (partition pruning — no data files of orphaned
    runs are even opened)."""
    from functools import reduce

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    m = Manifest(output_dir)
    runs = [r for r in m.runs() if r["buckets"]]
    if not runs:
        # zero committed runs: return an empty frame WITHOUT touching
        # the data path — on a fresh output dir the parquet reader would
        # raise PATH_NOT_FOUND before reaching any limit(0)
        schema_json = m.data_schema_json()
        if schema_json:
            return spark.createDataFrame(
                [], T.StructType.fromJson(json.loads(schema_json))
            )
        data = pathlib.Path(output_dir) / "data"
        if data.exists():
            return spark.read.parquet(f"{output_dir}/data").limit(0)
        return spark.createDataFrame([], T.StructType([]))
    df = manifest_data_reader(spark, m).parquet(f"{output_dir}/data")
    cond = reduce(
        lambda a, b: a | b,
        [
            (F.col("run_id") == r["run_id"]) & F.col("bucket").isin(r["buckets"])
            for r in runs
        ],
    )
    return df.filter(cond)
