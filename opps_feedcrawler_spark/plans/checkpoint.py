"""Iceberg-style snapshot log: atomic round commits, per-partition lineage,
metrics, time travel, bit-for-bit resume (SURVEY.md §2 A16-A17).

Reference behavior [PK]: one ORM transaction per entry + Celery retry — no
job-level resumability. North star: "each scheduling round is a checkpointed
Iceberg snapshot carrying per-partition lineage and fetch metrics, so a
killed job resumes bit-for-bit" (BASELINE.json:6).

No Iceberg runtime jar exists in this environment (SURVEY.md §4.2.5), so
this module implements the required subset with Parquet + a JSON snapshot
log and the SAME commit semantics:

- data files are written first (executor-side), under data/round=N/<table>/;
- the snapshot JSON (manifest of files + per-file row counts/bytes =
  per-partition lineage, plus round metrics) is written to a temp name and
  atomically os.rename()d into snapshots/ LAST;
- a crash anywhere before the rename leaves no visible snapshot → the round
  never happened → resume re-runs it deterministically (bit-for-bit because
  every plan in plans/crawl.py is a pure function of the previous snapshot:
  total-order sort keys, pinned shuffle partitioning, pure UDFs, no clock).

On a real cluster this module swaps for an Iceberg catalog
(`iceberg-spark-runtime`) behind the same commit()/latest_snapshot() API.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotLog:
    def __init__(self, warehouse: str, codec: str | None = None) -> None:
        self.warehouse = warehouse
        self.snap_dir = os.path.join(warehouse, "snapshots")
        self.data_dir = os.path.join(warehouse, "data")
        # Snapshot-sink compression (VERDICT r4 #6 bytes-per-URL): the
        # `text` table is 94% of all engine-written bytes at the bench
        # profile (measured: 1,064 of 1,128 MB over 3 rounds), and zstd
        # beats snappy by ~31% on extracted text at negligible
        # distributed CPU (the decompress rides per-core CPU, which
        # scales; the byte volume rides the shared memory bus / network,
        # which doesn't). Same tradeoff already measured for the blob
        # warehouse in bench.py. Codec is part of the warehouse config,
        # not per-write, so compaction rewrites match the deltas.
        self.codec = codec or os.environ.get("OFS_SNAPSHOT_CODEC", "zstd")
        os.makedirs(self.snap_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # -- write path ---------------------------------------------------------

    def table_path(self, round_no: int, name: str) -> str:
        return os.path.join(self.data_dir, f"round={round_no}", name)

    def write_table(self, df: DataFrame, round_no: int, name: str) -> dict:
        """Write one table's Parquet and return its lineage manifest: the
        per-partition file list with row counts and byte sizes, read from the
        Parquet FOOTERS (no Spark job — the metrics/lineage path costs zero
        cluster work per round)."""
        import pyarrow.parquet as pq

        path = self.table_path(round_no, name)
        df.write.mode("overwrite").option("compression", self.codec).parquet(
            path
        )
        files = []
        total_rows = 0
        for fn in sorted(os.listdir(path)):
            if fn.endswith(".parquet"):
                full = os.path.join(path, fn)
                nrows = pq.ParquetFile(full).metadata.num_rows
                total_rows += nrows
                files.append(
                    {"file": fn, "bytes": os.path.getsize(full), "rows": nrows}
                )
        return {"path": path, "files": files, "rows": total_rows}

    @staticmethod
    def count_where(path: str, column: str, value) -> int:
        """Driver-side filtered count over a (small) per-round table via
        pyarrow dataset — used for metrics like fetched_ok without a job."""
        import pyarrow.dataset as ds

        return ds.dataset(path, format="parquet").count_rows(
            filter=(ds.field(column) == value)
        )

    def commit(
        self,
        round_no: int,
        manifests: dict[str, dict],
        metrics: dict[str, float],
        timings: dict[str, float] | None = None,
    ) -> int:
        """Atomically publish snapshot for round_no. Returns snapshot_id.

        ``timings`` (per-phase wall seconds) is observability metadata like
        committed_ts: stored under its own key, NEVER part of the
        deterministic contract (resume equality compares ``metrics`` and
        table fingerprints only — wall time is not reproducible)."""
        snapshot_id = round_no
        parent = self.latest_snapshot_id()
        doc = {
            "snapshot_id": snapshot_id,
            "parent_snapshot_id": parent,
            "round": round_no,
            "committed_ts": time.time(),  # metadata only — never in data path
            "tables": manifests,
            "metrics": metrics,
            "timings": timings or {},
        }
        tmp = os.path.join(self.snap_dir, f".tmp-{uuid.uuid4().hex}.json")
        final = os.path.join(self.snap_dir, f"snap-{snapshot_id:08d}.json")
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, final)  # the commit point
        return snapshot_id

    # -- seen-delta compaction ----------------------------------------------
    #
    # The cumulative URL-seen set is stored as per-round DELTA files
    # (plans/crawl.py); load_seen() unions them. At 10^10 URLs a crawl runs
    # thousands of rounds, so the per-read file-set grows unboundedly —
    # compaction folds rounds 0..k into ONE base table so reads become
    # base + deltas-after-k. Same commit discipline as snapshots: data
    # first, marker JSON atomically renamed LAST; a crash mid-compaction
    # leaves no marker and readers keep using raw deltas. Contents are
    # bit-equivalent (deltas are disjoint by construction, so the base is
    # exactly their union) — resume and oracle equality are unaffected,
    # which tests/test_resume.py asserts end-to-end.

    def compact_seen(
        self, spark: SparkSession, upto_round: int, partitions: int = 64
    ) -> dict:
        """Fold seen deltas of rounds 0..upto_round into one base table,
        hash-partitioned by url_norm (so the per-round anti-join reads a
        well-bucketed layout). Idempotent per upto_round. Old delta files
        are retained for time travel to rounds < upto_round; a deployment
        that expires old snapshots can vacuum them with the snapshots."""
        paths = [
            self.read_snapshot(r)["tables"]["seen_delta"]["path"]
            for r in range(upto_round + 1)
        ]
        out = os.path.join(self.data_dir, f"seen_base={upto_round}")
        (
            spark.read.parquet(*paths)
            .repartition(partitions, "url_norm")
            .write.mode("overwrite")
            .option("compression", self.codec)
            .parquet(out)
        )
        doc = {"upto": upto_round, "path": out}
        tmp = os.path.join(self.snap_dir, f".tmp-{uuid.uuid4().hex}.json")
        final = os.path.join(self.snap_dir, f"base-{upto_round:08d}.json")
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, final)  # the commit point
        return doc

    def latest_seen_base(self, max_round: int) -> dict | None:
        """Newest committed base with upto ≤ max_round, else None."""
        best = None
        for fn in os.listdir(self.snap_dir):
            if fn.startswith("base-") and fn.endswith(".json"):
                upto = int(fn[len("base-") : -len(".json")])
                if upto <= max_round and (best is None or upto > best):
                    best = upto
        if best is None:
            return None
        with open(os.path.join(self.snap_dir, f"base-{best:08d}.json")) as f:
            return json.load(f)

    # Engine-STATE tables are superseded every round (the next snapshot
    # carries the whole frontier/bloom/cumulative seen view); PRODUCT
    # tables are the crawl's output and must never be vacuumed.
    ENGINE_STATE_TABLES = ("frontier", "bloom", "schedule")

    def vacuum_engine_state(self, keep_last: int = 1) -> list[int]:
        """Delete superseded engine-state table data (frontier/bloom/
        schedule) for all but the newest `keep_last` snapshots — the
        frontier and bloom are the largest per-round rewrites, so without
        vacuuming a long crawl's warehouse grows O(rounds × frontier).
        Product tables (text/entries/fetch_log) and seen deltas are never
        touched (deltas feed load_seen until compacted; product is the
        point of the crawl). Each vacuumed snapshot's JSON is atomically
        rewritten with the pruned tables recorded under "expired_tables",
        so time travel fails loudly (KeyError) rather than reading
        half-deleted data. Resume only ever reads the LATEST snapshot's
        state, so vacuuming older rounds is resume-transparent
        (tests/test_resume.py). Returns the vacuumed snapshot ids."""
        import shutil

        if keep_last < 1:
            raise ValueError(
                "keep_last must be >= 1: the newest snapshot's engine "
                "state is what resume reads"
            )
        ids = self.snapshot_ids()
        vacuumed = []
        for sid in ids[: max(0, len(ids) - keep_last)]:
            snap = self.read_snapshot(sid)
            pruned = [
                t for t in self.ENGINE_STATE_TABLES if t in snap["tables"]
            ]
            if not pruned:
                continue
            for t in pruned:
                shutil.rmtree(snap["tables"][t]["path"], ignore_errors=True)
                del snap["tables"][t]
            snap["expired_tables"] = sorted(
                set(snap.get("expired_tables", [])) | set(pruned)
            )
            tmp = os.path.join(self.snap_dir, f".tmp-{uuid.uuid4().hex}.json")
            final = os.path.join(self.snap_dir, f"snap-{sid:08d}.json")
            with open(tmp, "w") as f:
                json.dump(snap, f, indent=1, sort_keys=True)
                f.flush()
                os.fsync(f.fileno())
            os.rename(tmp, final)
            vacuumed.append(sid)
        return vacuumed

    # -- read path ----------------------------------------------------------

    def snapshot_ids(self) -> list[int]:
        out = []
        for fn in os.listdir(self.snap_dir):
            if fn.startswith("snap-") and fn.endswith(".json"):
                out.append(int(fn[len("snap-") : -len(".json")]))
        return sorted(out)

    def latest_snapshot_id(self) -> int | None:
        ids = self.snapshot_ids()
        return ids[-1] if ids else None

    def read_snapshot(self, snapshot_id: int) -> dict:
        with open(os.path.join(self.snap_dir, f"snap-{snapshot_id:08d}.json")) as f:
            return json.load(f)

    def load_table(
        self, spark: SparkSession, snapshot_id: int, name: str
    ) -> DataFrame:
        """Time travel: read table `name` exactly as of snapshot_id."""
        snap = self.read_snapshot(snapshot_id)
        return spark.read.parquet(snap["tables"][name]["path"])
