"""Iceberg-semantics table catalog over Parquet (SURVEY.md §7.2).

The sandbox has no Iceberg runtime jar and no network to fetch one, so this
layer reproduces the Iceberg semantics the north_star depends on — atomic
snapshot commits, a manifest log, time-travel by crawl round, and
append-vs-overwrite table evolution — over plain Parquet directories. On a
real cluster the same interface maps 1:1 onto
``spark.read.format("iceberg")`` + ``VERSION AS OF`` / ``snapshot-id``
(catalog conf switch); nothing above this module knows the difference.

Layout:
    base/_manifest.jsonl            -- the snapshot log (small, driver-side)
    base/<table>/snap-<n>/part-*.parquet

Commit protocol (crash-safe, like Iceberg's):
  1. Spark writes the new data files into a fresh snapshot dir.
  2. The manifest is rewritten to a temp file and atomically renamed over
     the old one (os.replace on one filesystem == atomic metadata swap).
A crash between 1 and 2 leaves orphan files but an unchanged, consistent
manifest — exactly Iceberg's failure model. Readers only ever see
manifest-listed snapshots, so resume-from-round-R is exact (north_rule:
"resumable from checkpoint with per-partition lineage").
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class _Snap:
    table: str
    round: int
    snapshot_id: str
    mode: str            # 'append' | 'overwrite'
    dirs: list[str]      # full file-dir list for this snapshot (Iceberg manifest analogue)
    committed_ts: float
    data_dir: str = ""   # the single dir this commit added (delta reads)
    compaction: bool = False  # rewrite_data_files snapshot: same rows, new files


class Catalog:
    def __init__(self, base: str) -> None:
        self.base = base
        os.makedirs(base, exist_ok=True)

    # ---- manifest ----------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.base, "_manifest.jsonl")

    def _read_manifest(self) -> list[_Snap]:
        if not os.path.exists(self._manifest_path):
            return []
        out = []
        with open(self._manifest_path, "r", encoding="utf-8") as f:
            for line in f:
                if line.strip():
                    out.append(_Snap(**json.loads(line)))
        return out

    def _write_manifest(self, snaps: list[_Snap]) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            for s in snaps:
                f.write(json.dumps(s.__dict__) + "\n")
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path)  # atomic commit point

    # ---- public API ---------------------------------------------------
    def commit(
        self, name: str, df: DataFrame, round: int, mode: str = "overwrite",
        compaction: bool = False,
    ) -> str:
        """Atomically commit a new generation of `name` for crawl `round`.

        'overwrite' snapshots replace the table; 'append' snapshots extend
        the previous snapshot's file list (no rewrite of old data — O(delta)
        per round, which is what makes a 10^10-row seen set committable).
        `compaction` marks a rewrite_data_files snapshot (same logical rows,
        new physical files) so incremental readers (load_delta) skip it."""
        snaps = self._read_manifest()
        n = sum(1 for s in snaps if s.table == name)
        snap_id = f"snap-{name}-{n:05d}-r{round}"
        data_dir = os.path.join(self.base, name, snap_id)
        # a prune() (crash rollback) can leave orphan dirs whose sequence
        # number a later commit would reuse — skip past them (Iceberg's
        # analogue: snapshot ids are never reused after expiry)
        while os.path.exists(data_dir):
            n += 1
            snap_id = f"snap-{name}-{n:05d}-r{round}"
            data_dir = os.path.join(self.base, name, snap_id)
        df.write.mode("errorifexists").parquet(data_dir)
        prev = self._latest(snaps, name, None)
        dirs = [data_dir] if mode == "overwrite" else (list(prev.dirs) if prev else []) + [data_dir]
        snaps.append(_Snap(name, round, snap_id, mode, dirs, time.time(), data_dir, compaction))
        self._write_manifest(snaps)
        return snap_id

    @staticmethod
    def _latest(snaps: list[_Snap], name: str, round: int | None) -> _Snap | None:
        cand = [s for s in snaps if s.table == name and (round is None or s.round <= round)]
        return cand[-1] if cand else None

    def load(self, spark: SparkSession, name: str, round: int | None = None) -> DataFrame:
        """Read table `name` as of crawl `round` (time-travel; latest if
        None). Reads only the manifest-listed file dirs — later snapshots
        are invisible, so a resumed run sees exactly the checkpoint."""
        s = self._latest(self._read_manifest(), name, round)
        if s is None:
            raise KeyError(f"no snapshot for table {name!r} at round {round!r}")
        return spark.read.parquet(*s.dirs)

    def load_delta(self, spark: SparkSession, name: str, round: int) -> DataFrame:
        """Read ONLY the files a specific round's commit added (an Iceberg
        incremental/changelog read). Lets a round re-read its own freshly
        written data with column pruning instead of holding a wide persist.
        Compaction snapshots are skipped: they rewrite the WHOLE table at
        the current round, so treating one as that round's delta would
        return every row ever committed (ADVICE r02)."""
        cand = [
            s for s in self._read_manifest()
            if s.table == name and s.round == round and s.data_dir
            and not s.compaction
        ]
        if not cand:
            raise KeyError(f"no delta commit for table {name!r} at round {round}")
        return spark.read.parquet(cand[-1].data_dir)

    def prune(self, keep) -> int:
        """Atomically drop every manifest snapshot for which ``keep(snap)``
        is false; returns how many were dropped. Data files stay on disk as
        orphans (Iceberg's expired-snapshot model) — readers never see them
        because reads go through the manifest only. This is the rollback
        primitive crash recovery uses to discard a partially committed
        round before re-running it (see gpse/crawl.py resume)."""
        snaps = self._read_manifest()
        kept = [s for s in snaps if keep(s)]
        if len(kept) != len(snaps):
            self._write_manifest(kept)
        return len(snaps) - len(kept)

    def compact(self, spark: SparkSession, name: str, target_partitions: int | None = None) -> str:
        """Rewrite the table's CURRENT file set as one snapshot (Iceberg's
        rewrite_data_files). Append-mode tables accumulate one directory
        per round — at 10^10 scale that is the classic small-file problem:
        every reader pays a footer read per file and partition planning
        degrades. Compaction folds the chain into a single dir; the round
        number and time-travel to PRIOR snapshots are preserved (their
        dirs are still referenced by the older manifest entries until
        expire_snapshots)."""
        snaps = self._read_manifest()
        cur = self._latest(snaps, name, None)
        if cur is None:
            raise KeyError(f"no snapshot for table {name!r}")
        df = spark.read.parquet(*cur.dirs)
        if target_partitions:
            df = df.coalesce(target_partitions)
        return self.commit(name, df, cur.round, mode="overwrite", compaction=True)

    def expire_snapshots(self, name: str, keep_last: int = 1) -> int:
        """Drop all but the last `keep_last` manifest snapshots of `name`
        and DELETE data dirs no longer referenced by any kept snapshot of
        any table (Iceberg's expire_snapshots: bounds storage growth after
        compaction). Returns the number of directories removed."""
        import shutil

        snaps = self._read_manifest()
        mine = [s for s in snaps if s.table == name]
        drop = mine[:-keep_last] if keep_last > 0 else mine
        dropped_ids = {s.snapshot_id for s in drop}
        kept = [s for s in snaps if s.snapshot_id not in dropped_ids]
        referenced = {d for s in kept for d in s.dirs}
        to_delete = [
            d for s in drop for d in s.dirs
            if d not in referenced and os.path.isdir(d)
        ]
        self._write_manifest(kept)  # atomic: readers never see a half-expire
        for d in sorted(set(to_delete)):
            shutil.rmtree(d, ignore_errors=True)
        return len(set(to_delete))

    def exists(self, name: str) -> bool:
        return self._latest(self._read_manifest(), name, None) is not None

    def latest_round(self, name: str) -> int | None:
        s = self._latest(self._read_manifest(), name, None)
        return None if s is None else s.round

    def snapshots(self, name: str | None = None) -> list[dict]:
        return [s.__dict__ for s in self._read_manifest() if name is None or s.table == name]


class IcebergCatalog:
    """Real Apache Iceberg backend behind the same interface as `Catalog`
    (commit / load / load_delta / prune / exists / latest_round /
    snapshots), so the crawl loop swaps storage layers by constructor.

    Requires a Spark session configured with an Iceberg catalog, e.g.::

        spark-submit \\
          --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \\
          --conf spark.sql.catalog.gpse=org.apache.iceberg.spark.SparkCatalog \\
          --conf spark.sql.catalog.gpse.type=hadoop \\
          --conf spark.sql.catalog.gpse.warehouse=hdfs://…/warehouse

    The sandbox has neither the runtime jar nor network to fetch it
    (SURVEY.md §0), so this class is exercised only when GPSE_ICEBERG=1
    (tests/unit/test_catalog.py skips otherwise); the parquet `Catalog`
    reproduces the same semantics offline.

    Round ↔ snapshot mapping: every commit stamps its Iceberg snapshot
    with a ``gpse-round`` snapshot property (write option
    ``snapshot-property.gpse-round``). ``load(round=R)`` resolves the
    newest snapshot whose property ≤ R from the ``<table>.snapshots``
    metadata table and time-travels with ``snapshot-id``; ``load_delta``
    is Iceberg's incremental read between a snapshot and its parent;
    ``prune`` is ``rollback_to_snapshot``.
    """

    def __init__(self, spark: SparkSession, catalog: str = "gpse", namespace: str = "crawl") -> None:
        self.spark = spark
        self.cat = catalog
        self.ns = namespace
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")

    def _tbl(self, name: str) -> str:
        return f"{self.cat}.{self.ns}.{name}"

    def _snaps(self, name: str) -> list[dict]:
        """Snapshot log of `name`, RESTRICTED to ancestors of the current
        main-branch head. The `<table>.snapshots` metadata table keeps
        rolled-back snapshots listed until expire_snapshots, so after a
        `prune` (rollback_to_snapshot) the raw table would still resolve
        the dropped rounds and silently break crash recovery (ADVICE r02).
        Walking the parent_id chain from the head makes rolled-back
        snapshots invisible, matching the parquet Catalog's manifest
        semantics."""
        rows = self.spark.sql(
            f"SELECT snapshot_id, parent_id, committed_at, operation, "
            f"summary['gpse-round'] AS r FROM {self._tbl(name)}.snapshots "
            f"ORDER BY committed_at"
        ).collect()
        by_id = {str(x.snapshot_id): x for x in rows}
        head_rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self._tbl(name)}.refs WHERE name = 'main'"
        ).collect()
        if head_rows:
            ancestors: set[str] = set()
            cur = str(head_rows[0].snapshot_id)
            while cur is not None and cur in by_id and cur not in ancestors:
                ancestors.add(cur)
                p = by_id[cur].parent_id
                cur = None if p is None else str(p)
            rows = [x for x in rows if str(x.snapshot_id) in ancestors]
        out: list[dict] = []
        rounds: dict[str, int] = {}
        for x in rows:
            sid = str(x.snapshot_id)
            pid = None if x.parent_id is None else str(x.parent_id)
            if x.r is not None:
                rnd = int(x.r)
            else:
                # maintenance snapshot (rewrite_data_files 'replace' etc.):
                # same logical rows as its parent → inherit the round, and
                # flag it so load_delta skips it (the parquet Catalog's
                # `compaction` tag, mirrored)
                rnd = rounds.get(pid, -1) if pid else -1
            rounds[sid] = rnd
            out.append(
                {
                    "table": name,
                    "round": rnd,
                    "snapshot_id": sid,
                    "parent_id": pid,
                    "committed_ts": x.committed_at.timestamp(),
                    "compaction": x.r is None,
                }
            )
        return out

    # ---- public API (mirrors Catalog) ---------------------------------
    def commit(self, name: str, df: DataFrame, round: int, mode: str = "overwrite") -> str:
        t = self._tbl(name)
        w = df.writeTo(t).option("snapshot-property.gpse-round", str(round))
        if not self.spark.catalog.tableExists(t):
            w.using("iceberg").create()
        elif mode == "overwrite":
            w.replace()
        else:
            w.append()
        return self._snaps(name)[-1]["snapshot_id"]

    def load(self, spark: SparkSession, name: str, round: int | None = None) -> DataFrame:
        t = self._tbl(name)
        if not spark.catalog.tableExists(t):
            raise KeyError(f"no snapshot for table {name!r}")
        if round is None:
            return spark.read.table(t)
        cand = [s for s in self._snaps(name) if s["round"] <= round]
        if not cand:
            raise KeyError(f"no snapshot for table {name!r} at round {round!r}")
        return spark.read.option("snapshot-id", cand[-1]["snapshot_id"]).table(t)

    def load_delta(self, spark: SparkSession, name: str, round: int) -> DataFrame:
        cand = [
            s for s in self._snaps(name)
            if s["round"] == round and not s.get("compaction")
        ]
        if not cand:
            raise KeyError(f"no delta commit for table {name!r} at round {round}")
        s = cand[-1]
        r = spark.read.format("iceberg").option("end-snapshot-id", s["snapshot_id"])
        if s["parent_id"] is not None:
            r = r.option("start-snapshot-id", s["parent_id"])  # exclusive
        return r.load(self._tbl(name))

    def prune(self, keep) -> int:
        """Roll every table back to its newest snapshot satisfying
        ``keep({table, round})`` (crash-recovery rollback, like
        Catalog.prune). Tables whose snapshots are all dropped are
        deleted."""
        from types import SimpleNamespace

        dropped = 0
        tables = [
            r.tableName
            for r in self.spark.sql(f"SHOW TABLES IN {self.cat}.{self.ns}").collect()
        ]
        for name in tables:
            snaps = self._snaps(name)
            kept = [s for s in snaps if keep(SimpleNamespace(table=name, round=s["round"]))]
            dropped += len(snaps) - len(kept)
            if len(kept) == len(snaps):
                continue
            if not kept:
                self.spark.sql(f"DROP TABLE {self._tbl(name)}")
            else:
                self.spark.sql(
                    f"CALL {self.cat}.system.rollback_to_snapshot"
                    f"('{self.ns}.{name}', {kept[-1]['snapshot_id']})"
                )
        return dropped

    def compact(self, spark: SparkSession, name: str, target_partitions: int | None = None) -> str:
        """Iceberg's rewrite_data_files — the 1:1 mapping of
        Catalog.compact (small-file folding; the steady-state crawl loop
        calls this between rounds). target_partitions maps onto a target
        file size only loosely; Iceberg's own bin-packing decides."""
        self.spark.sql(
            f"CALL {self.cat}.system.rewrite_data_files('{self.ns}.{name}')"
        )
        snaps = self._snaps(name)
        return snaps[-1]["snapshot_id"] if snaps else ""

    def expire_snapshots(self, name: str, keep_last: int = 1) -> int:
        """Iceberg's expire_snapshots — drop all but the newest
        `keep_last` ancestor snapshots and delete unreferenced files.
        Returns the number of SNAPSHOTS dropped — the parquet Catalog's
        contract — not the procedure's deleted-data-files count, which is
        0 whenever the expired snapshots' files are still referenced
        (r3 review: the two would silently diverge)."""
        snaps = self._snaps(name)
        drop = snaps[:-keep_last] if keep_last > 0 else snaps
        if not drop:
            return 0
        self.spark.sql(
            f"CALL {self.cat}.system.expire_snapshots("
            f"table => '{self.ns}.{name}', "
            f"snapshot_ids => ARRAY({', '.join(s['snapshot_id'] for s in drop)}))"
        ).collect()
        return len(drop)

    def exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(self._tbl(name))

    def latest_round(self, name: str) -> int | None:
        if not self.exists(name):
            return None
        s = self._snaps(name)
        return s[-1]["round"] if s else None

    def snapshots(self, name: str | None = None) -> list[dict]:
        if name is not None:
            return self._snaps(name)
        out: list[dict] = []
        for r in self.spark.sql(f"SHOW TABLES IN {self.cat}.{self.ns}").collect():
            out.extend(self._snaps(r.tableName))
        return out


def snapshot_diff(
    spark: SparkSession,
    cat,
    name: str,
    round_a: int,
    round_b: int,
    key_cols: list[str],
    value_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Changelog between two snapshots of one table (the Iceberg
    changelog-read idiom over this catalog's time-travel): rows `added`,
    `removed`, or `changed` going from the round_a snapshot to round_b,
    keyed on key_cols and compared on value_cols (default: every shared
    non-key column).

    Works against any catalog object exposing `load(spark, name, round)`
    — both Catalog and IcebergCatalog.

    Scale shape: each side is reduced MAP-SIDE to key_cols plus one
    xxhash64 over the value columns before the full-outer join, so the
    join shuffles keys + 8 bytes per row, never the row bodies — diffing
    two 100 TB page snapshots moves only the key/hash projection. The
    full-outer join hash-shuffles both sides on the same key, and the
    classification is a null-pattern CASE on the two hash columns
    (whole-stage codegen, no UDF).
    """
    a = cat.load(spark, name, round_a)
    b = cat.load(spark, name, round_b)
    if value_cols is None:
        shared = [c for c in a.columns if c in set(b.columns)]
        value_cols = [c for c in shared if c not in set(key_cols)]
    # Spark's multi-column hash SKIPS null children (the accumulator
    # passes through unchanged), so xxhash64(NULL,'x') == xxhash64('x',
    # NULL) — a value MOVING between columns would read as unchanged.
    # Interleave each column's never-null isNull flag with its value so
    # every column contributes at least one accumulator update at a fixed
    # position; cast to string so a type change between snapshots can't
    # alias two different values to one hash input.
    h = (
        F.xxhash64(
            *[
                part
                for c in value_cols
                for part in (F.col(c).isNull(), F.col(c).cast("string"))
            ]
        )
        if value_cols
        else F.lit(0)
    )
    sa = a.select(*key_cols, h.alias("_ha"))
    sb = b.select(*key_cols, h.alias("_hb"))
    j = sa.join(sb, key_cols, "full_outer")
    out = j.select(
        *key_cols,
        F.when(F.col("_ha").isNull(), F.lit("added"))
        .when(F.col("_hb").isNull(), F.lit("removed"))
        .when(F.col("_ha") != F.col("_hb"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change"),
    )
    if not include_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out
