"""Minimal transaction-log table format (Delta/Iceberg-shaped).

The lakehouse primitive a 100 TB deployment needs under every
``ingest_*`` pattern in this repo: writers commit immutable parquet
batches plus a tiny JSON log entry; readers resolve a SNAPSHOT (latest
or any historical version — time travel) from the log and read exactly
the live data files. The reference (``backend/main.py``) delegates
storage to a database and has no table format; this extension gives the
engine's own parquet tables the same append / replace / read-consistent
semantics.

Design points, scaled down but real:

- **The log is the table.** A version is committed iff ``_log/<v>.json``
  exists; data files unreferenced by the log are invisible (a failed
  writer leaves garbage, never corruption).
- **Optimistic concurrency.** A commit materializes its entry at
  ``<v>.json`` via hard-link-from-temp (atomic put-if-absent on POSIX;
  object stores use the same conditional-put). A losing racer retries
  at ``v+1`` — reads never block.
- **Snapshots are manifest math.** live(v) = union of ``add`` minus
  ``remove`` over entries ≤ v, resolved driver-side over kilobytes of
  JSON; the DATA read is a normal distributed parquet scan of the live
  files, so partition pruning / predicate pushdown apply unchanged.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer committed this version first."""


class TxnLogTable:
    """A parquet table with a JSON transaction log and time travel."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        self._logdir = os.path.join(root, "_log")
        os.makedirs(self._logdir, exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- log internals -------------------------------------------------

    def versions(self) -> list[int]:
        return sorted(
            int(f[: -len(".json")])
            for f in os.listdir(self._logdir)
            if f.endswith(".json")
        )

    def _entry(self, v: int) -> dict:
        with open(os.path.join(self._logdir, f"{v}.json")) as fh:
            return json.load(fh)

    def _put_entry(self, v: int, entry: dict) -> None:
        """Atomic put-if-absent: hard-link a temp file into place; EEXIST
        means a concurrent writer won this version."""
        fd, tmp = tempfile.mkstemp(dir=self._logdir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as fh:
                json.dump(entry, fh)
            try:
                os.link(tmp, os.path.join(self._logdir, f"{v}.json"))
            except FileExistsError as exc:
                raise CommitConflict(f"version {v} already committed") from exc
        finally:
            os.unlink(tmp)

    # -- public API ----------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        mode: str = "append",
        remove: list[str] | None = None,
        max_retries: int = 5,
        meta: dict | None = None,
        partition_by: list[str] | None = None,
    ) -> tuple[int, str]:
        """Write ``df`` as a new immutable batch and commit a log entry.

        ``mode='append'`` adds the batch; ``mode='overwrite'`` also
        removes every batch live at commit time — data AND MoR
        tombstone (``add_deletes``) batches, since an overwrite
        supersedes the rows the tombstones pointed at; retiring them
        here is what lets a later ``vacuum`` physically reclaim the
        tombstoned key values (the GDPR-erasure requirement).
        ``remove`` names specific batches to retire (replace/compact). ``meta`` attaches
        writer metadata to the log entry (e.g. a streaming micro-batch
        id — the idempotence token an exactly-once sink scans with
        ``has_meta``). Returns ``(version, batch_name)``. The parquet
        write happens ONCE; only the cheap log put retries on a
        version race.
        """
        versions = self.versions()
        v = (versions[-1] + 1) if versions else 0
        batch = f"batch-{v:05d}-{os.urandom(4).hex()}"
        writer = df.write.mode("error")
        if partition_by:
            # PARTITION EVOLUTION: each batch carries its own physical
            # layout spec (Iceberg spec-id semantics — the spec lives in
            # the log entry, not table-global state), so later commits
            # may partition differently without rewriting old batches.
            writer = writer.partitionBy(*partition_by)
        writer.parquet(os.path.join(self.root, "data", batch))
        for _ in range(max_retries):
            drop = sorted(
                self.live_batches()
                + [
                    b
                    for (b, _) in self._live_with_versions(
                        None, "add_deletes"
                    )
                ]
                if mode == "overwrite"
                else (remove or [])
            )
            entry = {"version": v, "add": [batch], "remove": drop}
            if meta:
                entry["meta"] = meta
            if partition_by:
                entry["spec"] = list(partition_by)
            try:
                self._put_entry(v, entry)
                return v, batch
            except CommitConflict:
                v = self.versions()[-1] + 1
        raise CommitConflict(f"gave up after {max_retries} retries")

    def has_meta(self, key: str, value) -> bool:
        """True iff some committed entry carries ``meta[key] == value``
        — the put-if-absent dedup scan an exactly-once streaming sink
        runs before committing a (possibly replayed) micro-batch. The
        scan is over the tiny driver-side log."""
        return any(
            self._entry(v).get("meta", {}).get(key) == value
            for v in self.versions()
        )

    def live_batches(self, version: int | None = None) -> list[str]:
        versions = self.versions()
        if not versions:
            return []
        if version is None:
            version = versions[-1]
        if version not in versions:
            raise ValueError(f"unknown version {version}")
        live: list[str] = []
        for v in versions:
            if v > version:
                break
            e = self._entry(v)
            live = [b for b in live if b not in set(e.get("remove", []))]
            live.extend(e.get("add", []))
        return live

    def commit_deletes(
        self, keys_df: DataFrame, max_retries: int = 5
    ) -> tuple[int, str]:
        """Merge-on-read row-level delete: write the key set as a
        DELETE batch and log it under ``add_deletes``. No data file is
        rewritten — readers apply the tombstones at scan time
        (``snapshot_mor``), and a later compaction folds them in. The
        Iceberg equality-delete-file pattern on this format."""
        versions = self.versions()
        v = (versions[-1] + 1) if versions else 0
        batch = f"batch-{v:05d}-del-{os.urandom(4).hex()}"
        keys_df.write.mode("error").parquet(
            os.path.join(self.root, "data", batch)
        )
        for _ in range(max_retries):
            try:
                self._put_entry(
                    v, {"version": v, "add_deletes": [batch], "remove": []}
                )
                return v, batch
            except CommitConflict:
                v = self.versions()[-1] + 1
        raise CommitConflict(f"gave up after {max_retries} retries")

    def commit_merge(
        self,
        data_df: DataFrame,
        delete_keys_df: DataFrame,
        meta: dict | None = None,
        max_retries: int = 5,
    ) -> tuple[int, str]:
        """ATOMIC MoR merge commit: ONE log entry carrying both the
        refolded-rows append (``add``) and the equality tombstone
        (``add_deletes``), plus the writer ``meta`` idempotency token.

        Two separate commits (``commit_deletes`` then ``commit``) are
        not crash-atomic: a writer dying between them leaves an
        orphaned tombstone that already hides the touched keys' prior
        rows, so a replay that rebuilds its merge input from
        ``snapshot_mor`` sees those keys as absent and permanently
        loses their history. One ``_put_entry`` makes tombstone+append
        all-or-nothing — ``_live_with_versions`` already resolves both
        the ``add`` and ``add_deletes`` lists per entry.

        Sequence semantics: both sides carry the SAME version v, and
        :meth:`snapshot_mor` applies a tombstone only to data batches
        with strictly smaller version (``_del_v > _data_v``), so the
        entry's own append is never hidden by its own tombstone while
        every prior batch's touched rows are."""
        versions = self.versions()
        v = (versions[-1] + 1) if versions else 0
        batch = f"batch-{v:05d}-{os.urandom(4).hex()}"
        dbatch = f"batch-{v:05d}-del-{os.urandom(4).hex()}"
        data_df.write.mode("error").parquet(
            os.path.join(self.root, "data", batch)
        )
        delete_keys_df.write.mode("error").parquet(
            os.path.join(self.root, "data", dbatch)
        )
        for _ in range(max_retries):
            entry = {
                "version": v,
                "add": [batch],
                "add_deletes": [dbatch],
                "remove": [],
            }
            if meta:
                entry["meta"] = meta
            try:
                self._put_entry(v, entry)
                return v, batch
            except CommitConflict:
                v = self.versions()[-1] + 1
        raise CommitConflict(f"gave up after {max_retries} retries")

    def _live_with_versions(
        self, version: int | None, key: str
    ) -> list[tuple[str, int]]:
        """Live batches under log-entry list ``key`` ('add' or
        'add_deletes'), each with the version that added it."""
        versions = self.versions()
        if not versions:
            return []
        if version is None:
            version = versions[-1]
        if version not in versions:
            raise ValueError(f"unknown version {version}")
        live: list[tuple[str, int]] = []
        for v in versions:
            if v > version:
                break
            e = self._entry(v)
            gone = set(e.get("remove", []))
            live = [(b, bv) for (b, bv) in live if b not in gone]
            live.extend((b, v) for b in e.get(key, []))
        return live

    def snapshot_mor(
        self, key_col: str, version: int | None = None
    ) -> DataFrame:
        """Merge-on-read snapshot: live data batches with live delete
        batches applied SEQUENCE-AWARE — a delete committed at version
        d tombstones ``key_col`` matches only in data batches added at
        versions < d, so a key re-inserted AFTER its deletion survives
        (Iceberg sequence-number semantics). The anti-join is one
        distributed hash join on the key with the version comparison as
        residual; the tombstone side is usually broadcast-sized."""
        from pyspark.sql import functions as F

        data = self._live_with_versions(version, "add")
        if not data:
            raise ValueError("empty table has no snapshot")
        dels = self._live_with_versions(version, "add_deletes")
        if not dels:
            # tombstone-free table: ONE multi-path parquet scan (no
            # per-batch version tagging, no anti-join) — snapshot_mor
            # is then exactly snapshot, so callers can always use it
            return self.snapshot(version)

        def _specced(batches) -> bool:
            """True if any batch was committed with a partition spec —
            those dirs carry partition trees that a multi-root scan
            can't discover together (snapshot_evolved's domain)."""
            vs = {v for (_, v) in batches}
            return any(self._entry(v).get("spec") for v in vs)

        def read_tagged(batches, tag):
            if not _specced(batches):
                # ONE multi-path scan for ALL live batches; each row's
                # commit version recovered from input_file_name() via a
                # broadcast literal map — round-13: the old per-batch
                # scan-union made every MoR snapshot O(live batches)
                # scan nodes, so a B-batch merge feed paid O(B²) scan
                # instantiations before compaction (measured 25-45%
                # of MoR merge wall in tools/soak_scd2.py)
                paths = [
                    os.path.join(self.root, "data", b) for (b, _) in batches
                ]
                vmap = F.create_map(
                    *[
                        x
                        for (b, v) in batches
                        for x in (F.lit(b), F.lit(v))
                    ]
                )
                return self.spark.read.parquet(*paths).withColumn(
                    tag,
                    vmap[
                        F.regexp_extract(
                            F.input_file_name(), r"/data/([^/]+)/", 1
                        )
                    ],
                )
            parts = [
                self.spark.read.parquet(
                    os.path.join(self.root, "data", b)
                ).withColumn(tag, F.lit(v))
                for (b, v) in batches
            ]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out

        df = read_tagged(data, "_data_v")
        if not dels:
            return df.drop("_data_v")
        dk = read_tagged(dels, "_del_v").select(
            F.col(key_col).alias("_del_key"), "_del_v"
        )
        cond = (F.col(key_col) == F.col("_del_key")) & (
            F.col("_del_v") > F.col("_data_v")
        )
        return df.join(F.broadcast(dk), cond, "left_anti").drop("_data_v")

    def changefeed(
        self, v_from: int, v_to: int, key_cols: list[str]
    ) -> DataFrame:
        """Row-level change feed between two committed versions (Delta
        CDF / Iceberg incremental-read semantics, derived purely from
        the log — no extra change files written).

        Reads ONLY the batches whose liveness changed between the two
        snapshots: rows in added-but-not-removed batches whose key is
        absent from the removed side are ``insert``s, removed-side-only
        keys are ``delete``s, and keys present on both sides emit an
        ``update_preimage`` / ``update_postimage`` pair. Batches live
        at BOTH versions are never scanned — the feed's cost is the
        churn between versions, not the table size, which is the whole
        point of incremental consumption at 100 TB.

        Keys are assumed unique per side (the upsert key of the
        table); the four classification joins are hash semi/anti joins
        on the delta-sized frames only.

        MoR tombstones (``add_deletes`` commits) are part of the diff:
        newly-visible rows are the added batches minus v_to tombstones
        (sequence-aware, as in :meth:`snapshot_mor`); newly-hidden rows
        are the removed batches (minus v_from tombstones) plus rows in
        batches live at BOTH endpoints that a tombstone committed
        inside the window now hides — and symmetrically, rows a
        tombstone's retirement resurrects. The both-live-batch scans
        run only when delete-batch liveness actually churned, filtered
        by a broadcast semi-join on the tombstone keys, so the feed's
        cost stays proportional to churn. Tombstone handling needs a
        single-column upsert key (the delete batches' key column).
        """
        from pyspark.sql import functions as F

        data_after = dict(self._live_with_versions(v_to, "add"))
        data_before = dict(self._live_with_versions(v_from, "add"))
        dels_after = self._live_with_versions(v_to, "add_deletes")
        dels_before = self._live_with_versions(v_from, "add_deletes")
        new_dels = [d for d in dels_after if d not in dels_before]
        gone_dels = [d for d in dels_before if d not in dels_after]

        def read_tagged(batches: list[tuple[str, int]]) -> DataFrame | None:
            if not batches:
                return None
            parts = [
                self.spark.read.parquet(
                    os.path.join(self.root, "data", b)
                ).withColumn("_v", F.lit(v))
                for (b, v) in batches
            ]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out

        if (dels_after or dels_before) and len(key_cols) != 1:
            raise ValueError(
                "changefeed over MoR tombstones needs a single key column"
            )
        kc = key_cols[0]

        def tomb_cond() -> "F.Column":
            return (F.col(kc) == F.col("_del_key")) & (
                F.col("_del_v") > F.col("_v")
            )

        def del_keys(dels: list[tuple[str, int]]) -> DataFrame:
            return read_tagged(dels).select(
                F.col(kc).alias("_del_key"), F.col("_v").alias("_del_v")
            )

        def apply_tombs(
            df: DataFrame | None, dels: list[tuple[str, int]], how: str
        ) -> DataFrame | None:
            """Sequence-aware tombstone join: 'left_anti' keeps visible
            rows, 'left_semi' keeps the hidden ones."""
            if df is None or not dels:
                return df if how == "left_anti" else None
            return df.join(F.broadcast(del_keys(dels)), tomb_cond(), how)

        added = [(b, v) for b, v in data_after.items() if b not in data_before]
        removed = [
            (b, v) for b, v in data_before.items() if b not in data_after
        ]
        both = [(b, v) for b, v in data_before.items() if b in data_after]

        if not (added or removed or new_dels or gone_dels):
            raise ValueError("no batch churn between versions")

        # Newly-visible rows: new batches minus v_to tombstones, plus
        # rows a retired tombstone resurrects in both-live batches.
        vis_add = apply_tombs(read_tagged(added), dels_after, "left_anti")
        resurrect = None
        if gone_dels and both:
            hidden_before = apply_tombs(
                read_tagged(both), dels_before, "left_semi"
            )
            resurrect = apply_tombs(hidden_before, dels_after, "left_anti")
        # Newly-hidden rows: dropped batches minus v_from tombstones,
        # plus both-live rows a new tombstone hides.
        vis_rem = apply_tombs(read_tagged(removed), dels_before, "left_anti")
        tombstoned = None
        if new_dels and both:
            visible_before = apply_tombs(
                read_tagged(both), dels_before, "left_anti"
            )
            tombstoned = apply_tombs(visible_before, new_dels, "left_semi")

        def merge(a: DataFrame | None, b: DataFrame | None) -> DataFrame | None:
            if a is None:
                return b
            if b is None:
                return a
            return a.unionByName(b)

        add_df = merge(vis_add, resurrect)
        rem_df = merge(vis_rem, tombstoned)
        if add_df is not None:
            add_df = add_df.drop("_v")
        if rem_df is not None:
            rem_df = rem_df.drop("_v")

        def tag(df: DataFrame, t: str) -> DataFrame:
            return df.withColumn("change_type", F.lit(t))

        if add_df is None and rem_df is None:
            raise ValueError("no batch churn between versions")
        if rem_df is None:
            return tag(add_df, "insert")
        if add_df is None:
            return tag(rem_df, "delete")
        add_keys = add_df.select(*key_cols)
        rem_keys = rem_df.select(*key_cols)
        return (
            tag(add_df.join(rem_keys, key_cols, "left_anti"), "insert")
            .unionByName(
                tag(rem_df.join(add_keys, key_cols, "left_anti"), "delete")
            )
            .unionByName(
                tag(
                    rem_df.join(add_keys, key_cols, "left_semi"),
                    "update_preimage",
                )
            )
            .unionByName(
                tag(
                    add_df.join(rem_keys, key_cols, "left_semi"),
                    "update_postimage",
                )
            )
        )

    def set_ref(self, name: str, version: int) -> None:
        """Create/advance a named ref (Iceberg tag/branch head): a tiny
        JSON pointer to a committed version, stored beside the log.
        Refs pin releases ('the corpus snapshot model v3 trained on')
        while main advances; vacuum retention and ref lifetimes are
        managed together in production."""
        if version not in self.versions():
            raise ValueError(f"unknown version {version}")
        refdir = os.path.join(self._logdir, "refs")
        os.makedirs(refdir, exist_ok=True)
        tmp = os.path.join(refdir, f".{name}.tmp")
        with open(tmp, "w") as fh:
            json.dump({"version": version}, fh)
        os.replace(tmp, os.path.join(refdir, f"{name}.json"))

    def resolve_ref(self, name: str) -> int:
        refpath = os.path.join(self._logdir, "refs", f"{name}.json")
        if not os.path.exists(refpath):
            raise ValueError(f"unknown ref {name!r}")
        with open(refpath) as fh:
            return int(json.load(fh)["version"])

    def snapshot_ref(self, name: str, **kw) -> DataFrame:
        """Time travel by NAME: the snapshot the ref points at."""
        return self.snapshot(self.resolve_ref(name), **kw)

    def zone_map_prune(
        self, lo: str, hi: str, version: int | None = None
    ) -> tuple[list[str], int]:
        """File skipping from commit-meta zone maps (Delta/Iceberg
        data-skipping stats): returns the live batches whose
        ``meta["zmin"]``/``meta["zmax"]`` interval overlaps [lo, hi]
        (string comparison — ISO dates order lexicographically), plus
        the TOTAL live batch count, so the caller can report skipped
        files. Batches committed without a zone map are conservatively
        kept (unknown range could overlap anything).

        The decision is manifest math over the driver-side JSON log —
        no file is opened to decide; at 100 TB this is what turns a
        full-table scan into a read of the few overlapping files."""
        live = set(self.live_batches(version))
        keep: list[str] = []
        total = 0
        for v in self.versions():
            e = self._entry(v)
            for b in e.get("add", []):
                if b not in live:
                    continue
                total += 1
                m = e.get("meta", {})
                zmin, zmax = m.get("zmin"), m.get("zmax")
                if zmin is None or zmax is None or (zmin <= hi and zmax >= lo):
                    keep.append(b)
        return sorted(keep), total

    def vacuum(self, retain_versions: int = 1) -> list[str]:
        """Delete data batches unreachable from the newest
        ``retain_versions`` snapshots (Delta/Iceberg VACUUM / expire-
        snapshots). The log stays intact — history remains auditable —
        but time travel older than the retention horizon afterwards
        fails on missing files, exactly the documented trade. Returns
        the deleted batch names (sorted).

        Scale shape: reachability is manifest math over the tiny JSON
        log (driver-side); the deletes are per-batch and embarrassingly
        parallel on an object store."""
        import shutil

        versions = self.versions()
        keep: set[str] = set()
        for v in versions[-retain_versions:] if retain_versions else []:
            keep.update(self.live_batches(v))
            keep.update(
                b for (b, _) in self._live_with_versions(v, "add_deletes")
            )
        datadir = os.path.join(self.root, "data")
        removed = sorted(
            b
            for b in os.listdir(datadir)
            if b.startswith("batch-") and b not in keep
        )
        for b in removed:
            shutil.rmtree(os.path.join(datadir, b))
        return removed

    def snapshot(
        self, version: int | None = None, merge_schema: bool = False
    ) -> DataFrame:
        """The table AS OF ``version`` (default: latest) — time travel.

        Resolves the live file set from the log (driver-side, tiny) and
        reads it as one distributed parquet scan. ``merge_schema=True``
        unions evolved batch schemas (added columns backfill NULL),
        the add-column path of schema evolution under this format."""
        live = self.live_batches(version)
        if not live:
            raise ValueError("empty table has no snapshot")
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(
            *(os.path.join(self.root, "data", b) for b in live)
        )

    def snapshot_evolved(
        self, version: int | None = None, key_col: str | None = None
    ) -> DataFrame:
        """The table AS OF ``version`` under PARTITION EVOLUTION: live
        batches are grouped by the partition spec recorded in their
        commit entry (Iceberg spec-id semantics), each spec group is
        read as its own parquet scan (mixed directory layouts cannot
        share one partition-discovery pass), and the groups union by
        name with NULL backfill for columns another spec materializes
        differently.

        Filters applied by the CALLER push through the union into every
        per-spec scan, so each group gets its own partition pruning —
        a date predicate prunes month directories in month-partitioned
        batches and day directories in day-partitioned ones.  The log
        walk is driver-side kilobytes; every scan stays distributed.

        MoR tables: live ``add_deletes`` tombstones are applied
        sequence-aware exactly as :meth:`snapshot_mor` does, which
        requires ``key_col``. Reading a MOR-delete table without
        ``key_col`` raises instead of silently resurrecting deleted
        rows."""
        from pyspark.sql import functions as F

        versions = self.versions()
        if not versions:
            raise ValueError("empty table has no snapshot")
        if version is None:
            version = versions[-1]
        elif version not in versions:
            raise ValueError(f"unknown version {version}")
        live: list[str] = []
        spec_of: dict[str, tuple] = {}
        added_at: dict[str, int] = {}
        for v in versions:
            if v > version:
                break
            e = self._entry(v)
            removed = set(e.get("remove", []))
            live = [b for b in live if b not in removed]
            for b in e.get("add", []):
                live.append(b)
                spec_of[b] = tuple(e.get("spec", ()))
                added_at[b] = v
        if not live:
            raise ValueError("empty table has no snapshot")
        dels = self._live_with_versions(version, "add_deletes")
        if dels and key_col is None:
            raise ValueError(
                "table has live MoR delete batches; pass key_col= so "
                "snapshot_evolved can apply them (or use snapshot_mor)"
            )
        groups: dict[tuple, list[str]] = {}
        for b in live:
            groups.setdefault(spec_of[b], []).append(b)
        out: DataFrame | None = None
        for spec in sorted(groups):
            # one scan per batch: multi-root partition discovery over
            # sibling batch dirs raises CONFLICTING_DIRECTORY_STRUCTURES
            # (each batch root is its own partition tree), and the MoR
            # residual needs each row tagged with its batch's sequence
            # number anyway. Each scan still prunes on its own spec.
            part: DataFrame | None = None
            for b in groups[spec]:
                p = self.spark.read.parquet(
                    os.path.join(self.root, "data", b)
                )
                if dels:
                    p = p.withColumn("_data_v", F.lit(added_at[b]))
                part = p if part is None else part.unionByName(p)
            out = (
                part
                if out is None
                else out.unionByName(part, allowMissingColumns=True)
            )
        if not dels:
            return out
        dk_parts = [
            self.spark.read.parquet(os.path.join(self.root, "data", b))
            .select(F.col(key_col).alias("_del_key"))
            .withColumn("_del_v", F.lit(v))
            for (b, v) in dels
        ]
        dk = dk_parts[0]
        for p in dk_parts[1:]:
            dk = dk.unionByName(p)
        cond = (F.col(key_col) == F.col("_del_key")) & (
            F.col("_del_v") > F.col("_data_v")
        )
        return out.join(F.broadcast(dk), cond, "left_anti").drop("_data_v")
