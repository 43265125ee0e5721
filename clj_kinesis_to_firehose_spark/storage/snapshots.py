"""Minimal snapshot/upsert table layer — the transactional-table-format
analog (Iceberg/Delta-style, reimplemented from the public papers'
architecture, not their code) that raw parquet directories lack.

A table is a directory:

    <path>/data/commit-<version>-<attempt>/part-*.parquet   immutable data
    <path>/_manifest/v<version>.json              snapshot = active file list
    <path>/_manifest/_latest                      O(1) latest-version pointer

(the per-attempt suffix keeps two optimistic writers racing to the
same version from sharing a directory — the loser's overwrite must
never touch the winner's published files)

Each manifest names the complete set of active data files for that
version plus per-file stats (row count, min/max of the merge key) and
the operation that produced it. Readers pick a manifest version (latest
by default) and read exactly its files — writers never mutate a data
file, so a reader holding version N is isolated from every later
commit (snapshot isolation) and any retained version stays readable
forever (time travel).

Commits are optimistic: a writer prepares data files, then publishes
``v<N+1>.json`` via write-temp + ``os.rename`` — atomic on POSIX, and
the rename FAILS if a concurrent writer already published N+1 (flagged
as :class:`CommitConflictError`; the caller re-reads and retries). This
is the same single-atomic-swap protocol Iceberg uses against an object
store's rename/conditional-put.

Scale design (100 TB):

* **Stats-pruned copy-on-write.** ``merge_upsert`` joins the manifest's
  per-file key ranges (a files-count-sized DataFrame, broadcast)
  against the update batch to find the touched files; only those are
  rewritten, every other file entry is carried into the new manifest
  untouched. A 1000-file table taking a 0.1%-key-range update rewrites
  ~1 file, not the table. Clustering the layout by key
  (``repartitionByRange`` at create/compact time) is what makes the
  ranges disjoint and the pruning sharp.
* **No listing on read.** The manifest IS the file listing — readers
  never glob the data directory, so reads don't degrade as old
  versions accumulate (the classic S3-listing bottleneck).
* **Bounded driver state.** The only collects are the manifest itself
  (one row per file) and the touched-file name list. Row data never
  visits the driver.
* **Compaction as a commit.** ``compact`` rewrites the current file
  set into target-count range-clustered files and publishes it as a
  normal version — old versions keep their old files, so compaction
  never blocks readers.
* **Merge-on-read deletes.** ``delete_where_mor`` commits a small
  key-only DELETE FILE scoped (``applies_to``) to the data files that
  may hold the matched keys — write cost O(matched keys) instead of
  copy-on-write's rewrite of every touched file (the Iceberg-v2
  equality-delete / deletion-vector pattern [PK]). Readers anti-join
  vectors against exactly their scoped files; merges/deletes/compacts
  that rewrite a scoped file MATERIALIZE its vectors (the rewrite
  output already excludes the rows), and ``materialize_deletes``
  rewrites only vectored files off the commit path. High-churn point
  deletes stop paying rewrite amplification per commit.

* **Manifest scaling (manifest-list splitting).** A commit does not
  re-serialize the whole file list: entries live in immutable
  ``seg-*.json`` SEGMENT files of ~``SEGMENT_TARGET`` entries, and the
  manifest holds a manifest LIST — per-segment summaries (path, count,
  rows, key range). A commit reuses every intact parent segment by
  reference and serializes only survivors of broken segments plus new
  files, so commit metadata cost is O(changed files): at 10^6 files a
  one-file upsert writes one segment and a ~4000-row list, not 10^6
  entries (the bottleneck Iceberg splits manifests for and Delta
  checkpoints around [PK]). Accumulated thin segments are folded back
  into right-sized ones by the next commit (``SEGMENT_FOLD_AT``), and
  vacuum sweeps segments referenced by no surviving manifest. Inline
  ``files`` manifests (branch seeds, staged snapshots, pre-split
  tables) stay readable unchanged.

Local filesystem paths only in this sandbox; the atomic-publish seam
(:meth:`SnapshotTable._publish`) is the single place an object-store
conditional-put would slot in.

Interop boundary (documented tradeoff): the manifest format is this
layer's own JSON, not Iceberg's Avro manifests or Delta's JSON action
log — other engines cannot read these tables directly. The DATA files
are plain parquet, so a one-shot export is ``read()`` → write to the
target format; adopting a standard catalog format wholesale would
trade the sandbox's zero-dependency testability for interop. The
architecture (manifest-as-listing, stats pruning, atomic single-swap
publish, ``_latest`` pointer) deliberately mirrors the public
Iceberg/Delta designs so a production swap is a format change, not a
redesign.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CommitConflictError(RuntimeError):
    """Another writer published this version first — re-read and retry."""


class ConstraintViolationError(ValueError):
    """A write batch violated the table's declared constraints — the
    commit was refused and the table state is unchanged."""


@dataclass(frozen=True)
class FileEntry:
    path: str
    rows: int
    min_key: int | None
    max_key: int | None
    #: optional per-column bloom bitmaps (sorted set-bit indexes) for
    #: point-lookup file skipping on non-clustered columns
    blooms: dict[str, list[int]] | None = None
    #: optional per-column [min, max] for every numeric column — the
    #: multi-column zone map behind :meth:`SnapshotTable.read_pruned_on`
    stats: dict[str, list] | None = None
    #: partition-spec lineage (Iceberg partition evolution [PK]): the
    #: spec this file was written under, and its exact partition
    #: values ({col: string value} parsed from the write layout).
    #: Files written before any spec carry neither and are read
    #: conservatively by :meth:`SnapshotTable.read_partition_pruned`.
    spec_id: int | None = None
    partition: dict | None = None
    #: bookkeeping, never serialized: absolute path of the manifest
    #: SEGMENT file this entry was loaded from (None for new files).
    #: _commit reuses intact segments by reference instead of
    #: re-serializing their entries — see "Manifest scaling" above.
    segment: str | None = None

    def to_json(self) -> dict:
        d = {
            "path": self.path,
            "rows": self.rows,
            "min_key": self.min_key,
            "max_key": self.max_key,
        }
        if self.blooms is not None:
            d["blooms"] = self.blooms
        if self.stats is not None:
            d["stats"] = self.stats
        if self.spec_id is not None:
            d["spec_id"] = self.spec_id
        if self.partition is not None:
            d["partition"] = self.partition
        return d

    @classmethod
    def from_json(cls, d: dict) -> "FileEntry":
        return cls(
            d["path"],
            d["rows"],
            d["min_key"],
            d["max_key"],
            d.get("blooms"),
            d.get("stats"),
            d.get("spec_id"),
            d.get("partition"),
            d.get("_segment"),
        )


class SnapshotTable:
    """Handle on a snapshot table rooted at ``path`` keyed by the
    integer column ``key`` (the upsert/merge identity)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str,
        bloom_cols: tuple[str, ...] = (),
        check: str | None = None,
    ):
        self.spark = spark
        self.path = path
        self.key = key
        #: columns to build per-file bloom filters for at write time —
        #: point-lookup file skipping on columns the range clustering
        #: can't help with (zone maps are useless for a value scattered
        #: across every key range)
        self.bloom_cols = tuple(bloom_cols)
        #: optional CHECK constraint (a SQL boolean expression over the
        #: row): every create/merge batch is validated BEFORE its
        #: commit — a violating batch raises ConstraintViolationError
        #: and the table state is untouched (the write never publishes).
        #: The key is additionally always NOT NULL.
        self.check = check

    # ---------------------------------------------------------- layout

    @property
    def _manifest_dir(self) -> str:
        return os.path.join(self.path, "_manifest")

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._manifest_dir, f"v{version:06d}.json")

    @property
    def _pointer_path(self) -> str:
        return os.path.join(self._manifest_dir, "_latest")

    def latest_version(self) -> int:
        """Latest committed version in O(1), not O(#commits).

        Reads the ``_latest`` pointer (Delta's ``_last_checkpoint``
        analog [PK]) and probes FORWARD past any commits the pointer
        has not caught up to — the pointer is a hint updated after
        publish, so it may lag by a crashed writer or a concurrent
        commit, never lead. A stale-high or missing pointer falls back
        to the full directory listing (pre-pointer tables stay
        readable). At 10^5 commits this turns the hottest metadata
        call from a directory listing into one read + one stat."""
        v = 0
        try:
            with open(self._pointer_path) as fh:
                v = int(json.load(fh)["version"])
        except (OSError, ValueError, KeyError, TypeError):
            v = 0  # TypeError: non-dict JSON in a corrupt pointer file
        if v > 0 and os.path.exists(self._manifest_path(v)):
            while os.path.exists(self._manifest_path(v + 1)):
                v += 1
            return v
        try:
            names = os.listdir(self._manifest_dir)
        except FileNotFoundError:
            return 0
        versions = [
            int(n[1:-5]) for n in names if n.startswith("v") and n.endswith(".json")
        ]
        return max(versions, default=0)

    def _update_pointer(self, version: int) -> None:
        """Advance the ``_latest`` hint after a successful publish.
        Monotonic (a slow writer finishing an older commit must not
        move it backwards) and atomic (write-temp + ``os.replace``);
        losing this update entirely is safe — the next reader probes
        forward or falls back to the listing."""
        import uuid

        try:
            with open(self._pointer_path) as fh:
                cur = int(json.load(fh)["version"])
            # monotonic only while the current target actually exists —
            # a stale-HIGH pointer (no such manifest) is garbage and
            # must be overwritten, not preserved
            if cur >= version and os.path.exists(self._manifest_path(cur)):
                return
        except (OSError, ValueError, KeyError, TypeError):
            pass
        tmp = f"{self._pointer_path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": version}, fh)
        os.replace(tmp, self._pointer_path)

    def _read_manifest(self, version: int | None = None) -> dict:
        v = version if version is not None else self.latest_version()
        if v < 1:
            raise FileNotFoundError(f"no committed version in {self.path}")
        with open(self._manifest_path(v)) as fh:
            raw = json.load(fh)
        return self._resolve_manifest(raw, self._manifest_dir)

    @staticmethod
    def _resolve_manifest(raw: dict, manifest_dir: str) -> dict:
        """Materialize a manifest's ``files`` list. An inline manifest
        (legacy, branch seeds, staged snapshots) already carries it; a
        SEGMENTED manifest carries a manifest LIST — per-segment
        summaries naming immutable ``seg-*.json`` files that hold the
        entries — which is resolved here. Entries are annotated with
        their source segment (``_segment``) so a later commit can
        carry intact segments forward by reference."""
        if "files" in raw:
            return raw
        files: list[dict] = []
        for seg in raw["segments"]:
            seg_path = os.path.join(manifest_dir, seg["path"])
            with open(seg_path) as fh:
                entries = json.load(fh)
            for e in entries:
                e["_segment"] = seg_path
            files.extend(entries)
        return {**raw, "files": files}

    def history(self) -> list[dict]:
        """One dict per committed version: version, op, n_files, n_rows."""
        out = []
        for v in range(1, self.latest_version() + 1):
            try:
                with open(self._manifest_path(v)) as fh:
                    m = json.load(fh)
            except FileNotFoundError:  # expired by vacuum
                continue
            if "n_files" not in m:  # inline manifest: totals from entries
                m["n_files"] = len(m["files"])
                m["n_rows"] = sum(f["rows"] for f in m["files"])
            out.append(
                {
                    "version": v,
                    "op": m["op"],
                    "n_files": m["n_files"],
                    "n_rows": m["n_rows"],
                }
            )
        return out

    # ---------------------------------------------------------- commit

    def _publish(self, version: int, manifest: dict) -> None:
        """Atomic publish of ``v<version>.json``; loses the race to any
        concurrent writer of the same version. Single seam for an
        object-store conditional-put swap in production."""
        import uuid

        os.makedirs(self._manifest_dir, exist_ok=True)
        final = self._manifest_path(version)
        if os.path.exists(final):
            raise CommitConflictError(
                f"version {version} already committed in {self.path}"
            )
        # tmp name is unique PER WRITER: a shared tmp path would let two
        # concurrent committers overwrite each other's manifest bytes
        # and publish the loser's content under the winner's commit
        tmp = f"{final}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        try:
            # exclusive link+unlink = fail-if-exists rename on POSIX
            os.link(tmp, final)
        except FileExistsError as e:
            raise CommitConflictError(
                f"version {version} already committed in {self.path}"
            ) from e
        finally:
            os.unlink(tmp)
        self._update_pointer(version)

    def _write_data_files(self, df: DataFrame, version: int, n_files: int) -> list[FileEntry]:
        """Write ``df`` as ``n_files`` range-clustered parquet files
        under the version's data directory and return their entries
        with footer-derived stats (metadata reads only — no data
        re-scan for stats).

        The directory carries a per-ATTEMPT unique suffix: two
        optimistic writers racing to the same version must not share a
        path, or the loser's ``mode("overwrite")`` would delete the
        winner's already-published files (manifests reference explicit
        paths, so uniqueness costs nothing; the loser's orphan dir is
        swept by vacuum)."""
        import uuid

        out_dir = os.path.join(
            self.path, "data", f"commit-{version:06d}-{uuid.uuid4().hex[:8]}"
        )
        return self._write_files_to(df, out_dir, n_files)

    def _write_files_to(
        self, df: DataFrame, out_dir: str, n_files: int
    ) -> list[FileEntry]:
        writer = (
            df.repartitionByRange(n_files, F.col(self.key))
            if n_files > 1
            else df.coalesce(1)
        )
        writer.write.mode("overwrite").parquet(out_dir)
        return [
            self._file_entry(os.path.join(out_dir, n))
            for n in sorted(os.listdir(out_dir))
            if n.endswith(".parquet")
        ]

    #: per-file bloom sizing for `bloom_cols`: m bits / k hashes tuned
    #: for ~2% false positives at up to ~2000 distinct values per file
    BLOOM_M = 16384
    BLOOM_K = 4

    def _file_entry(self, fpath: str) -> FileEntry:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(fpath).metadata
        # footer-derived per-column min/max for EVERY numeric column —
        # JSON-native, so the manifest becomes a multi-column zone map:
        # read_pruned_on() can file-skip on any of them, not just the
        # clustering key (what makes cluster_zorder's second dimension
        # actually prunable)
        col_stats: dict[str, list] = {}
        for i in range(md.num_columns):
            name = md.schema.column(i).name
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(i).statistics
                if st is not None and st.has_min_max:
                    if isinstance(st.min, (int, float)) and isinstance(
                        st.max, (int, float)
                    ):
                        mins.append(st.min)
                        maxs.append(st.max)
            if mins:
                col_stats[name] = [min(mins), max(maxs)]
        key_range = col_stats.get(self.key)
        blooms = self._file_blooms(fpath) if self.bloom_cols else None
        return FileEntry(
            path=fpath,
            rows=md.num_rows,
            min_key=key_range[0] if key_range else None,
            max_key=key_range[1] if key_range else None,
            blooms=blooms,
            stats=col_stats or None,
        )

    def _bloom_positions(self, value) -> list[int]:
        """BLOOM_K bit positions for a value — xxhash-free, engine-side
        deterministic: double md5-derived hashing (h1 + i·h2 mod m),
        the standard Kirsch-Mitzenmacher construction."""
        import hashlib

        d = hashlib.md5(str(value).encode()).digest()
        h1 = int.from_bytes(d[:8], "big")
        h2 = int.from_bytes(d[8:], "big") | 1
        return [(h1 + i * h2) % self.BLOOM_M for i in range(self.BLOOM_K)]

    def _file_blooms(self, fpath: str) -> dict[str, list[int]]:
        """Per-column bloom bitmaps (stored as sorted set-bit indexes —
        compact in JSON for sparse fills) for each `bloom_cols` column,
        built from one column-pruned read of the file's distinct
        values. At 100 TB this fold runs where the write ran; the
        manifest carries only m-bit bitmaps per (file, column)."""
        import pyarrow.parquet as pq

        # key-only MoR delete files (and schema-evolved old files) may
        # lack a bloom column — build blooms for the columns present
        present = set(pq.read_schema(fpath).names)
        cols = [c for c in self.bloom_cols if c in present]
        if not cols:
            return {}
        table = pq.read_table(fpath, columns=cols)
        out: dict[str, list[int]] = {}
        for col in cols:
            bits: set[int] = set()
            for v in table.column(col).unique().to_pylist():
                if v is not None:
                    bits.update(self._bloom_positions(v))
            out[col] = sorted(bits)
        return out

    #: entries per manifest segment file. Each commit serializes only
    #: its CHANGED segments; intact ones are carried by reference, so
    #: commit metadata cost is O(changed files), not O(table files) —
    #: at 10^6 files (~4000 segments) a one-file upsert rewrites one
    #: segment + the ~4000-row manifest list, not 10^6 entries.
    SEGMENT_TARGET = 256
    #: an intact segment thinner than this counts as FRAGMENTED…
    SEGMENT_MIN_FILL = SEGMENT_TARGET // 4
    #: …and once this many fragmented segments accumulate, a commit
    #: folds them all into its rewrite pool — incremental commits
    #: self-compact their manifest fragmentation (the job Iceberg
    #: delegates to a rewrite-manifests action) while a mostly-static
    #: table keeps carrying its few small segments by reference.
    SEGMENT_FOLD_AT = 4

    @staticmethod
    def _entries_digest(entries: list[FileEntry]) -> str:
        """Order-independent content digest of a segment's entries.
        Stored in the segment summary at write time and re-checked at
        reuse time, so "same count as the parent summary" can never
        silently publish stale contents if a future op commits a
        content-modified copy of an entry that kept its ``.segment``
        pointer — the reuse invariant is ENFORCED, not assumed.

        Digests the cheap identity projection (path, rows, key range),
        NOT the full entry: blooms/stats can run to tens of KB per
        file, and serializing them per reused segment per commit would
        put an O(table bytes) constant back on the commit path the
        segment split exists to avoid. The projection is sufficient:
        data files are immutable, so blooms/stats are a pure function
        of ``path`` — an entry differing only in derived fields while
        keeping its path is already corrupt upstream of the manifest."""
        import hashlib

        items = sorted(
            f"{e.path}|{e.rows}|{e.min_key}|{e.max_key}" for e in entries
        )
        return hashlib.md5("\n".join(items).encode()).hexdigest()

    def _commit(
        self,
        op: str,
        files: list[FileEntry],
        parent: int,
        deletes: list[dict] | None = None,
        extra: dict | None = None,
    ) -> int:
        """Publish ``files`` as version ``parent``+1, reusing the
        parent's intact manifest segments by reference (see
        SEGMENT_TARGET). A segment is intact iff every entry it held
        is still active AND content-identical — decided by count plus
        the summary's ``entries_digest`` (entries are immutable and
        never resurrect, but the digest check makes that invariant
        enforced rather than assumed). Survivors of broken segments,
        new files, and under-filled segments are re-serialized into
        fresh right-sized segments.

        ``deletes`` is the version's merge-on-read delete-vector list
        (see :meth:`delete_where_mor`) — stored INLINE in the manifest,
        never in segments: the active delete set is small by design
        (maintenance materializes it back into data files), while the
        data-file list is what grows to 10^6 entries."""
        import uuid

        version = parent + 1
        parent_summaries: dict[str, dict] = {}
        # partition-spec lineage carries forward unchanged unless the
        # committing op overrides it via ``extra`` (evolve_partition_spec)
        specs = [{"spec_id": 0, "cols": []}]
        default_spec_id = 0
        if parent >= 1:
            try:
                with open(self._manifest_path(parent)) as fh:
                    praw = json.load(fh)
                for s in praw.get("segments", []):
                    parent_summaries[os.path.join(self._manifest_dir, s["path"])] = s
                specs = praw.get("specs") or specs
                default_spec_id = praw.get("default_spec_id", 0)
            except FileNotFoundError:
                pass

        by_seg: dict[str, list[FileEntry]] = {}
        pool: list[FileEntry] = []
        for f in files:
            if f.segment is not None and f.segment in parent_summaries:
                by_seg.setdefault(f.segment, []).append(f)
            else:
                # new file, or an entry from a foreign manifest dir
                # (e.g. fast_forward reading a branch's segments) —
                # always re-serialized into THIS table's namespace
                pool.append(f)

        segments: list[dict] = []
        thin: list[tuple[dict, list[FileEntry]]] = []
        for seg_path, members in by_seg.items():
            s = parent_summaries[seg_path]
            if len(members) != s["n_files"] or s.get(
                "entries_digest"
            ) != self._entries_digest(members):
                pool.extend(members)  # broken — survivors re-serialize
            elif len(members) < self.SEGMENT_MIN_FILL:
                thin.append((s, members))  # intact but fragmented
            else:
                segments.append(s)  # intact — carried by reference
        if len(thin) >= self.SEGMENT_FOLD_AT:
            for _, members in thin:
                pool.extend(members)
        else:
            segments.extend(s for s, _ in thin)

        os.makedirs(self._manifest_dir, exist_ok=True)
        for i in range(0, len(pool), self.SEGMENT_TARGET):
            chunk = pool[i : i + self.SEGMENT_TARGET]
            # writer-unique name: a losing optimistic committer's
            # segments become orphans swept by vacuum, never clobbered
            name = f"seg-{uuid.uuid4().hex}.json"
            with open(os.path.join(self._manifest_dir, name), "w") as fh:
                json.dump([f.to_json() for f in chunk], fh, sort_keys=True)
            keyed = [f for f in chunk if f.min_key is not None]
            segments.append(
                {
                    "path": name,
                    "n_files": len(chunk),
                    "n_rows": sum(f.rows for f in chunk),
                    "min_key": min((f.min_key for f in keyed), default=None),
                    "max_key": max((f.max_key for f in keyed), default=None),
                    "entries_digest": self._entries_digest(chunk),
                }
            )

        self._publish(
            version,
            {
                "version": version,
                "op": op,
                "key": self.key,
                "parent": parent or None,
                "n_files": sum(s["n_files"] for s in segments),
                # physical rows in the data files; MoR-deleted rows are
                # still counted until maintenance materializes them
                "n_rows": sum(s["n_rows"] for s in segments),
                "segments": segments,
                "deletes": deletes or [],
                "specs": specs,
                "default_spec_id": default_spec_id,
                **(extra or {}),
            },
        )
        return version

    # ------------------------------------------------------ operations

    def _bad_condition(
        self, batch: DataFrame, tombstone_col: str | None = None
    ) -> F.Column:
        """The constraint-violation predicate over a write batch (key
        NOT NULL, CHECK expression on non-tombstone rows) — shared by
        :meth:`_validate` and the fused :meth:`_validate_and_touched`."""
        bad_cond = F.col(self.key).isNull()
        if self.check is not None:
            check_fail = ~F.coalesce(F.expr(self.check), F.lit(False))
            if tombstone_col is not None and tombstone_col in batch.columns:
                check_fail = check_fail & ~F.coalesce(
                    F.col(tombstone_col), F.lit(False)
                )
            bad_cond = bad_cond | check_fail
        return bad_cond

    def _validate(self, batch: DataFrame, tombstone_col: str | None = None) -> None:
        """Refuse a write batch violating the table's constraints: the
        key must be NOT NULL on every row, and non-tombstone rows must
        satisfy the declared CHECK expression. One bounded pass over
        the BATCH (never the table); only a single offending row is
        collected for the error message."""
        bad = batch.filter(
            self._bad_condition(batch, tombstone_col)
        ).limit(1).collect()
        if bad:
            raise ConstraintViolationError(
                f"write batch violates table constraints "
                f"(key NOT NULL{' AND CHECK (' + self.check + ')' if self.check else ''}); "
                f"first offending row: {bad[0].asDict()}"
            )

    def create(self, df: DataFrame, n_files: int = 8) -> int:
        """Initialize version 1 from ``df`` (caller guarantees the key
        is unique — the table invariant every merge preserves)."""
        if self.latest_version() != 0:
            raise CommitConflictError(f"table already exists at {self.path}")
        self._validate(df)
        files = self._write_data_files(df, 1, n_files)
        return self._commit("create", files, parent=0)

    # --------------------------------------- merge-on-read delete I/O

    @staticmethod
    def _delete_scope(m: dict) -> dict[str, frozenset]:
        """data-file path → frozenset of delete-file paths applying to
        it, from the manifest's inline ``deletes`` list."""
        scope: dict[str, set] = {}
        for d in m.get("deletes") or []:
            for p in d["applies_to"]:
                scope.setdefault(p, set()).add(d["path"])
        return {p: frozenset(s) for p, s in scope.items()}

    def _read_with_deletes(self, m: dict, paths: list[str] | None = None) -> DataFrame:
        """Read ``paths`` (default: all of ``m``'s data files) with the
        manifest's merge-on-read delete vectors applied — the Iceberg
        v2 read contract [PK], scoped STRICTLY per file: a delete
        file's keys suppress rows only in the data files it names, so
        a key deleted and later re-inserted (living in a newer file
        outside the vector's scope) stays visible.

        Plan shape: data files are grouped by their applicable
        delete-file set (≤ |delete entries|+1 groups in practice, 1
        after maintenance); each group is one parquet scan anti-joined
        against its delete keys (a small key-only side — AQE
        broadcasts it), then the groups union. On a table with no
        active deletes this is exactly the old single-scan plan."""
        if paths is None:
            paths = [f["path"] for f in m["files"]]
        scope = self._delete_scope(m)
        groups: dict[frozenset, list[str]] = {}
        for p in paths:
            groups.setdefault(scope.get(p, frozenset()), []).append(p)
        out: DataFrame | None = None
        for dset in sorted(groups, key=sorted):
            df = self.spark.read.option("mergeSchema", "true").parquet(
                *sorted(groups[dset])
            )
            if dset:
                keys = (
                    self.spark.read.parquet(*sorted(dset))
                    .select(self.key)
                    .distinct()
                )
                df = df.join(keys, self.key, "left_anti")
            out = df if out is None else out.unionByName(
                df, allowMissingColumns=True
            )
        assert out is not None  # caller guarantees paths is non-empty
        return out

    @staticmethod
    def _carry_deletes(m: dict, removed: set[str]) -> list[dict]:
        """The parent's delete entries, re-scoped for a commit that
        rewrites/removes ``removed`` data files: a rewrite MATERIALIZES
        the vectors over those files (the rewritten output already
        excludes the deleted rows), so they leave each entry's
        ``applies_to``; an entry scoped to nothing is dropped and its
        delete file becomes a vacuum-swept orphan."""
        out = []
        for d in m.get("deletes") or []:
            keep = [p for p in d["applies_to"] if p not in removed]
            if keep:
                out.append({**d, "applies_to": keep})
        return out

    def read(self, version: int | None = None) -> DataFrame:
        m = self._read_manifest(version)
        paths = [f["path"] for f in m["files"]]
        if not paths:
            raise FileNotFoundError(f"version {m['version']} has no files")
        # mergeSchema: after an add-column merge, carried files keep the
        # old schema — the union read nulls the missing column, which
        # is exactly the schema-evolution read contract
        return self._read_with_deletes(m, paths)

    def read_pruned(
        self, lo: int, hi: int, version: int | None = None
    ) -> DataFrame:
        """Key-range read with manifest zone-map pruning: only files
        whose [min_key, max_key] overlaps [lo, hi] are opened — file
        skipping decided from manifest stats alone, before any task
        launches (Iceberg's min/max file skipping; one step earlier
        than parquet row-group pruning, which still needs a task per
        file to read footers). The residual predicate is applied on
        the surviving files, so correctness never depends on the
        stats; a stats-less file is conservatively read. On a
        range-clustered layout the overlap set is |range|/|table| of
        the files — the manifest turns a full scan into a seek."""
        m = self._read_manifest(version)
        paths = [
            f["path"]
            for f in m["files"]
            if f["min_key"] is None or (f["min_key"] <= hi and f["max_key"] >= lo)
        ]
        if not paths:
            return self.read(version).limit(0)
        df = self._read_with_deletes(m, paths)
        return df.filter((F.col(self.key) >= lo) & (F.col(self.key) <= hi))

    def read_pruned_on(
        self, col: str, lo, hi, version: int | None = None
    ) -> DataFrame:
        """Range read pruned on ANY numeric column via the manifest's
        multi-column zone maps: only files whose [min, max] for ``col``
        overlaps [lo, hi] are opened. On a key-clustered layout a
        non-key column scatters across every file (no pruning); after
        :meth:`cluster_zorder` on (key, col), both dimensions prune —
        the Delta OPTIMIZE ZORDER payoff, decided driver-side before
        any task launches. Conservative: a file without stats for
        ``col`` is read; the residual filter keeps the answer exact."""
        m = self._read_manifest(version)
        paths = []
        for f in m["files"]:
            rng = (f.get("stats") or {}).get(col)
            if rng is None or (rng[0] <= hi and rng[1] >= lo):
                paths.append(f["path"])
        if not paths:
            return self.read(version).limit(0).filter(
                (F.col(col) >= lo) & (F.col(col) <= hi)
            )
        df = self._read_with_deletes(m, paths)
        return df.filter((F.col(col) >= lo) & (F.col(col) <= hi))

    def files_overlapping(self, col: str, lo, hi, version: int | None = None) -> int:
        """How many files a [lo, hi] read on ``col`` would open —
        the layout-quality metric the clustering tests assert on."""
        m = self._read_manifest(version)
        return sum(
            1
            for f in m["files"]
            if (rng := (f.get("stats") or {}).get(col)) is None
            or (rng[0] <= hi and rng[1] >= lo)
        )

    # ------------------------------------ partition-spec evolution

    def current_spec(self) -> dict:
        """The table's default partition spec ``{"spec_id": int,
        "cols": [str, ...]}`` (spec 0 / unpartitioned for tables that
        never evolved)."""
        try:
            with open(self._manifest_path(self.latest_version())) as fh:
                raw = json.load(fh)
        except (FileNotFoundError, OSError):
            return {"spec_id": 0, "cols": []}
        specs = raw.get("specs") or [{"spec_id": 0, "cols": []}]
        want = raw.get("default_spec_id", 0)
        return next(s for s in specs if s["spec_id"] == want)

    def evolve_partition_spec(self, cols: list[str]) -> int:
        """Iceberg-style partition evolution [PK]: a METADATA-ONLY
        commit that appends a new partition spec and makes it the
        default for future writes. Existing data files are untouched
        and keep their original spec lineage — no rewrite, O(changed
        files)=0, every parent manifest segment carries by reference.
        Readers handle the mixed layout per file (see
        :meth:`read_partition_pruned`). Spec lineage is monotonic
        metadata: a data :meth:`rollback` restores FILES but keeps
        the current spec list and default (Iceberg's rollback
        likewise reverts snapshots, not spec history [PK])."""
        parent = self.latest_version()
        m = self._read_manifest(parent)
        specs = list(m.get("specs") or [{"spec_id": 0, "cols": []}])
        new_id = max(s["spec_id"] for s in specs) + 1
        specs.append({"spec_id": new_id, "cols": list(cols)})
        carried = [FileEntry.from_json(f) for f in m["files"]]
        return self._commit(
            "evolve-spec",
            carried,
            parent,
            deletes=self._carry_deletes(m, set()),
            extra={"specs": specs, "default_spec_id": new_id},
        )

    def append(self, df: DataFrame, n_files: int = 8) -> int:
        """Append-only commit (no key overlap enforced beyond the
        CHECK constraint — caller guarantees key uniqueness, as with
        :meth:`create`). Rows are laid out under the CURRENT default
        partition spec: partitioned specs route rows with one
        ``partitionBy`` write (Spark's dynamic partitioning — no
        driver-side distinct/collect of partition values), so each
        data file carries exact partition values in its manifest
        entry and equality reads prune files driver-side even for
        STRING columns, which numeric zone maps can never serve."""
        parent = self.latest_version()
        m = self._read_manifest(parent)
        self._validate(df)
        spec = self.current_spec()
        version = parent + 1
        if spec["cols"]:
            new = self._write_partitioned_files(
                df, version, spec["cols"], spec["spec_id"], n_files
            )
        else:
            new = self._write_data_files(df, version, n_files)
        carried = [FileEntry.from_json(f) for f in m["files"]]
        return self._commit(
            "append",
            carried + new,
            parent,
            deletes=self._carry_deletes(m, set()),
        )

    def _write_partitioned_files(
        self,
        df: DataFrame,
        version: int,
        cols: list[str],
        spec_id: int,
        n_files: int,
    ) -> list[FileEntry]:
        """Write ``df`` hive-layout partitioned on ``cols``. The
        partition columns are DUPLICATED into ``__p<i>`` writer
        columns so the data files stay self-contained (Spark's
        ``partitionBy`` drops the partitioning column from the file;
        explicit-path manifest reads would silently lose it).
        Partition values are parsed back from the directory names —
        exact per file, no data re-scan."""
        import uuid

        out_dir = os.path.join(
            self.path, "data", f"commit-{version:06d}-{uuid.uuid4().hex[:8]}"
        )
        pcols = [f"__p{i}" for i in range(len(cols))]
        staged = df
        for p, c in zip(pcols, cols):
            staged = staged.withColumn(p, F.col(c).cast("string"))
        # bound files per partition: rows for one partition tuple land
        # in at most n_files tasks
        staged.repartition(n_files, *[F.col(c) for c in cols]).write.mode(
            "overwrite"
        ).partitionBy(*pcols).parquet(out_dir)
        entries: list[FileEntry] = []
        for root, _dirs, names in os.walk(out_dir):
            parts: dict[str, str] = {}
            rel = os.path.relpath(root, out_dir)
            if rel != ".":
                for comp in rel.split(os.sep):
                    k, _, v = comp.partition("=")
                    if k in dict(zip(pcols, cols)):
                        parts[dict(zip(pcols, cols))[k]] = v
            for n in sorted(names):
                if not n.endswith(".parquet"):
                    continue
                e = self._file_entry(os.path.join(root, n))
                e = FileEntry(
                    path=e.path,
                    rows=e.rows,
                    min_key=e.min_key,
                    max_key=e.max_key,
                    blooms=e.blooms,
                    stats=e.stats,
                    spec_id=spec_id,
                    partition=dict(parts) or None,
                )
                entries.append(e)
        return entries

    def read_partition_pruned(
        self, eq: dict[str, object], version: int | None = None
    ) -> DataFrame:
        """Equality read across a partition-evolved table: files
        written under a spec covering a filter column are opened iff
        their recorded partition value matches; pre-evolution files
        fall back to numeric zone maps when possible and are
        otherwise read conservatively. The residual filter keeps the
        answer exact regardless of which metadata served each file —
        correctness never depends on pruning, only cost does."""
        m = self._read_manifest(version)
        paths = self._partition_prune_paths(m, eq)
        residual = None
        for c, v in eq.items():
            clause = F.col(c) == F.lit(v)
            residual = clause if residual is None else (residual & clause)
        if not paths:
            return self.read(version).limit(0).filter(residual)
        return self._read_with_deletes(m, paths).filter(residual)

    @staticmethod
    def _partition_prune_paths(m: dict, eq: dict[str, object]) -> list[str]:
        paths = []
        for f in m["files"]:
            part = f.get("partition") or {}
            keep = True
            for c, v in eq.items():
                if c in part:
                    if part[c] != str(v):
                        keep = False
                        break
                else:
                    rng = (f.get("stats") or {}).get(c)
                    if (
                        rng is not None
                        and isinstance(v, (int, float))
                        and not (rng[0] <= v <= rng[1])
                    ):
                        keep = False
                        break
            if keep:
                paths.append(f["path"])
        return paths

    def partition_files_matching(
        self, eq: dict[str, object], version: int | None = None
    ) -> int:
        """How many files a :meth:`read_partition_pruned` on ``eq``
        would open — decided from manifest metadata alone (no Spark
        job); the layout-quality metric the evolution tests assert."""
        return len(
            self._partition_prune_paths(self._read_manifest(version), eq)
        )

    ZORDER_BITS = 10

    def cluster_zorder(self, col2: str, n_files: int = 8) -> int:
        """Re-cluster the current snapshot on the Z-curve of
        (key, ``col2``) and commit it — Delta's OPTIMIZE ZORDER as a
        snapshot commit. Both columns quantize to 10 bits (min/max from
        one bounded aggregate), bit-interleave into a 20-bit z-value
        (pure shift/and/or column arithmetic, JVM-side), and the
        rewrite range-partitions + sorts on it, so every file covers a
        compact 2-D box: reads filtered on EITHER column now prune via
        the multi-column zone maps. Old versions keep the old layout
        (clustering is just a commit)."""
        parent = self.latest_version()
        cur = self.read(parent)
        bounds = cur.agg(
            F.min(self.key).alias("k_mn"),
            F.max(self.key).alias("k_mx"),
            F.min(col2).alias("c_mn"),
            F.max(col2).alias("c_mx"),
        )
        scale = 1 << self.ZORDER_BITS

        def q(c, mn, mx):
            return F.least(
                F.lit(scale - 1),
                F.floor(
                    (F.col(c) - F.col(mn))
                    / (F.col(mx) - F.col(mn) + F.lit(1e-9))
                    * scale
                ).cast("long"),
            )

        z = F.lit(0).cast("long")
        for i in range(self.ZORDER_BITS):
            z = z + F.shiftleft(
                F.shiftright(q(self.key, "k_mn", "k_mx"), i).bitwiseAND(F.lit(1)),
                2 * i,
            )
            z = z + F.shiftleft(
                F.shiftright(q(col2, "c_mn", "c_mx"), i).bitwiseAND(F.lit(1)),
                2 * i + 1,
            )
        import uuid

        zdf = (
            cur.crossJoin(F.broadcast(bounds))
            .withColumn("__z", z)
            .repartitionByRange(n_files, F.col("__z"))
            .sortWithinPartitions("__z")
            .drop("__z", "k_mn", "k_mx", "c_mn", "c_mx")
        )
        version = parent + 1
        out_dir = os.path.join(
            self.path, "data", f"commit-{version:06d}-{uuid.uuid4().hex[:8]}"
        )
        zdf.write.mode("overwrite").parquet(out_dir)
        new_files = [
            self._file_entry(os.path.join(out_dir, n))
            for n in sorted(os.listdir(out_dir))
            if n.endswith(".parquet")
        ]
        return self._commit("cluster_zorder", new_files, parent)

    def read_point_lookup(
        self, col: str, value, version: int | None = None
    ) -> DataFrame:
        """Point lookup on a non-clustered column with bloom file
        skipping: only files whose manifest bloom for ``col`` contains
        all of the value's bit positions are opened. Range clustering
        can't help such columns (the value is scattered across every
        key range); the bloom gives ~98% of files a definite "not
        here" at 16 KiB of manifest per (file, column). False
        positives only cost an extra file read — the residual equality
        filter keeps the answer exact; a file without a bloom for
        ``col`` is conservatively read."""
        m = self._read_manifest(version)
        want = set(self._bloom_positions(value))
        paths = []
        for f in m["files"]:
            bloom = (f.get("blooms") or {}).get(col)
            if bloom is None or want.issubset(bloom):
                paths.append(f["path"])
        if not paths:
            return self.read(version).limit(0).filter(F.col(col) == F.lit(value))
        df = self._read_with_deletes(m, paths)
        return df.filter(F.col(col) == F.lit(value))

    def _touched_files(self, m: dict, keys: DataFrame) -> list[str]:
        """File paths whose [min_key, max_key] may contain an update
        key: manifest-stats DataFrame (one row per file, broadcast)
        range-joined against the update keys. Conservative — a file
        with no stats is always touched."""
        stats = [
            (f["path"], f["min_key"], f["max_key"])
            for f in m["files"]
            if f["min_key"] is not None
        ]
        no_stats = [f["path"] for f in m["files"] if f["min_key"] is None]
        if not stats:
            return no_stats
        sdf = self.spark.createDataFrame(
            stats, "path string, min_key long, max_key long"
        )
        hit = (
            keys.select(F.col(self.key).alias("k"))
            .join(
                F.broadcast(sdf),
                (F.col("k") >= F.col("min_key")) & (F.col("k") <= F.col("max_key")),
            )
            .select("path")
            .distinct()
            .collect()
        )
        return no_stats + [r["path"] for r in hit]

    def _validate_and_touched(
        self, m: dict, updates: DataFrame, tombstone_col: str | None = None
    ) -> set[str]:
        """:meth:`_validate` + :meth:`_touched_files` in ONE Spark
        action (r15, guide §1/§2: the COW merge path ran two separate
        jobs over the same update batch — constraint scan, then
        stats-prune join — re-executing the batch plan twice). Each
        batch row is annotated with its violation flag, left-joined
        against the broadcast manifest-stats ranges, and a single
        aggregate returns (one offending row if any, the distinct
        touched paths). Raises exactly like ``_validate``; returns
        exactly ``_touched_files``' path set."""
        stats = [
            (f["path"], f["min_key"], f["max_key"])
            for f in m["files"]
            if f["min_key"] is not None
        ]
        no_stats = [f["path"] for f in m["files"] if f["min_key"] is None]
        if not stats:
            self._validate(updates, tombstone_col)
            return set(no_stats)
        sdf = self.spark.createDataFrame(
            stats, "path string, min_key long, max_key long"
        )
        bad_cond = self._bad_condition(updates, tombstone_col)
        annotated = updates.select(
            F.col(self.key).alias("k"),
            F.when(bad_cond, F.struct(*updates.columns)).alias("_bad_row"),
        )
        agg = (
            annotated.join(
                F.broadcast(sdf),
                (F.col("k") >= F.col("min_key"))
                & (F.col("k") <= F.col("max_key")),
                "left",
            )
            .agg(
                F.first("_bad_row", ignorenulls=True).alias("bad"),
                F.collect_set("path").alias("paths"),
            )
            .collect()[0]
        )
        if agg["bad"] is not None:
            raise ConstraintViolationError(
                f"write batch violates table constraints "
                f"(key NOT NULL{' AND CHECK (' + self.check + ')' if self.check else ''}); "
                f"first offending row: {agg['bad'].asDict()}"
            )
        return set(no_stats) | set(agg["paths"])

    def _plan_cow_merge(
        self, updates: DataFrame, tombstone_col: str | None = None
    ) -> tuple[int, set[str], list[FileEntry], DataFrame]:
        """Shared copy-on-write planning for :meth:`merge_upsert` and
        :meth:`stage_merge`: validate the batch, stats-prune the
        touched files, carry everything else, and build the merged
        DataFrame. Returns (parent_version, touched_paths,
        carried_entries, carried_deletes, merged_df). The base read
        applies the parent's MoR delete vectors (a deleted key must
        not resurrect through a merge that rewrites its file), and the
        rewrite materializes those vectors — carried_deletes is the
        parent list re-scoped off the touched files."""
        parent = self.latest_version()
        m = self._read_manifest(parent)
        # one action for validate + stats-prune (was two passes over
        # the batch plan — see _validate_and_touched)
        touched = self._validate_and_touched(m, updates, tombstone_col)
        carried = [
            FileEntry.from_json(f)
            for f in m["files"]
            if f["path"] not in touched
        ]
        carried_deletes = self._carry_deletes(m, touched)
        if touched:
            base = self._read_with_deletes(m, sorted(touched))
        else:
            # empty-base fallback must not inherit the tombstone column,
            # or a pure-insert tombstone batch would write it into the
            # table via the base-only column pass-through
            schema_src = (
                updates.drop(tombstone_col)
                if tombstone_col is not None and tombstone_col in updates.columns
                else updates
            )
            base = self.spark.createDataFrame([], schema_src.schema)
        merged = self._merge_plan(base, updates, tombstone_col)
        return parent, touched, carried, carried_deletes, merged

    def merge_upsert(
        self, updates: DataFrame, tombstone_col: str | None = None
    ) -> int:
        """MERGE INTO (SCD1): rows in ``updates`` replace same-key rows
        and insert new keys, copy-on-write on the touched files only.

        ``tombstone_col`` enables the full three-arm MERGE: an update
        row with that boolean column true DELETES its key instead
        (``WHEN MATCHED AND cond THEN DELETE``) — update, insert, and
        delete land in ONE atomic commit, which is what keeps a CDC
        apply (upserts + deletes interleaved) from tearing across
        versions. The column itself never reaches the table."""
        parent, touched, carried, carried_deletes, merged = self._plan_cow_merge(
            updates, tombstone_col
        )
        version = parent + 1
        n_files = max(1, len(touched))
        new_files = self._write_persisted(merged, version, n_files)
        return self._commit(
            "merge", carried + new_files, parent, deletes=carried_deletes
        )

    def _write_persisted(
        self, merged: DataFrame, version: int, n_files: int
    ) -> list[FileEntry]:
        """Write a JOIN-BACKED frame: range-clustered writes sample the
        child first, so an unpersisted merge join executes TWICE (once
        for the sampling pass, once for the write). Persisting caps it
        at one; the footprint is the merged output of the TOUCHED files
        only — the same bytes about to be written, so at any scale the
        cache is bounded by the rewrite working set (MEMORY_AND_DISK:
        spill, never recompute). Not used for create/compact/delete,
        whose recompute is a cheap pushdown parquet re-scan, not a
        join."""
        from pyspark import StorageLevel

        merged = merged.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            return self._write_data_files(merged, version, n_files)
        finally:
            merged.unpersist()

    def _merge_plan(
        self,
        base: DataFrame,
        updates: DataFrame,
        tombstone_col: str | None = None,
    ) -> DataFrame:
        """The SCD1 merge as a DataFrame: full outer join on the key;
        where an update ROW exists (matched by the NOT-NULL key), its
        values win for every column it carries — INCLUDING explicit
        NULLs, so an upstream ``UPDATE … SET x = NULL`` lands
        faithfully (a naive column-wise COALESCE would silently keep
        the old value). Tombstoned keys are dropped post-join (a
        delete arm, not a null-out). Schema evolution: a column new in
        ``updates`` doesn't exist on the base side yet — null there
        (carried files get the null on read via mergeSchema); a base
        column absent from ``updates`` passes through unchanged."""
        b, u = base.alias("b"), updates.alias("u")
        base_cols = {c for c in base.columns if c != tombstone_col}
        upd_cols = set(updates.columns) - {tombstone_col}
        cols = [c for c in updates.columns if c != tombstone_col] + [
            c for c in base.columns if c not in upd_cols and c != tombstone_col
        ]
        # the key is NOT NULL by table constraint, so a non-null update
        # key IS row existence — the correct "matched" predicate
        upd_exists = F.col(f"u.{self.key}").isNotNull()

        def side(c: str) -> F.Column:
            if c in upd_cols:
                bc = (
                    F.col(f"b.{c}")
                    if c in base_cols
                    else F.lit(None).cast(updates.schema[c].dataType)
                )
                return F.when(upd_exists, F.col(f"u.{c}")).otherwise(bc).alias(c)
            # base-only column (absent from the update batch): passes
            # through unchanged — null only for pure inserts
            return F.col(f"b.{c}").alias(c)

        joined = b.join(
            u, F.col(f"b.{self.key}") == F.col(f"u.{self.key}"), "full"
        )
        if tombstone_col is not None:
            joined = joined.filter(
                ~F.coalesce(F.col(f"u.{tombstone_col}"), F.lit(False))
            )
        return joined.select(*[side(c) for c in cols])

    def delete_where(self, predicate: str) -> int:
        """DELETE: rewrite only the files that actually contain a
        matching row (found by one pushdown-filtered scan over
        ``input_file_name``), keeping every clean file as-is."""
        parent = self.latest_version()
        m = self._read_manifest(parent)
        all_paths = [f["path"] for f in m["files"]]
        # mergeSchema: after an add-column merge the carried files lack
        # the new column — without the union schema a predicate on that
        # column would fail against the old-schema files
        cur = self.spark.read.option("mergeSchema", "true").parquet(*all_paths)
        touched = {
            r["f"]
            for r in cur.filter(predicate)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .collect()
        }
        # input_file_name returns URIs; manifest stores raw paths
        touched = {t[len("file://"):] if t.startswith("file://") else t for t in touched}
        carried = [
            FileEntry.from_json(f)
            for f in m["files"]
            if f["path"] not in touched
        ]
        version = parent + 1
        if not touched:
            return self._commit(
                "delete", carried, parent, deletes=self._carry_deletes(m, set())
            )
        # keep every row where the predicate is NOT definitely true:
        # `NOT (pred)` alone would also drop rows where pred evaluates
        # to NULL (e.g. a NULL in a schema-evolved column), silently
        # deleting rows the DELETE never matched. The base read applies
        # any MoR delete vectors (the rewrite materializes them).
        kept = self._read_with_deletes(m, sorted(touched)).filter(
            ~F.coalesce(F.expr(predicate), F.lit(False))
        )
        new_files = self._write_data_files(kept, version, max(1, len(touched)))
        return self._commit(
            "delete", carried + new_files, parent,
            deletes=self._carry_deletes(m, touched),
        )

    def delete_where_mor(self, predicate: str) -> int:
        """Merge-on-read DELETE (Iceberg v2 equality-delete pattern
        [PK]): instead of rewriting every file containing a matching
        row (copy-on-write rewrite amplification — a 1-row delete in a
        1 GB file rewrites 1 GB), commit a small DELETE FILE holding
        just the matched KEYS, scoped via ``applies_to`` to the data
        files that may contain them. Readers anti-join the vector
        against exactly those files (:meth:`_read_with_deletes`);
        every other file's scan is untouched. Write cost is O(matched
        keys), deferring the rewrite to :meth:`materialize_deletes` /
        :meth:`compact`, which fold vectors back into plain files off
        the commit path — the COW↔MoR tradeoff table formats expose as
        ``write.delete.mode`` [PK].

        The key-unique invariant makes equality deletes on the key
        exact; re-inserting a deleted key later is safe because the
        re-insert's file is never in the old vector's scope. A
        predicate matching nothing commits a no-rewrite version (same
        files, carried vectors), keeping "a delete always commits"
        parity with :meth:`delete_where`."""
        import uuid

        parent = self.latest_version()
        m = self._read_manifest(parent)
        hit_keys = (
            self.read(parent)
            .filter(F.coalesce(F.expr(predicate), F.lit(False)))
            .select(self.key)
            .distinct()
        )
        carried = [FileEntry.from_json(f) for f in m["files"]]
        deletes = self._carry_deletes(m, set())
        # write the key file FIRST, then derive the vector's scope from
        # the written file's rows: the matched-keys plan (a full
        # vector-applied table scan) executes exactly once — scoping
        # re-reads the tiny key file, not the table
        out_dir = os.path.join(
            self.path, "data",
            f"commit-{parent + 1:06d}-mor-{uuid.uuid4().hex[:8]}",
        )
        entry = self._write_files_to(hit_keys, out_dir, 1)
        if entry and entry[0].rows > 0:
            fe = entry[0]
            applies_to = sorted(
                self._touched_files(m, self.spark.read.parquet(fe.path))
            )
            if applies_to:
                deletes.append(
                    {
                        "path": fe.path,
                        "n_keys": fe.rows,
                        "min_key": fe.min_key,
                        "max_key": fe.max_key,
                        "applies_to": applies_to,
                    }
                )
        return self._commit("delete_mor", carried, parent, deletes=deletes)

    def merge_upsert_mor(
        self, updates: DataFrame, tombstone_col: str | None = None
    ) -> int:
        """Merge-on-read FULL-ROW upsert (the deletion-vector + append
        pattern [PK: Delta DVs / Iceberg v2 MERGE with merge-on-read
        write mode]): commit (1) a delete vector holding every update
        key, scoped to the stats-pruned files that may contain them —
        suppressing the OLD copies — and (2) an append file with the
        new rows (tombstoned keys appear in the vector only). No data
        file is read or rewritten, so commit cost is O(batch), not
        O(touched files) — the write path for high-churn narrow
        upserts where COW rewrite amplification bites.

        Semantics contract: this is a BLIND full-row replace (the
        Kinesis CDC "latest record wins" model). The new row is the
        update row verbatim — a base column absent from the batch
        reads back NULL (mergeSchema), NOT the old value, because no
        base read happens (that absence of a read is the entire point
        of the fast path). Column-partial updates belong on
        :meth:`merge_upsert`. Repeated MoR upserts compose: an append
        file is a first-class entry with key stats, so a later
        vector's ``applies_to`` covers it and suppresses the
        now-stale copy; maintenance folds the accumulation away."""
        import uuid

        self._validate(updates, tombstone_col)
        parent = self.latest_version()
        m = self._read_manifest(parent)
        carried = [FileEntry.from_json(f) for f in m["files"]]
        deletes = self._carry_deletes(m, set())
        version = parent + 1
        # write the key file first (one execution of the batch plan for
        # the vector), then scope it by re-reading the tiny key file —
        # the batch plan's only other execution is the append write
        out_dir = os.path.join(
            self.path, "data",
            f"commit-{version:06d}-mor-{uuid.uuid4().hex[:8]}",
        )
        entry = self._write_files_to(updates.select(self.key), out_dir, 1)
        if entry and entry[0].rows > 0:
            fe = entry[0]
            applies_to = sorted(
                self._touched_files(m, self.spark.read.parquet(fe.path))
            )
            if applies_to:
                deletes.append(
                    {
                        "path": fe.path,
                        "n_keys": fe.rows,
                        "min_key": fe.min_key,
                        "max_key": fe.max_key,
                        "applies_to": applies_to,
                    }
                )
        live = updates
        if tombstone_col is not None and tombstone_col in updates.columns:
            live = updates.filter(
                ~F.coalesce(F.col(tombstone_col), F.lit(False))
            ).drop(tombstone_col)
        new_files = [
            f for f in self._write_data_files(live, version, 1) if f.rows > 0
        ]
        return self._commit(
            "merge_mor", carried + new_files, parent, deletes=deletes
        )

    def materialize_deletes(self) -> int:
        """MoR maintenance: rewrite ONLY the data files named by any
        active delete vector, with the vectors applied, and commit a
        vector-free version — the targeted "rewrite position/equality
        deletes" maintenance action [PK], cheaper than a full
        :meth:`compact` because untouched files carry by reference.
        Returns the current version unchanged when no vector is
        active (true no-op: no version churn on idle maintenance)."""
        parent = self.latest_version()
        m = self._read_manifest(parent)
        affected = {p for d in m.get("deletes") or [] for p in d["applies_to"]}
        if not affected:
            return parent
        carried = [
            FileEntry.from_json(f)
            for f in m["files"]
            if f["path"] not in affected
        ]
        kept = self._read_with_deletes(m, sorted(affected))
        version = parent + 1
        new_files = self._write_data_files(kept, version, max(1, len(affected)))
        return self._commit(
            "materialize_deletes", carried + new_files, parent, deletes=[]
        )

    def changes(
        self, v_from: int, v_to: int, include_preimages: bool = False
    ) -> DataFrame:
        """Change data feed between two committed versions: one row per
        changed key with a ``change_type`` of ``insert`` /
        ``update_postimage`` / ``delete`` (deletes carry the pre-image
        values). With ``include_preimages``, each update additionally
        emits its ``update_preimage`` row — the old values — which is
        what downstream INCREMENTAL consumers need to retract before
        applying (aggregate maintenance: new = old − pre + post).

        Scans are manifest-diff-pruned: only files ADDED since
        ``v_from`` (new + rewritten) and files REMOVED since ``v_from``
        (the replaced ones) are read — carried files are provably
        unchanged, so CDF cost tracks the churn between the versions,
        never the table size. Rewritten-but-identical rows cancel in
        the all-columns anti-join (parquet round-trips doubles
        bit-exactly, so unchanged copies compare equal). Key identity
        relies on the table's unique-key invariant: a key lives in
        exactly one active file per version, so a key whose old file
        was replaced and which appears in no added file was deleted."""
        mf = self._read_manifest(v_from)
        mt = self._read_manifest(v_to)
        from_paths = {f["path"] for f in mf["files"]}
        to_paths = {f["path"] for f in mt["files"]}
        # Merge-on-read deletes change a CARRIED file's visible rows
        # without touching its bytes: any carried file whose applicable
        # delete-vector set differs between the versions joins BOTH
        # diff sides (read with each version's own scoping below), so
        # unchanged rows cancel in the anti-join and newly-vectored
        # rows surface as deletes — the same machinery, no special
        # delete-file diffing.
        scope_f, scope_t = self._delete_scope(mf), self._delete_scope(mt)
        vis_changed = {
            p
            for p in from_paths & to_paths
            if scope_f.get(p, frozenset()) != scope_t.get(p, frozenset())
        }
        added = sorted((to_paths - from_paths) | vis_changed)
        removed = sorted((from_paths - to_paths) | vis_changed)
        fields = self.read(v_to).schema.fields
        cols = [f.name for f in fields]
        out_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in fields
        )
        empty = self.spark.createDataFrame([], out_schema)

        def conform(df: DataFrame) -> DataFrame:
            # null-fill columns a file set predates (add-column merges:
            # removed files may carry the OLD schema) so the
            # all-columns anti-join below never references a missing
            # column; an unchanged row still cancels because its new
            # column is null on both sides
            have = set(df.columns)
            return df.select(
                *[
                    F.col(f.name)
                    if f.name in have
                    else F.lit(None).cast(f.dataType).alias(f.name)
                    for f in fields
                ]
            )

        added_df = (
            conform(self._read_with_deletes(mt, added)) if added else empty
        )
        removed_df = (
            conform(self._read_with_deletes(mf, removed)) if removed else empty
        )
        removed_keys = removed_df.select(
            F.col(self.key).alias("__removed_key")
        ).distinct()
        # null-SAFE row equality for the cancellation: with plain `=`
        # an unchanged row carrying a NULL in any column would never
        # match its copy and surface as a spurious update. eqNullSafe
        # keys still plan as a hash join.
        import functools

        a, r = added_df.alias("__a"), removed_df.alias("__r")
        same_row = functools.reduce(
            lambda x, y: x & y,
            [F.col(f"__a.{c}").eqNullSafe(F.col(f"__r.{c}")) for c in cols],
        )
        upserts = (
            a.join(r, same_row, "left_anti")
            .join(
                removed_keys,
                F.col(self.key) == F.col("__removed_key"),
                "left",
            )
            .select(
                *cols,
                F.when(F.col("__removed_key").isNotNull(), "update_postimage")
                .otherwise("insert")
                .alias("change_type"),
            )
        )
        deletes = removed_df.join(
            added_df.select(self.key), self.key, "left_anti"
        ).select(*cols, F.lit("delete").alias("change_type"))
        feed = upserts.unionByName(deletes)
        if include_preimages:
            upd_keys = upserts.filter(
                F.col("change_type") == "update_postimage"
            ).select(self.key)
            preimages = removed_df.join(upd_keys, self.key).select(
                *cols, F.lit("update_preimage").alias("change_type")
            )
            feed = feed.unionByName(preimages)
        return feed

    def compact(self, n_files: int = 4) -> int:
        """Rewrite the current snapshot into ``n_files`` range-clustered
        files — resets small-file fragmentation and re-sharpens the
        key ranges merge pruning depends on."""
        parent = self.latest_version()
        cur = self.read(parent)
        version = parent + 1
        files = self._write_data_files(cur, version, n_files)
        return self._commit("compact", files, parent)

    # ------------------------------------------------------------ tags

    @property
    def _refs_dir(self) -> str:
        return os.path.join(self.path, "_refs")

    def tag(self, name: str, version: int | None = None) -> int:
        """Create an immutable named ref (Iceberg-style TAG) pinning a
        committed version: ``read_tag(name)`` resolves it forever, and
        :meth:`vacuum` treats tagged versions as live — their manifests
        and data files survive count-based retention. This is how an
        audit/compliance snapshot ("the table as shipped to the
        regulator") stays readable while steady-state vacuuming keeps
        disk bounded. Metadata-only; re-tagging an existing name is
        refused (tags are immutable — delete + recreate is the
        explicit escape hatch)."""
        v = version if version is not None else self.latest_version()
        self._read_manifest(v)  # must exist
        os.makedirs(self._refs_dir, exist_ok=True)
        ref = os.path.join(self._refs_dir, f"{name}.json")
        if os.path.exists(ref):
            raise CommitConflictError(f"tag {name!r} already exists")
        tmp = f"{ref}.tmp"
        with open(tmp, "w") as fh:
            json.dump({"name": name, "version": v}, fh)
        os.rename(tmp, ref)
        return v

    def delete_tag(self, name: str) -> None:
        os.unlink(os.path.join(self._refs_dir, f"{name}.json"))

    def tags(self) -> dict[str, int]:
        try:
            names = os.listdir(self._refs_dir)
        except FileNotFoundError:
            return {}
        out = {}
        for n in sorted(names):
            if n.endswith(".json"):
                with open(os.path.join(self._refs_dir, n)) as fh:
                    d = json.load(fh)
                out[d["name"]] = d["version"]
        return out

    def read_tag(self, name: str) -> DataFrame:
        return self.read(version=self.tags()[name])

    def compact_small(self, min_rows: int = 200, n_files: int = 1) -> int:
        """Selective compaction (OPTIMIZE semantics): only files below
        ``min_rows`` are rewritten — binned together into ``n_files``
        range-clustered files — while every right-sized file carries
        into the new version by path identity. This is what keeps
        steady-state maintenance cheap on a table taking frequent
        narrow merges: each merge leaves a small rewrite file, and the
        periodic OPTIMIZE touches only that fragmentation, never the
        bulk of the table (a full :meth:`compact` rewrite is an
        anti-pattern at 100 TB). Returns the current version without
        committing when fewer than two files qualify."""
        parent = self.latest_version()
        m = self._read_manifest(parent)
        small = [f for f in m["files"] if f["rows"] < min_rows]
        carried = [
            FileEntry.from_json(f) for f in m["files"] if f["rows"] >= min_rows
        ]
        if len(small) < 2:
            # True no-op: publishing an identical-manifest version here
            # would churn versions on every periodic maintenance pass
            # and, under count-based vacuum retention, age real history
            # out of the retained window.
            return parent
        small_paths = {f["path"] for f in small}
        merged = self._read_with_deletes(m, sorted(small_paths))
        version = parent + 1
        new_files = self._write_data_files(merged, version, n_files)
        return self._commit(
            "compact_small", carried + new_files, parent,
            deletes=self._carry_deletes(m, small_paths),
        )

    def merge_upsert_with_retry(
        self, updates: DataFrame, max_retries: int = 3
    ) -> int:
        """Optimistic-concurrency MERGE: on a commit conflict (another
        writer published our target version first), re-read the NEW
        latest manifest and re-run the merge against it — the standard
        transactional-format retry loop. Each attempt re-plans against
        the fresh file list, so a concurrent writer's rows are never
        lost or double-applied; the data files a losing attempt wrote
        are simply never referenced by any manifest (orphans, swept by
        a vacuum pass in production). Raises after ``max_retries``
        conflicts so pathological contention surfaces instead of
        spinning."""
        last: CommitConflictError | None = None
        for _ in range(max_retries + 1):
            try:
                return self.merge_upsert(updates)
            except CommitConflictError as e:
                last = e
        raise last  # type: ignore[misc]

    def vacuum(self, retain_last: int = 2, grace_sec: float = 0.0) -> dict:
        """Physical cleanup: delete every data file not referenced by
        the ``retain_last`` most recent manifests — expired time-travel
        versions and orphans from losing optimistic-commit attempts —
        and drop the expired manifests. Returns counts for the audit
        log. Retained versions stay fully readable; the latest version
        is always retained (``retain_last`` is clamped to ≥1).

        Scale notes: the live-file set is manifest union (metadata
        only, one row per file — no directory listing of data paths is
        needed to decide liveness, only to find deletion candidates,
        and that listing is per-commit-directory).

        ``grace_sec`` guards a vacuum racing an IN-FLIGHT commit: a
        committer writes data files and ``seg-*.json`` segments BEFORE
        :meth:`_publish` makes any manifest reference them, so an
        "orphan" younger than the threshold may simply not be
        published yet — both the data-file and the segment sweep skip
        candidates with mtime inside the grace window. The sandbox
        default is 0 (tests drive commits and vacuums from one
        thread); production would set it above the longest plausible
        commit (and reader) duration, the same policy Iceberg's
        remove-orphan-files action mandates [PK]."""
        retain_last = max(1, retain_last)
        latest = self.latest_version()
        keep_versions = list(range(max(1, latest - retain_last + 1), latest + 1))
        # tagged versions are pinned live regardless of count-based
        # retention — the audit/compliance contract of a TAG
        tagged = sorted(set(self.tags().values()) - set(keep_versions))
        keep_versions = sorted(set(keep_versions) | set(tagged))
        live: set[str] = set()
        for v in keep_versions:
            m = self._read_manifest(v)
            live.update(f["path"] for f in m["files"])
            live.update(d["path"] for d in m.get("deletes") or [])
        # un-published staged snapshots are live roots too: their data
        # files appear in no committed manifest yet, but deleting them
        # would corrupt a pending write-audit-publish
        if os.path.isdir(self._staging_dir):
            for name in os.listdir(self._staging_dir):
                if name.endswith(".json"):
                    m = self._read_staging_manifest(name[:-5])
                    live.update(f["path"] for f in m["files"])
                    live.update(d["path"] for d in m.get("deletes") or [])
        # every branch head (and its history) is a live root: branch
        # commits share main's data directory, so count-based retention
        # on main must never delete a file only a branch references
        if os.path.isdir(self._branches_root):
            for bname in os.listdir(self._branches_root):
                bdir = os.path.join(self._branches_root, bname)
                for mn in os.listdir(bdir):
                    if mn.startswith("v") and mn.endswith(".json"):
                        with open(os.path.join(bdir, mn)) as fh:
                            bm = self._resolve_manifest(json.load(fh), bdir)
                        live.update(f["path"] for f in bm["files"])
                        live.update(d["path"] for d in bm.get("deletes") or [])
        import time as _time

        cutoff = _time.time() - grace_sec
        data_root = os.path.join(self.path, "data")
        removed_files = 0
        if os.path.isdir(data_root):
            for commit_dir in sorted(os.listdir(data_root)):
                d = os.path.join(data_root, commit_dir)
                for name in sorted(os.listdir(d)):
                    p = os.path.join(d, name)
                    if (
                        name.endswith(".parquet")
                        and p not in live
                        and os.path.getmtime(p) <= cutoff
                    ):
                        os.unlink(p)
                        removed_files += 1
                if not any(n.endswith(".parquet") for n in os.listdir(d)):
                    shutil.rmtree(d, ignore_errors=True)
        removed_manifests = 0
        # expire every manifest outside the retained window EXCEPT
        # tagged ones; on a never-committed table (vacuum of a path
        # holding only orphans from a failed create) there is nothing
        # to expire, but the orphan sweep above must still have run
        keep_set = set(keep_versions)
        for v in range(1, max(1, latest - retain_last + 1)):
            if v in keep_set:
                continue  # tagged — pinned through retention
            mp = self._manifest_path(v)
            if os.path.exists(mp):
                os.unlink(mp)
                removed_manifests += 1
        # segment files referenced by no surviving manifest — expired
        # versions' exclusive segments plus losing-committer orphans —
        # are dead metadata; sweep them like data files (this is the
        # manifest-compaction half of retention: surviving segments
        # were already right-sized by _commit's fold-under-fill rule)
        removed_segments = self._sweep_orphan_segments(self._manifest_dir, cutoff)
        if os.path.isdir(self._branches_root):
            for bname in os.listdir(self._branches_root):
                removed_segments += self._sweep_orphan_segments(
                    os.path.join(self._branches_root, bname), cutoff
                )
        return {
            "removed_files": removed_files,
            "removed_manifests": removed_manifests,
            "removed_segments": removed_segments,
            "retained_versions": keep_versions,
        }

    @staticmethod
    def _sweep_orphan_segments(manifest_dir: str, cutoff: float | None = None) -> int:
        """Delete ``seg-*.json`` files in ``manifest_dir`` referenced
        by none of the manifest files still present there. Segments
        with mtime after ``cutoff`` are skipped: an in-flight commit
        writes its segments before publishing the manifest that
        references them, so a young unreferenced segment may be a
        pending commit, not garbage (see :meth:`vacuum` grace_sec)."""
        if not os.path.isdir(manifest_dir):
            return 0
        referenced: set[str] = set()
        seg_files: list[str] = []
        for name in os.listdir(manifest_dir):
            p = os.path.join(manifest_dir, name)
            if name.startswith("seg-") and name.endswith(".json"):
                seg_files.append(p)
            elif name.startswith("v") and name.endswith(".json"):
                try:
                    with open(p) as fh:
                        raw = json.load(fh)
                except (OSError, ValueError):
                    continue
                referenced.update(s["path"] for s in raw.get("segments", []))
        removed = 0
        for p in seg_files:
            if os.path.basename(p) not in referenced and (
                cutoff is None or os.path.getmtime(p) <= cutoff
            ):
                os.unlink(p)
                removed += 1
        return removed

    # --------------------------------------------- write-audit-publish

    @property
    def _staging_dir(self) -> str:
        return os.path.join(self.path, "_staging")

    def stage_merge(
        self,
        updates: DataFrame,
        staged_id: str,
        tombstone_col: str | None = None,
    ) -> str:
        """Write-audit-publish, step 1: run the full copy-on-write
        merge but park the resulting manifest under ``_staging/``
        instead of committing a version. The staged snapshot is a
        first-class readable table state (:meth:`read_staged`) that NO
        production reader can see — audit queries (row counts,
        constraint checks, distribution diffs) run against it before
        the data is ever live. Data files are written once; publish is
        metadata-only. Shares :meth:`_plan_cow_merge` with the direct
        merge, so WAP merges can never drift semantically from direct
        ones (tombstone deletes included)."""
        parent, touched, carried, carried_deletes, merged = self._plan_cow_merge(
            updates, tombstone_col
        )
        out_dir = os.path.join(self.path, "data", f"staged-{staged_id}")
        from pyspark import StorageLevel

        merged = merged.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            new_files = self._write_files_to(
                merged, out_dir, max(1, len(touched))
            )
        finally:
            merged.unpersist()
        os.makedirs(self._staging_dir, exist_ok=True)
        with open(os.path.join(self._staging_dir, f"{staged_id}.json"), "w") as fh:
            json.dump(
                {
                    "staged_id": staged_id,
                    "op": "merge",
                    "key": self.key,
                    "parent": parent,
                    "files": [f.to_json() for f in carried + new_files],
                    "deletes": carried_deletes,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
        return staged_id

    def _read_staging_manifest(self, staged_id: str) -> dict:
        with open(os.path.join(self._staging_dir, f"{staged_id}.json")) as fh:
            return json.load(fh)

    def read_staged(self, staged_id: str) -> DataFrame:
        m = self._read_staging_manifest(staged_id)
        return self._read_with_deletes(m)

    def publish_staged(self, staged_id: str) -> int:
        """Write-audit-publish, step 3: promote the audited staging
        manifest to the next version — metadata-only, atomic, and
        refused if the table advanced since staging (the staged state
        was audited against a parent that is no longer latest; the
        caller re-stages on the new base rather than silently
        clobbering concurrent commits)."""
        m = self._read_staging_manifest(staged_id)
        parent = self.latest_version()
        if m["parent"] != parent:
            raise CommitConflictError(
                f"staged on v{m['parent']} but table is at v{parent} — re-stage"
            )
        files = [FileEntry.from_json(f) for f in m["files"]]
        version = self._commit(
            "merge", files, parent, deletes=self._carry_deletes(m, set())
        )
        os.unlink(os.path.join(self._staging_dir, f"{staged_id}.json"))
        return version

    def discard_staged(self, staged_id: str) -> None:
        """Failed audit: drop the staging manifest; the staged data
        files are orphans from this moment and a vacuum sweeps them.
        The live table was never touched."""
        os.unlink(os.path.join(self._staging_dir, f"{staged_id}.json"))
        shutil.rmtree(
            os.path.join(self.path, "data", f"staged-{staged_id}"),
            ignore_errors=True,
        )

    def rollback(self, to_version: int) -> int:
        """Instant rollback: commit a NEW version whose file list is
        ``to_version``'s — pure metadata (no data read or write, O(1)
        regardless of table size), history preserved (the bad commits
        stay inspectable), and it composes with every later operation
        because it IS an ordinary commit."""
        target = self._read_manifest(to_version)
        parent = self.latest_version()
        files = [FileEntry.from_json(f) for f in target["files"]]
        return self._commit(
            "rollback", files, parent,
            deletes=self._carry_deletes(target, set()),
        )

    # ------------------------------------------------------- branches

    @property
    def _branches_root(self) -> str:
        return os.path.join(self.path, "_manifest", "branches")

    def create_branch(self, name: str) -> "SnapshotTable":
        """Iceberg-style BRANCH [PK: Iceberg spec's mutable refs]: an
        independent line of commits sharing main's data files. The
        branch gets its own manifest namespace
        (``_manifest/branches/<name>/``) seeded with main's current
        head, so every table operation — merge, delete, compact, time
        travel — works on the returned handle unchanged while main
        stays frozen at its own head. Unlike write-audit-publish
        (single staged snapshot), a branch accumulates MANY commits
        before :meth:`fast_forward` lands the final state on main.
        Metadata-only to create: no data is copied."""
        import re as _re

        if not _re.fullmatch(r"[A-Za-z0-9._-]+", name):
            raise ValueError(f"invalid branch name {name!r}")
        base = self.latest_version()
        if base < 1:
            raise FileNotFoundError("cannot branch an empty table")
        bdir = os.path.join(self._branches_root, name)
        if os.path.isdir(bdir):
            raise CommitConflictError(f"branch {name!r} already exists")
        bm = self._read_manifest(base)
        view = _BranchView(self, name)
        view._publish(
            1,
            {
                "version": 1,
                "op": f"branch_from:{base}",
                "key": self.key,
                "parent": None,
                "base_version": base,
                "branch": name,
                # inline seed, annotations stripped: main's segment
                # files must not be referenced from the branch's
                # namespace (they expire on main's schedule)
                "files": [
                    {k: v for k, v in f.items() if k != "_segment"}
                    for f in bm["files"]
                ],
                # delete vectors follow the files they scope: a branch
                # read must not resurrect main's MoR-deleted rows
                "deletes": self._carry_deletes(bm, set()),
            },
        )
        return view

    def branch(self, name: str) -> "SnapshotTable":
        """Handle on an existing branch (see :meth:`create_branch`)."""
        bdir = os.path.join(self._branches_root, name)
        if not os.path.isdir(bdir):
            raise FileNotFoundError(f"no branch {name!r} in {self.path}")
        return _BranchView(self, name)

    def branches(self) -> list[str]:
        try:
            return sorted(os.listdir(self._branches_root))
        except FileNotFoundError:
            return []

    def delete_branch(self, name: str) -> None:
        """Drop the branch's manifest namespace. Its exclusive data
        files become orphans swept by the next :meth:`vacuum`."""
        bdir = os.path.join(self._branches_root, name)
        if not os.path.isdir(bdir):
            raise FileNotFoundError(f"no branch {name!r} in {self.path}")
        shutil.rmtree(bdir)

    def fast_forward(self, name: str) -> int:
        """Land a branch on main — Iceberg's ``fast_forward`` ref
        operation, expressed in this layer's linear-version model as
        ONE squash commit whose file list is the branch head's (pure
        metadata: the branch already wrote its data files into the
        shared data directory). Refused with
        :class:`CommitConflictError` if main advanced past the branch
        base — the branch no longer descends from main's head, and
        silently clobbering those commits would violate snapshot
        isolation (resolve by re-branching and replaying, as with any
        optimistic-concurrency loser)."""
        view = self.branch(name)
        base = view._read_manifest(1)["base_version"]
        head = view.latest_version()
        if self.latest_version() != base:
            raise CommitConflictError(
                f"main is at v{self.latest_version()}, branch {name!r} "
                f"forked at v{base} — fast-forward is not a descendant"
            )
        bm = view._read_manifest(head)
        files = [FileEntry.from_json(f) for f in bm["files"]]
        return self._commit(
            f"fast_forward:{name}@{head}", files, parent=base,
            deletes=self._carry_deletes(bm, set()),
        )


class _BranchView(SnapshotTable):
    """A :class:`SnapshotTable` whose manifests live under the parent's
    ``_manifest/branches/<name>/`` while data files share the parent's
    data directory (commit dirs are uuid-suffixed, so same-numbered
    branch and main versions never collide on disk)."""

    def __init__(self, parent: SnapshotTable, name: str):
        super().__init__(
            parent.spark,
            parent.path,
            parent.key,
            bloom_cols=parent.bloom_cols,
            check=parent.check,
        )
        self.branch_name = name

    @property
    def _manifest_dir(self) -> str:
        return os.path.join(self.path, "_manifest", "branches", self.branch_name)

    def vacuum(self, retain_last: int = 2, grace_sec: float = 0.0) -> dict:
        """Refused on a branch: vacuum's liveness set is rooted at
        MAIN's manifests (plus every branch's, see the base
        implementation) — a branch-rooted sweep would treat main's
        files as orphans and delete them."""
        raise CommitConflictError(
            "vacuum runs on the main table handle, not a branch"
        )

    def create_branch(self, name: str) -> "SnapshotTable":
        """Branch-of-branch is refused: the single ``branches/``
        namespace records base versions in MAIN's numbering, so a
        nested fork would fast-forward against the wrong lineage."""
        raise CommitConflictError("branch from the main table handle")

    def fast_forward(self, name: str) -> int:
        raise CommitConflictError("fast_forward runs on the main table handle")

    def tag(self, name: str, version: int | None = None) -> int:
        """Refused on a branch: the shared ``_refs`` namespace records
        versions in MAIN's numbering — a tag created here would pin a
        branch-local version number against main's lineage, and vacuum
        would keep the wrong manifest alive."""
        raise CommitConflictError("tags pin main versions — tag from main")

    def read_tag(self, name: str) -> DataFrame:
        """Refused on a branch: tags store MAIN version numbers; resolving
        one against the branch's manifest numbering would silently read
        the wrong snapshot."""
        raise CommitConflictError("tags pin main versions — read from main")

    def tags(self) -> dict[str, int]:
        raise CommitConflictError("tags pin main versions — list from main")

    def delete_tag(self, name: str) -> None:
        raise CommitConflictError("tags pin main versions — delete from main")

    def stage_merge(self, *a, **kw):
        """Refused on a branch: staged snapshots record their parent in
        the writer's version numbering inside a SHARED staging dir, so a
        branch-staged snapshot could later publish onto main when the
        per-lineage version numbers coincide — clobbering main's state
        with no conflict error. A branch IS the multi-commit staging
        mechanism; use ordinary branch commits + fast_forward."""
        raise CommitConflictError("write-audit-publish runs on main; "
                                  "a branch already is a staging line")

    def publish_staged(self, staged_id: str) -> int:
        raise CommitConflictError("publish_staged runs on the main handle")

    def read_staged(self, staged_id: str) -> DataFrame:
        raise CommitConflictError("read_staged runs on the main handle")

    def discard_staged(self, staged_id: str) -> None:
        raise CommitConflictError("discard_staged runs on the main handle")


def fresh_table_dir(sf_dir: str, op_name: str, spark: SparkSession) -> str:
    """Stable scratch root for a registered snapshot query: keyed by
    fixture + application id (no cross-session collisions), wiped on
    every call so repeat invocations are idempotent and disk stays
    bounded. Scratch roots left behind by PAST sessions (same fixture
    tag, different app id, untouched for hours) are swept here too —
    the age guard keeps a concurrently-running session's fresh dirs
    safe, so growth across many sessions stays bounded without a
    cross-session lock."""
    import hashlib
    import tempfile
    import time

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    app = spark.sparkContext.applicationId.replace("-", "_").replace(".", "_")
    tmp = tempfile.gettempdir()
    prefix = f"kf_snap_{tag}_"
    mine = f"{prefix}{app}"
    cutoff = time.time() - 6 * 3600
    try:
        for name in os.listdir(tmp):
            if not name.startswith(prefix) or name == mine:
                continue
            stale = os.path.join(tmp, name)
            try:
                if os.path.getmtime(stale) < cutoff:
                    shutil.rmtree(stale, ignore_errors=True)
            except OSError:
                pass
    except OSError:
        pass
    d = os.path.join(tmp, mine, op_name)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d
