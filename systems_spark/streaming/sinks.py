"""Idempotent ``foreachBatch`` sinks — exactly-once on plain parquet.

Structured Streaming's ``foreachBatch`` contract is AT-LEAST-ONCE: after
a crash between a batch's side effect and its checkpoint commit, the
engine REPLAYS the batch with the same ``batch_id``. Sum-shaped state
(``streaming_cms_counters``, ``StreamingCusum`` — see their honesty
notes) and any append sink therefore double-count unless the sink
itself dedups on write. This module is the standard transactional-sink
pattern (the same txn-key scheme Delta Lake's ``txnAppId``/``txnVersion``
and Kafka's transactional producer use) on nothing but parquet + a
commit manifest:

- txn key = ``(app_id, batch_id)`` — ``app_id`` names the writing query
  (one logical stream may be restarted many times; ``batch_id`` alone
  would collide across two different queries sharing a sink directory);
- each batch lands in its own ``batch_id=N`` hive partition, written
  with ``overwrite`` so a half-written attempt is clobbered by its own
  retry, never merged with it;
- a commit marker (rows + order-independent content checksum, the
  ``write_manifest_parquet`` integrity discipline) is written LAST,
  through the Hadoop FileSystem API so s3://, hdfs:// and file:// sinks
  behave alike. Readers and replays trust ONLY the marker: a replayed
  ``batch_id`` whose marker exists is a no-op, and ``committed_frame``
  reads exactly the committed partitions — an uncommitted data
  directory (crash after write, before commit) is invisible until its
  retry commits it.

At 100 TB: the marker write is one tiny file per micro-batch; the data
write is the same parquet append the non-idempotent sink would do; the
replay check is one filesystem ``exists`` — no state table, no
lock service, no driver-side data.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from systems_spark.sources import _fs_read_text

_COMMIT_DIR = "_commits"


def _commit_stamp_ms(prior_man: "dict | None") -> int:
    """Monotone commit timestamp: wall clock, but never ≤ the prior
    commit's stamp — so version order and timestamp order always agree
    (``at_timestamp`` depends on it) even across writers with skewed
    clocks or a clock stepping backwards."""
    now = int(time.time() * 1000)
    prev = int(prior_man.get("committed_at_ms", -1)) if prior_man else -1
    return max(now, prev + 1)


class ConcurrentCommitError(RuntimeError):
    """Another writer published this version first. The losing writer's
    data directory has already been cleaned up; retry by re-deriving
    from the NEW latest snapshot (the optimistic-concurrency loop the
    table's own mutators run)."""


def _evolve_schemas(snap: DataFrame, batch: DataFrame, seq_col: str,
                    op_col: str, deleted_col: str):
    """Delta-style ``mergeSchema`` alignment of a change batch and the
    standing snapshot to their UNION payload schema, so the strict merge
    core never sees a mismatch:

    - a column NEW in the batch widens the table — standing rows read it
      as NULL;
    - a payload column MISSING from the batch NULL-fills — change rows
      are full-row postimages (apply-CDC semantics), so an absent column
      in an upsert really does mean "no value", never "keep the old one";
    - a SHARED column must match types exactly — implicit casts hide
      producer bugs, so a conflict raises instead.

    Returns ``(snap', batch', evolved)`` where ``evolved`` is True iff
    either side gained columns."""
    snap_payload = {f.name: f.dataType for f in snap.schema.fields
                    if f.name not in (seq_col, deleted_col)}
    batch_payload = {f.name: f.dataType for f in batch.schema.fields
                     if f.name not in (seq_col, op_col)}
    conflicts = [n for n, t in batch_payload.items()
                 if n in snap_payload and snap_payload[n] != t]
    if conflicts:
        detail = [(n, str(snap_payload[n]), str(batch_payload[n]))
                  for n in conflicts]
        raise ValueError(
            f"schema evolution cannot change a column's type: {detail}")
    new_cols = [n for n in batch_payload if n not in snap_payload]
    missing = [n for n in snap_payload if n not in batch_payload]
    for n in new_cols:
        snap = snap.withColumn(n, F.lit(None).cast(batch_payload[n]))
    for n in missing:
        batch = batch.withColumn(n, F.lit(None).cast(snap_payload[n]))
    # one column order for both sides: snapshot payload, then additions
    order = list(snap_payload) + new_cols
    snap = snap.select(*order, seq_col, deleted_col)
    batch = batch.select(*order, seq_col, op_col)
    return snap, batch, bool(new_cols or missing)


class IdempotentParquetSink:
    """``foreachBatch``-callable exactly-once parquet sink.

    >>> sink = IdempotentParquetSink("/data/out", app_id="hourly-v1")
    >>> q = (stream.writeStream.foreachBatch(sink)
    ...      .option("checkpointLocation", ckpt).start())

    A replay of an already-committed ``batch_id`` (crash-recovery, or a
    restarted query reprocessing its last uncommitted epoch) leaves the
    sink byte-identical. ``committed_frame`` is the read view."""

    def __init__(self, path: str, app_id: str):
        if not app_id or "/" in app_id:
            raise ValueError("app_id must be a non-empty path-safe string")
        self.path = path.rstrip("/")
        self.app_id = app_id

    # -- txn bookkeeping ----------------------------------------------------
    def _marker_path(self, batch_id: int) -> str:
        return (f"{self.path}/{_COMMIT_DIR}/"
                f"{self.app_id}__{int(batch_id)}.json")

    def _data_path(self, batch_id: int) -> str:
        return f"{self.path}/batch_id={int(batch_id)}"

    def _fs(self, spark: SparkSession, path: str):
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(spark._jsc.hadoopConfiguration()), p

    def is_committed(self, spark: SparkSession, batch_id: int) -> bool:
        fs, p = self._fs(spark, self._marker_path(batch_id))
        return fs.exists(p)

    def commits(self, spark: SparkSession) -> "dict[int, dict]":
        """{batch_id: manifest} for every committed batch of this app."""
        fs, d = self._fs(spark, f"{self.path}/{_COMMIT_DIR}")
        if not fs.exists(d):
            return {}
        out = {}
        prefix = self.app_id + "__"
        for status in fs.listStatus(d):
            name = status.getPath().getName()
            if not (name.startswith(prefix) and name.endswith(".json")):
                continue
            stem = name[len(prefix):-len(".json")]
            if not stem.isdigit():  # stray file matching the prefix
                continue
            try:
                out[int(stem)] = json.loads(
                    _fs_read_text(spark, status.getPath().toString()))
            except ValueError as e:
                # markers are written atomically (rename), so truncated
                # JSON here means external tampering — name it clearly
                # instead of surfacing a bare json error (ADVICE r7)
                raise IOError(
                    f"corrupted commit marker {status.getPath()}: {e}"
                ) from e
        return out

    # -- the foreachBatch entry point ----------------------------------------
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if self.is_committed(spark, batch_id):
            return  # replayed epoch: the side effect already happened
        target = self._data_path(batch_id)
        # overwrite: a crashed earlier ATTEMPT of this same batch (data
        # written, marker not) is replaced wholesale by its retry
        batch_df.write.mode("overwrite").parquet(target)
        # manifest attests what LANDED (re-read, not the plan): rows +
        # order-independent xxhash64 content checksum
        written = spark.read.parquet(target)
        h = F.xxhash64(*[F.col(c) for c in written.columns]) \
            .cast("decimal(38,0)")
        row = written.agg(
            F.count(F.lit(1)).alias("rows"),
            F.coalesce(F.sum(h), F.lit(0).cast("decimal(38,0)"))
            .alias("checksum")).collect()[0]
        manifest = {"app_id": self.app_id, "batch_id": int(batch_id),
                    "rows": int(row["rows"]),
                    "checksum": str(row["checksum"])}
        # marker LAST = the commit point; temp-name + rename so a crash
        # mid-marker-write can never leave truncated JSON at the final
        # path that is_committed would trust but commits() can't parse
        # (ADVICE r7)
        from systems_spark.state import fs_write_text_atomic
        fs_write_text_atomic(spark, self._marker_path(batch_id),
                             json.dumps(manifest, sort_keys=True))

    # -- the read view --------------------------------------------------------
    def committed_frame(self, spark: SparkSession) -> "DataFrame | None":
        """Exactly the committed batches — uncommitted data directories
        (a crash between write and marker) are excluded. Returns None
        when nothing has committed yet (no schema to offer)."""
        bids = sorted(self.commits(spark))
        if not bids:
            return None
        # basePath keeps the batch_id hive key as a column even though
        # only the committed partition dirs are listed
        return (spark.read.option("basePath", self.path)
                .parquet(*[self._data_path(b) for b in bids]))


class CdcTable:
    """A mini MERGE table on plain parquet: versioned snapshots, seq-fenced
    merges, tombstones, exactly-once ``foreachBatch`` ingestion.

    The Delta/Hudi/Iceberg capability rebuilt from the repo's own
    primitives: each committed VERSION is a full snapshot directory
    (``path/version=N__app_id`` — writer-unique staging, resolved
    through the manifest) with a commit marker written last (the
    ``IdempotentParquetSink`` txn discipline), and each merge applies a
    change batch through :func:`~systems_spark.operators.cdc.merge_cdc_fenced`
    — so a replayed micro-batch is a directory-level no-op, a STALE or
    out-of-order batch is a per-key no-op (sequence fencing), and a
    delete's tombstone blocks late resurrections. Readers see only
    committed versions; ``current()`` is the live (non-tombstoned) view.

    MULTI-WRITER: the commit log is shared — any number of writers
    (each with its own ``app_id``) may merge into one table. A version
    is claimed by atomically publishing its marker (put-if-absent);
    the loser's staged data is deleted and its merge REBASES on the
    winner's snapshot and retries (bounded attempts), which is safe
    because the fenced key-level MERGE re-derives from any newer
    snapshot — Delta's optimistic concurrency, with the rebase playing
    the role of its logical conflict resolution. Idempotence stays
    per-``(app_id, batch_id)``.

    >>> table = CdcTable("/data/orders_cdc", key_cols=["k"], app_id="cdc1")
    >>> table.initialize(seed_df)               # version -1, seq 0
    >>> q = (changes.writeStream.foreachBatch(table)
    ...      .option("checkpointLocation", ckpt).start())
    >>> live = table.current(spark)

    Snapshot-per-version keeps reads trivial (one directory) at the cost
    of rewriting the snapshot per merge; at lake scale the same fenced
    merge writes only touched partitions — the fencing/tombstone/marker
    semantics are identical, which is what the tests pin down.

    ``schema_evolution="merge"`` opts into Delta-style ``mergeSchema``:
    a batch carrying NEW payload columns widens the table (standing rows
    NULL-fill), a batch MISSING payload columns NULL-fills them in its
    postimages, and a shared column changing type raises (no implicit
    casts). Default ``"strict"`` keeps the merge core's hard mismatch
    error."""

    DELETED = "_cdc_deleted"

    def __init__(self, path: str, key_cols, app_id: str,
                 seq_col: str = "seq", op_col: str = "op",
                 schema_evolution: str = "strict"):
        if not app_id or "/" in app_id:
            raise ValueError("app_id must be a non-empty path-safe string")
        if schema_evolution not in ("strict", "merge"):
            raise ValueError(
                f"schema_evolution must be 'strict' or 'merge', "
                f"got {schema_evolution!r}")
        self.path = path.rstrip("/")
        self.key_cols = ([key_cols] if isinstance(key_cols, str)
                         else list(key_cols))
        self.app_id = app_id
        self.seq_col = seq_col
        self.op_col = op_col
        self.schema_evolution = schema_evolution

    # -- version bookkeeping (marker discipline shared with the sink) -----
    # The commit log is SHARED across writers: markers are v{N}.json
    # with the writer's app_id inside the manifest, and version N is
    # claimed by atomically publishing that marker (put-if-absent via
    # fs_publish_text_exclusive) — Delta's optimistic protocol. Each
    # writer stages its data under its OWN version=N__app_id directory
    # first, so racing writers never touch each other's files; the
    # marker records which directory won, and a crashed or losing
    # attempt leaves only an unreferenced directory (invisible:
    # marker-last), swept by vacuum.
    def _marker_path(self, version: int) -> str:
        return f"{self.path}/{_COMMIT_DIR}/v{int(version)}.json"

    def _write_data_dir(self, version: int) -> str:
        return f"version={int(version)}__{self.app_id}"

    def _data_path(self, man: dict) -> str:
        return f"{self.path}/{man['data_dir']}"

    def _fs(self, spark: SparkSession, path: str):
        p = spark._jvm.org.apache.hadoop.fs.Path(path)
        return p.getFileSystem(spark._jsc.hadoopConfiguration()), p

    def versions(self, spark: SparkSession) -> "list[int]":
        fs, d = self._fs(spark, f"{self.path}/{_COMMIT_DIR}")
        if not fs.exists(d):
            return []
        out = []
        for status in fs.listStatus(d):
            name = status.getPath().getName()
            if not (name.startswith("v") and name.endswith(".json")):
                continue
            stem = name[len("v"):-len(".json")]
            try:
                out.append(int(stem))
            except ValueError:
                continue
        return sorted(out)

    def _commit(self, spark: SparkSession, df: DataFrame,
                version: int, extra: "dict | None" = None,
                prior_man: "dict | None" = None) -> None:
        """Stage this writer's data, then CAS-publish the version
        marker. Losing the race deletes the staged directory and
        raises :class:`ConcurrentCommitError` — the caller re-derives
        from the new snapshot and retries at the next version.

        Every manifest carries TWO standing maps forward from
        ``prior_man`` (the latest manifest the caller derived from):
        the ``txn`` map of each app's highest committed batch_id, and
        the compaction fence (via ``extra``). Both therefore live in
        the LATEST manifest alone — replay checks and fence reads are
        one marker read, independent of history length, and survive
        vacuum dropping the manifests that first recorded them
        (Delta's txn-checkpoint role).

        The early marker check below is not just an optimization: it
        guarantees a writer never STAGES at a version that is already
        committed — essential when the committed version is this same
        writer's (the staging dir would be the committed data dir, and
        the loser cleanup would destroy committed data). One active
        writer per app_id (the streaming-query model) makes the
        remaining check-to-publish window safe: a marker appearing in
        it can only be another app's, whose data dir is disjoint."""
        fs_, m_ = self._fs(spark, self._marker_path(version))
        if fs_.exists(m_):
            raise ConcurrentCommitError(
                f"version {version} of {self.path} is already committed")
        dir_name = self._write_data_dir(version)
        target = f"{self.path}/{dir_name}"
        df.write.mode("overwrite").parquet(target)
        written = spark.read.parquet(target)
        row = written.agg(F.count(F.lit(1)).alias("rows")).collect()[0]
        from systems_spark.state import fs_publish_text_exclusive
        txn = dict(prior_man.get("txn", {})) if prior_man else {}
        if extra and "batch_id" in extra:
            txn[self.app_id] = max(int(extra["batch_id"]),
                                   int(txn.get(self.app_id, -1)))
        manifest = {"app_id": self.app_id, "version": int(version),
                    "rows": int(row["rows"]), "data_dir": dir_name,
                    "txn": txn,
                    "committed_at_ms": _commit_stamp_ms(prior_man)}
        manifest.update(extra or {})
        if not fs_publish_text_exclusive(
                spark, self._marker_path(version),
                json.dumps(manifest, sort_keys=True)):
            fs, d = self._fs(spark, target)
            fs.delete(d, True)
            raise ConcurrentCommitError(
                f"version {version} of {self.path} was committed by a "
                f"concurrent writer")

    _COMMIT_RETRIES = 6

    def _backoff(self, attempt: int) -> None:
        """Between rebase attempts: exponential backoff with a
        per-writer deterministic phase (derived from app_id, no RNG —
        replays stay reproducible) so two contending writers
        desynchronize instead of ping-ponging each other's CAS."""
        if attempt == 0:
            return
        phase = 1.0 + (sum(self.app_id.encode()) % 97) / 150.0
        time.sleep(min(0.05 * (2 ** attempt), 0.8) * phase)

    def _manifests(self, spark: SparkSession) -> "list[dict]":
        return [json.loads(_fs_read_text(
                    spark, self._fs(spark, self._marker_path(v))[1]
                    .toString()))
                for v in self.versions(spark)]

    def _manifest_at(self, spark: SparkSession, version: int) -> dict:
        """One targeted marker read — O(log listing + 1), never a scan
        of the whole history."""
        if version not in self.versions(spark):
            raise ValueError(f"version {version} is not committed")
        return json.loads(_fs_read_text(
            spark, self._fs(spark, self._marker_path(version))[1]
            .toString()))

    def _latest_manifest(self, spark: SparkSession) -> dict:
        vs = self.versions(spark)
        if not vs:
            raise ValueError("CdcTable.initialize before reading")
        # vs[-1] exists by construction — read its marker directly
        # rather than paying _manifest_at's second directory listing
        # (this runs on every OCC attempt of every micro-batch)
        return json.loads(_fs_read_text(
            spark, self._fs(spark, self._marker_path(vs[-1]))[1]
            .toString()))

    # -- lifecycle -----------------------------------------------------------
    def initialize(self, seed: DataFrame, seq: int = 0) -> None:
        """Seed version -1 from a plain payload frame (idempotent: a
        second initialize against an initialized table is a no-op —
        including a CONCURRENT one, which loses the seed-commit race
        and defers to the winner's seed)."""
        spark = seed.sparkSession
        fs, m = self._fs(spark, self._marker_path(-1))
        if fs.exists(m):
            return
        snap = (seed.withColumn(self.seq_col, F.lit(int(seq)).cast("long"))
                .withColumn(self.DELETED, F.lit(False)))
        try:
            self._commit(spark, snap, -1)
        except ConcurrentCommitError:
            return  # another writer seeded first — same idempotent no-op

    def snapshot(self, spark: SparkSession) -> DataFrame:
        """Latest committed snapshot INCLUDING tombstones + seq column."""
        return spark.read.parquet(
            self._data_path(self._latest_manifest(spark)))

    def current(self, spark: SparkSession) -> DataFrame:
        """The live view: tombstones hidden, bookkeeping columns dropped."""
        return (self.snapshot(spark)
                .where(~F.col(self.DELETED))
                .drop(self.seq_col, self.DELETED))

    # -- the foreachBatch entry point ----------------------------------------
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from systems_spark.operators.cdc import merge_cdc_fenced

        spark = batch_df.sparkSession
        for _attempt in range(self._COMMIT_RETRIES):
            self._backoff(_attempt)
            # ONE marker read per attempt: the latest manifest carries
            # the standing txn map (each app's highest committed
            # batch_id — epochs are monotone, so ≤ means replayed; the
            # map survives vacuum, unlike the manifest that first
            # recorded the batch), the standing fence, and the data dir
            man = self._latest_manifest(spark)
            if int(batch_id) <= int(man.get("txn", {})
                                    .get(self.app_id, -1)):
                return  # replayed epoch: this batch already committed
            snap = spark.read.parquet(self._data_path(man))
            batch = batch_df
            if self.schema_evolution == "merge":
                snap, batch, _ = _evolve_schemas(
                    snap, batch, self.seq_col, self.op_col, self.DELETED)
            # the snapshot stores its applied seq under seq_col itself,
            # so both merge inputs speak one column name; the compaction
            # fence (if any) drops globally-stale changes at entry — a
            # key whose tombstone was compacted away must not resurrect
            fence = (int(man["fence_seq"]) if "fence_seq" in man
                     else None)
            merged = merge_cdc_fenced(
                snap, batch, self.key_cols,
                seq_col=self.seq_col, op_col=self.op_col,
                deleted_col=self.DELETED, min_seq=fence)
            # the standing fence rides along in every manifest so
            # vacuuming the compaction commit that introduced it can
            # never un-fence
            extra = {"batch_id": int(batch_id)}
            if fence is not None:
                extra["fence_seq"] = int(fence)
            try:
                # commit at EXACTLY base+1: the CAS then fails iff ANY
                # writer committed after the base this merge derived
                # from — a later free slot would silently drop their
                # changes (the lost-update window true OCC must close)
                self._commit(spark, merged, int(man["version"]) + 1,
                             extra=extra, prior_man=man)
                return
            except ConcurrentCommitError:
                # a concurrent writer took the version: the key-level
                # MERGE is safe to rebase — re-derive from the NEW
                # snapshot and try the next slot
                continue
        raise ConcurrentCommitError(
            f"gave up after {self._COMMIT_RETRIES} rebased attempts on "
            f"{self.path} (writer contention)")

    # -- operations ------------------------------------------------------------
    def at_version(self, spark: SparkSession, version: int) -> DataFrame:
        """Time-travel read: the committed snapshot at ``version``
        (bookkeeping columns included, like ``snapshot()``)."""
        return spark.read.parquet(
            self._data_path(self._manifest_at(spark, version)))

    def history(self, spark: SparkSession) -> "list[dict]":
        """Commit manifests, oldest first — the audit trail."""
        out = []
        for v in self.versions(spark):
            fs, p = self._fs(spark, self._marker_path(v))
            out.append(json.loads(_fs_read_text(spark, p.toString())))
        return out

    def version_at_timestamp(self, spark: SparkSession,
                             ts_ms: int) -> int:
        """The version that was CURRENT at ``ts_ms`` (epoch millis):
        the newest commit stamped at or before it. Commit stamps are
        monotone in version order by construction (wall clock bumped
        past the predecessor's stamp at publish), so the answer is
        well-defined even across writers with skewed clocks. Scans the
        retained manifests — a rare audit-time operation, bounded by
        what vacuum kept."""
        best = None
        for man in self._manifests(spark):
            if int(man.get("committed_at_ms", 0)) <= int(ts_ms):
                best = int(man["version"])
        if best is None:
            raise ValueError(
                f"no commit at or before timestamp {ts_ms} is retained")
        return best

    def at_timestamp(self, spark: SparkSession, ts_ms: int) -> DataFrame:
        """Time-travel read by TIMESTAMP (Delta's ``timestampAsOf``):
        the snapshot that was current at ``ts_ms``."""
        return self.at_version(
            spark, self.version_at_timestamp(spark, ts_ms))

    def restore(self, spark: SparkSession, version: int) -> int:
        """RESTORE TABLE TO VERSION: commit the OLD version's content
        as a NEW version (nothing is rewound — the log stays append-
        only, so time travel across the restore is intact and a
        concurrent reader never sees history mutate). The standing
        fence and txn map carry forward from the LATEST manifest, not
        the restored one: replay protection and compaction fencing
        must never regress through a restore. Returns the new
        version."""
        for _attempt in range(self._COMMIT_RETRIES):
            self._backoff(_attempt)
            man = self._latest_manifest(spark)
            old = self.at_version(spark, version)
            extra = {"restore_of": int(version)}
            if "fence_seq" in man:
                extra["fence_seq"] = int(man["fence_seq"])
            try:
                self._commit(spark, old, int(man["version"]) + 1,
                             extra=extra, prior_man=man)
                return int(man["version"]) + 1
            except ConcurrentCommitError:
                continue
        raise ConcurrentCommitError(
            f"restore gave up after {self._COMMIT_RETRIES} attempts on "
            f"{self.path}")

    def changes_between(self, spark: SparkSession, v_from: int,
                        v_to: int) -> DataFrame:
        """The CHANGE DATA FEED between two committed versions (Delta's
        CDF read): the net row-level changes a downstream consumer must
        apply to move a replica from ``v_from`` to ``v_to`` — payload +
        ``seq_col`` + ``_change_type`` ∈ insert/update/delete.
        Inserts/updates carry the POSTIMAGE (v_to row + its seq);
        deletes carry the PREIMAGE (v_from row + its seq). A key
        deleted-then-reinserted across the window nets to one update; a
        key whose seq never moved emits nothing.

        Plan: two snapshot reads + one NULL-safe full key join — no
        replay of the intervening merges, so the feed between any two
        versions costs the same regardless of how many epochs separate
        them. Works on the partitioned table too (only needs
        ``at_version``)."""
        a = self.at_version(spark, v_from)
        b = self.at_version(spark, v_to)
        # the window may span a schema evolution: align both endpoints
        # to the UNION payload (columns absent at an endpoint NULL-fill,
        # exactly how that endpoint's reader would see them today)
        payload = [c for c in a.columns
                   if c not in (self.seq_col, self.DELETED)]
        for c in [c for c in b.columns if c not in a.columns
                  and c not in (self.seq_col, self.DELETED)]:
            a = a.withColumn(c, F.lit(None).cast(b.schema[c].dataType))
            payload.append(c)
        for c in [c for c in payload if c not in b.columns]:
            b = b.withColumn(c, F.lit(None).cast(a.schema[c].dataType))
        la = (a.where(~F.col(self.DELETED)).drop(self.DELETED)
              .withColumn("_cdf_pa", F.lit(1)))
        lb = (b.where(~F.col(self.DELETED)).drop(self.DELETED)
              .withColumn("_cdf_pb", F.lit(1)))
        A, B = la.alias("A"), lb.alias("B")
        cond = [F.col(f"A.{k}").eqNullSafe(F.col(f"B.{k}"))
                for k in self.key_cols]
        j = A.join(B, on=cond, how="full")
        post = [F.col(f"B.{c}").alias(c)
                for c in payload + [self.seq_col]]
        pre = [F.col(f"A.{c}").alias(c)
               for c in payload + [self.seq_col]]
        ins = (j.where(F.col("A._cdf_pa").isNull())
               .select(*post, F.lit("insert").alias("_change_type")))
        upd = (j.where(F.col("A._cdf_pa").isNotNull()
                       & F.col("B._cdf_pb").isNotNull()
                       & (F.col(f"A.{self.seq_col}")
                          != F.col(f"B.{self.seq_col}")))
               .select(*post, F.lit("update").alias("_change_type")))
        dele = (j.where(F.col("B._cdf_pb").isNull())
                .select(*pre, F.lit("delete").alias("_change_type")))
        return ins.unionByName(upd).unionByName(dele)

    def fence(self, spark: SparkSession) -> "int | None":
        """The standing compaction fence: the highest ``fence_seq`` any
        :meth:`compact` committed, or None. Changes with seq ≤ fence are
        globally stale by the compaction caller's guarantee and are
        dropped at merge entry.

        One marker read: every committer carries the standing fence
        forward into its manifest (merge, compact, optimize, on both
        layouts), so the LATEST manifest holds the max — the read cost
        is independent of history length and survives vacuum."""
        vs = self.versions(spark)
        if not vs:
            return None
        man = self._manifest_at(spark, vs[-1])
        return int(man["fence_seq"]) if "fence_seq" in man else None

    def compact(self, spark: SparkSession, fence_seq: int) -> int:
        """Drop tombstones with seq ≤ ``fence_seq`` from the live
        snapshot, committing the result as a new version (time travel
        across the boundary stays intact — older versions are
        untouched). ``fence_seq`` is the caller's GUARANTEE that no
        change with seq ≤ fence_seq can still arrive; the fence
        persists in the commit manifest and every later merge drops
        such changes at entry, so a compacted-away tombstone's key can
        never be resurrected by a late pre-fence replay — the
        tombstones' fencing duty transfers to the table-level fence.
        Without this, a daily 100 TB MERGE table accumulates one
        tombstone per deleted key forever. Fences never regress
        (max-of-manifests); returns the new version number."""
        for _attempt in range(self._COMMIT_RETRIES):
            self._backoff(_attempt)
            man = self._latest_manifest(spark)
            prev = (int(man["fence_seq"]) if "fence_seq" in man
                    else None)
            fence = max(int(fence_seq), prev) if prev is not None \
                else int(fence_seq)
            snap = spark.read.parquet(self._data_path(man))
            compacted = snap.where(~(F.col(self.DELETED)
                                     & (F.col(self.seq_col) <= fence)))
            version = int(man["version"]) + 1
            try:
                self._commit(spark, compacted, version,
                             extra={"compaction": True,
                                    "fence_seq": fence},
                             prior_man=man)
                return version
            except ConcurrentCommitError:
                continue  # rebase on the interleaved commit
        raise ConcurrentCommitError(
            f"compact gave up after {self._COMMIT_RETRIES} attempts on "
            f"{self.path}")

    def data_path(self, spark: SparkSession) -> str:
        """Directory of the LATEST committed snapshot — the standing
        location a :class:`~systems_spark.operators.zorder.StatsIndex`
        keys on. Every commit moves it (new version dir), so the stats
        fingerprint can never serve a stale layout."""
        vs = self.versions(spark)
        if not vs:
            raise ValueError("CdcTable.initialize before reading")
        return self._data_path(self._manifest_at(spark, vs[-1]))

    def optimize(self, spark: SparkSession, zorder_cols, ranges,
                 bits: int = 16, partitions: "int | None" = None) -> int:
        """OPTIMIZE ZORDER BY — rewrite the live snapshot along the
        Morton curve (:func:`~systems_spark.operators.zorder
        .zorder_layout`) and commit it as a new, content-identical
        version: rows, tombstones, and seqs are untouched payload; only
        the file layout changes, so every later :meth:`data_path` +
        ``StatsIndex`` read prunes on ANY of the z-ordered columns.
        Time travel across the boundary stays intact (older versions
        untouched), the standing compaction fence rides in the manifest
        (vacuum-proof, like every merge), and a crashed optimize is
        invisible (marker-last). Returns the new version number."""
        from systems_spark.operators.zorder import zorder_layout

        for _attempt in range(self._COMMIT_RETRIES):
            self._backoff(_attempt)
            man = self._latest_manifest(spark)
            snap = spark.read.parquet(self._data_path(man))
            laid = zorder_layout(snap, zorder_cols, ranges, bits=bits,
                                 partitions=partitions).drop("_zorder")
            extra = {"optimize": True,
                     "zorder": [str(c) for c in zorder_cols]}
            if "fence_seq" in man:
                extra["fence_seq"] = int(man["fence_seq"])
            version = int(man["version"]) + 1
            try:
                self._commit(spark, laid, version, extra=extra,
                             prior_man=man)
                return version
            except ConcurrentCommitError:
                continue  # relayout the NEW snapshot
        raise ConcurrentCommitError(
            f"optimize gave up after {self._COMMIT_RETRIES} attempts on "
            f"{self.path}")

    def vacuum(self, spark: SparkSession, keep_last: int = 2,
               older_than_ms: "int | None" = None) -> "list[int]":
        """Drop all but the newest ``keep_last`` committed versions —
        the disk-growth control for snapshot-per-version layouts. Markers
        are deleted FIRST so a concurrent reader never resolves a
        committed-but-vanishing version; the latest version is never
        eligible. ``older_than_ms`` adds the time-retention guard every
        production vacuum runs with: a version is dropped only if it is
        ALSO older than the cutoff (epoch millis against the manifest's
        monotone commit stamp), so "keep 2, but nothing younger than 7
        days" composes the two rules. Returns the dropped version
        numbers. (Tombstone removal is :meth:`compact` — it requires
        the caller's no-older-changes fence; vacuum alone never prunes
        tombstones.)"""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        vs = self.versions(spark)
        mans = {m["version"]: m for m in self._manifests(spark)}
        drop = vs[:-keep_last] if keep_last < len(vs) else []
        if older_than_ms is not None:
            drop = [v for v in drop
                    if int(mans[v].get("committed_at_ms", 0))
                    < int(older_than_ms)]
        for v in drop:
            fs, m = self._fs(spark, self._marker_path(v))
            fs.delete(m, False)
            _, d = self._fs(spark, self._data_path(mans[v]))
            fs.delete(d, True)
        # sweep loser/crashed attempts: any version=* directory no kept
        # manifest references is an unpublished staging dir (marker-last
        # made it invisible to every reader). Same caveat as every
        # format's vacuum: don't run concurrently with an IN-FLIGHT
        # writer, whose staging dir is indistinguishable from a dead one
        kept_dirs = {mans[v]["data_dir"] for v in vs if v not in drop}
        fs, root = self._fs(spark, self.path)
        for status in fs.listStatus(root):
            name = status.getPath().getName()
            if name.startswith("version=") and name not in kept_dirs:
                fs.delete(status.getPath(), True)
        return drop


class PartitionedCdcTable(CdcTable):
    """Bucket-partitioned CDC MERGE table — the LAKE-SCALE layout: the
    snapshot lives as hash buckets of the merge key, each commit's
    manifest records the full bucket → writer-version mapping (a mini
    transaction log), and a merge REWRITES ONLY THE BUCKETS ITS BATCH
    TOUCHES. Untouched buckets are neither rescanned (the merge reads
    only the touched buckets' directories — path-level partition
    pruning) nor rewritten (their mapping entries carry forward), so
    per-epoch cost is touched-bucket volume, not table size — the
    claim ``CdcTable``'s snapshot-per-version docstring defers to at
    fact scale, made real.

    Semantics are inherited wholesale: the same ``merge_cdc_fenced``
    core (seq fencing, tombstones, NULL-safe keys), marker-last commit
    discipline, manifest-recorded ``batch_id`` idempotence, compaction
    under a vacuum-proof persistent fence.

    Layout: ``path/version=V/_cdc_bucket=B/part-*.parquet``; manifest
    ``{"buckets": {"B": writer_version, ...}, "schema": <json>}``. A
    bucket emptied by compaction simply leaves the mapping. Bucket
    count is fixed at table creation — the key-hash must stay stable
    across the table's life (re-bucketing is a full rewrite, as
    everywhere).

    ``write_mode="merge_on_read"`` (Hudi MOR / Delta deletion-vector
    role): a change batch commits as a DELTA LOG ENTRY — one
    ``delta=V__app`` directory holding just the batch, the manifest's
    ``pending`` list grown by one — in O(batch) I/O regardless of how
    many buckets its keys scatter across (a wide-scattered delete of
    1000 keys writes kilobytes, not every touched bucket). Readers
    fold the pending deltas through the SAME fenced merge the write
    path would have run (order-independent: last-op-wins by seq, the
    property the out-of-order-batches test pins) — one window + one
    join regardless of how many deltas are pending.
    :meth:`compact_deltas` folds them back into only the buckets they
    touch and clears the list — the read-amplification knob. Default
    ``"copy_on_write"`` keeps the rewrite-touched-buckets behavior."""

    def __init__(self, path: str, key_cols, app_id: str,
                 num_buckets: int = 16,
                 seq_col: str = "seq", op_col: str = "op",
                 schema_evolution: str = "strict",
                 write_mode: str = "copy_on_write"):
        super().__init__(path, key_cols, app_id,
                         seq_col=seq_col, op_col=op_col,
                         schema_evolution=schema_evolution)
        if num_buckets < 1:
            raise ValueError("num_buckets must be >= 1")
        if write_mode not in ("copy_on_write", "merge_on_read"):
            raise ValueError(
                f"write_mode must be 'copy_on_write' or "
                f"'merge_on_read', got {write_mode!r}")
        self.num_buckets = int(num_buckets)
        self.write_mode = write_mode

    BUCKET = "_cdc_bucket"

    def _bucket_expr(self):
        return F.pmod(F.xxhash64(*[F.col(k) for k in self.key_cols]),
                      F.lit(self.num_buckets)).cast("int")

    # -- table configuration lives in the LOG, not the constructor ---------
    def _table_conf(self) -> dict:
        return {"num_buckets": self.num_buckets,
                "key_cols": list(self.key_cols),
                "seq_col": self.seq_col, "op_col": self.op_col}

    def _check_conf(self, man: dict) -> None:
        """A handle whose bucketing/key configuration disagrees with
        the manifest's would compute the WRONG touched buckets and
        corrupt merges silently — the worst failure mode a table can
        have. The manifest is the source of truth; a mismatched handle
        raises before it can write anything."""
        conf = man.get("table_conf")
        if conf is not None and conf != self._table_conf():
            raise ValueError(
                f"table at {self.path} is configured {conf}; this "
                f"handle was constructed with {self._table_conf()} — "
                f"reopen with the table's configuration (rebucket() "
                f"changes it)")

    # -- manifest/mapping helpers ------------------------------------------
    def _mapping(self, man: dict) -> "dict[int, int]":
        return {int(b): int(v) for b, v in man.get("buckets", {}).items()}

    def _bucket_paths(self, man: dict, buckets) -> list:
        # the manifest's "dirs" map resolves every writer version its
        # bucket mapping references to that version's winning data
        # directory (carried forward commit-to-commit, pruned to the
        # referenced set) — no other manifest needs reading
        mapping = self._mapping(man)
        dirs = man.get("dirs", {})
        return [f"{self.path}/{dirs[str(mapping[b])]}/{self.BUCKET}={b}"
                for b in sorted(buckets) if b in mapping]

    def _empty_like(self, spark: SparkSession, man: dict) -> DataFrame:
        from pyspark.sql.types import StructType
        schema = StructType.fromJson(json.loads(man["schema"]))
        return spark.createDataFrame([], schema)

    def _read_buckets(self, spark: SparkSession, man: dict,
                      buckets) -> DataFrame:
        paths = self._bucket_paths(man, buckets)
        if not paths:
            return self._empty_like(spark, man)
        # schema comes from the MANIFEST (the transaction log), not from
        # file footers: after a schema evolution, untouched buckets'
        # files lack the new columns and the reader must NULL-fill them
        # by name — exactly what an explicit read schema does, with no
        # mergeSchema footer sweep
        from pyspark.sql.types import StructType
        schema = StructType.fromJson(json.loads(man["schema"]))
        return spark.read.schema(schema).parquet(*paths)

    # -- merge-on-read: delta log entries + reader-side fold ---------------
    def _change_schema(self, man: dict):
        """The change-batch schema a delta dir is read with: the
        manifest snapshot schema minus the tombstone flag, plus the op
        column — explicit so old delta files NULL-fill columns a later
        schema evolution added, by name, like the buckets do."""
        from pyspark.sql.types import StringType, StructField, StructType
        snap = StructType.fromJson(json.loads(man["schema"]))
        fields = [f for f in snap.fields if f.name != self.DELETED]
        fields.append(StructField(self.op_col, StringType(), True))
        return StructType(fields)

    def _materialize_view(self, spark: SparkSession, man: dict) -> DataFrame:
        """The snapshot AT ``man``: bucket files folded with the
        manifest's pending deltas through the same fenced merge the
        write path would have run — one batch window + one key join
        regardless of how many deltas are pending (last-op-wins by seq
        makes the union order-independent)."""
        from systems_spark.operators.cdc import merge_cdc_fenced

        base = self._read_buckets(spark, man, self._mapping(man))
        pend = man.get("pending", [])
        if not pend:
            return base
        changes = spark.read.schema(self._change_schema(man)).parquet(
            *[f"{self.path}/{d}" for d in pend])
        fence = int(man["fence_seq"]) if "fence_seq" in man else None
        return merge_cdc_fenced(
            base, changes, self.key_cols, seq_col=self.seq_col,
            op_col=self.op_col, deleted_col=self.DELETED, min_seq=fence)

    def _conform_strict_batch(self, man: dict,
                              batch: DataFrame) -> DataFrame:
        """Strict-mode write-time validation for a merge-on-read delta:
        column NAMES must match the change schema exactly; a column's
        type must equal the table's or widen LOSSLESSLY into it
        (int→long, float→double — the same coercion the copy-on-write
        merge core applies), and the batch is cast to the canonical
        types so staged files never depend on read-time upcasts.
        Anything else raises here, at the write, not at every later
        read."""
        expected = {f.name: f.dataType
                    for f in self._change_schema(man).fields}
        got = {f.name: f.dataType for f in batch.schema.fields}
        if set(expected) != set(got):
            raise ValueError(
                f"merge-on-read strict mode: change batch schema "
                f"mismatch — missing "
                f"{sorted(set(expected) - set(got))}, unexpected "
                f"{sorted(set(got) - set(expected))} "
                f"(schema_evolution='merge' opts into widening)")
        from pyspark.sql.types import (ByteType, DoubleType, FloatType,
                                       IntegerType, LongType, ShortType)
        ints = (ByteType, ShortType, IntegerType, LongType)

        def widens(src, dst):
            if src == dst:
                return True
            if isinstance(src, ints) and isinstance(dst, ints):
                return ints.index(type(src)) <= ints.index(type(dst))
            # int→float/double and long→double lose precision in the
            # tail — only the genuinely lossless float widening passes
            return isinstance(src, FloatType) \
                and isinstance(dst, DoubleType)

        bad = [(n, str(got[n]), str(expected[n])) for n in expected
               if not widens(got[n], expected[n])]
        if bad:
            raise ValueError(
                f"merge-on-read strict mode: change batch column type "
                f"cannot losslessly widen to the table's: {bad}")
        return batch.select(*[F.col(n).cast(expected[n]).alias(n)
                              for n in (f.name for f in
                                        self._change_schema(man).fields)])

    def _commit_delta(self, spark: SparkSession, batch: DataFrame,
                      version: int, prior_man: dict, schema_json: str,
                      extra: "dict | None" = None) -> None:
        """The merge-on-read commit: stage ONLY the change batch under
        ``delta=V__app``, grow the manifest's pending list — bucket
        mapping and dirs carry forward untouched. O(batch) I/O."""
        self._check_conf(prior_man)
        fs_, m_ = self._fs(spark, self._marker_path(version))
        if fs_.exists(m_):
            raise ConcurrentCommitError(
                f"version {version} of {self.path} is already committed")
        dir_name = f"delta={int(version)}__{self.app_id}"
        target = f"{self.path}/{dir_name}"
        batch.write.mode("overwrite").parquet(target)
        rows = spark.read.parquet(target).count()
        txn = dict(prior_man.get("txn", {}))
        if extra and "batch_id" in extra:
            txn[self.app_id] = max(int(extra["batch_id"]),
                                   int(txn.get(self.app_id, -1)))
        manifest = {"app_id": self.app_id, "version": int(version),
                    "rows": int(rows),
                    "buckets": dict(prior_man.get("buckets", {})),
                    "dirs": dict(prior_man.get("dirs", {})),
                    "pending": list(prior_man.get("pending", []))
                    + [dir_name],
                    "txn": txn,
                    "committed_at_ms": _commit_stamp_ms(prior_man),
                    "table_conf": self._table_conf(),
                    "schema": schema_json}
        manifest.update(extra or {})
        from systems_spark.state import fs_publish_text_exclusive
        if not fs_publish_text_exclusive(
                spark, self._marker_path(version),
                json.dumps(manifest, sort_keys=True)):
            fs, d = self._fs(spark, target)
            fs.delete(d, True)
            raise ConcurrentCommitError(
                f"version {version} of {self.path} was committed by a "
                f"concurrent writer")

    def compact_deltas(self, spark: SparkSession) -> int:
        """Fold every pending delta into the buckets it touches and
        clear the pending list — the merge-on-read read-amplification
        knob. Only dirty buckets rewrite; rows in untouched buckets
        are neither read nor written. Returns the committed version
        (or the current one if nothing was pending)."""
        from systems_spark.operators.cdc import merge_cdc_fenced

        for _attempt in range(self._COMMIT_RETRIES):
            self._backoff(_attempt)
            man = self._latest_manifest(spark)
            pend = man.get("pending", [])
            if not pend:
                return int(man["version"])
            changes = spark.read.schema(self._change_schema(man)).parquet(
                *[f"{self.path}/{d}" for d in pend])
            fence = int(man["fence_seq"]) if "fence_seq" in man else None
            dirty = sorted(
                int(r[0]) for r in changes.select(self._bucket_expr())
                .distinct().collect())
            base_dirty = self._read_buckets(spark, man, dirty)
            folded = merge_cdc_fenced(
                base_dirty, changes, self.key_cols,
                seq_col=self.seq_col, op_col=self.op_col,
                deleted_col=self.DELETED, min_seq=fence)
            version = int(man["version"]) + 1
            extra = {"delta_compaction": True}
            if fence is not None:
                extra["fence_seq"] = fence
            try:
                self._commit_version(
                    spark,
                    folded.withColumn(self.BUCKET, self._bucket_expr()),
                    version, man, dirty, man["schema"], extra,
                    pending_override=[])
                return version
            except ConcurrentCommitError:
                continue
        raise ConcurrentCommitError(
            f"compact_deltas gave up after {self._COMMIT_RETRIES} "
            f"attempts on {self.path}")

    def _commit_version(self, spark: SparkSession, df: "DataFrame | None",
                        version: int, prior_man: "dict | None",
                        touched, schema_json: str,
                        extra: "dict | None" = None,
                        pending_override: "list | None" = None,
                        allow_conf_change: bool = False) -> None:
        """Stage the touched buckets (df pre-bucketed) under this
        writer's own directory, then CAS-publish the version marker;
        the manifest's mapping carries untouched entries forward and
        points touched buckets that survived at the new directory,
        and its ``dirs`` map resolves every referenced writer version.
        ``df=None`` commits manifest-only (no data dir). Losing the
        marker race deletes the staged directory and raises
        :class:`ConcurrentCommitError`. The early marker check keeps a
        writer from ever staging over its own committed data (see
        CdcTable._commit)."""
        if prior_man is not None and not allow_conf_change:
            self._check_conf(prior_man)
        fs_, m_ = self._fs(spark, self._marker_path(version))
        if fs_.exists(m_):
            raise ConcurrentCommitError(
                f"version {version} of {self.path} is already committed")
        prior = self._mapping(prior_man) if prior_man else {}
        prior_dirs = dict(prior_man.get("dirs", {})) if prior_man else {}
        written = set()
        dir_name = self._write_data_dir(version)
        target = f"{self.path}/{dir_name}"
        if df is not None:
            df.write.partitionBy(self.BUCKET).mode("overwrite") \
                .parquet(target)
            back = spark.read.parquet(target)
            written = {int(r[0]) for r in
                       back.select(self.BUCKET).distinct().collect()}
            rows = back.count()
        else:
            rows = 0
        mapping = {b: v for b, v in prior.items() if b not in set(touched)}
        mapping.update({b: int(version) for b in written})
        dirs = {str(v): prior_dirs[str(v)]
                for v in sorted(set(mapping.values()))
                if str(v) in prior_dirs}
        if written:
            dirs[str(int(version))] = dir_name
        txn = dict(prior_man.get("txn", {})) if prior_man else {}
        if extra and "batch_id" in extra:
            txn[self.app_id] = max(int(extra["batch_id"]),
                                   int(txn.get(self.app_id, -1)))
        pending = (list(pending_override) if pending_override is not None
                   else list(prior_man.get("pending", []))
                   if prior_man else [])
        manifest = {"app_id": self.app_id, "version": int(version),
                    "rows": int(rows),
                    "buckets": {str(b): v for b, v in
                                sorted(mapping.items())},
                    "dirs": dirs,
                    "pending": pending,
                    "txn": txn,
                    "committed_at_ms": _commit_stamp_ms(prior_man),
                    "table_conf": self._table_conf(),
                    "schema": schema_json}
        manifest.update(extra or {})
        from systems_spark.state import fs_publish_text_exclusive
        if not fs_publish_text_exclusive(
                spark, self._marker_path(version),
                json.dumps(manifest, sort_keys=True)):
            if df is not None:
                fs, d = self._fs(spark, target)
                fs.delete(d, True)
            raise ConcurrentCommitError(
                f"version {version} of {self.path} was committed by a "
                f"concurrent writer")

    # -- lifecycle -----------------------------------------------------------
    def initialize(self, seed: DataFrame, seq: int = 0) -> None:
        spark = seed.sparkSession
        fs, m = self._fs(spark, self._marker_path(-1))
        if fs.exists(m):
            return
        snap = (seed.withColumn(self.seq_col, F.lit(int(seq)).cast("long"))
                .withColumn(self.DELETED, F.lit(False)))
        schema_json = json.dumps(snap.schema.jsonValue())
        try:
            self._commit_version(
                spark, snap.withColumn(self.BUCKET, self._bucket_expr()),
                -1, None, touched=(), schema_json=schema_json)
        except ConcurrentCommitError:
            return  # another writer seeded first — same idempotent no-op

    def snapshot(self, spark: SparkSession) -> DataFrame:
        return self._materialize_view(spark,
                                      self._latest_manifest(spark))

    def at_version(self, spark: SparkSession, version: int) -> DataFrame:
        return self._materialize_view(
            spark, self._manifest_at(spark, version))

    # -- the foreachBatch entry point ----------------------------------------
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from systems_spark.operators.cdc import merge_cdc_fenced

        spark = batch_df.sparkSession
        for _attempt in range(self._COMMIT_RETRIES):
            self._backoff(_attempt)
            man = self._latest_manifest(spark)  # ONE marker read
            if int(batch_id) <= int(man.get("txn", {})
                                    .get(self.app_id, -1)):
                return  # replayed epoch
            fence = (int(man["fence_seq"]) if "fence_seq" in man
                     else None)
            extra = {"batch_id": int(batch_id)}
            batch = batch_df
            if fence is not None:
                extra["fence_seq"] = int(fence)
                batch = batch.where(F.col(self.seq_col) > int(fence))
            version = int(man["version"]) + 1  # exactly base+1: OCC
            if self.write_mode == "merge_on_read":
                # O(batch) commit: stage the batch as a delta log
                # entry; buckets untouched, readers fold at read time
                schema_json = man["schema"]
                if self.schema_evolution == "merge":
                    empty = self._empty_like(spark, man)
                    evolved_empty, batch, evolved = _evolve_schemas(
                        empty, batch, self.seq_col, self.op_col,
                        self.DELETED)
                    if evolved:
                        schema_json = json.dumps(
                            evolved_empty.schema.jsonValue())
                else:
                    # strict mode must reject a malformed batch AT THE
                    # WRITE, exactly like the copy-on-write path does
                    # via the merge core — a verbatim-staged bad batch
                    # would otherwise wedge every later read, and an
                    # extra column would be silently dropped by the
                    # manifest-schema read
                    batch = self._conform_strict_batch(man, batch)
                try:
                    self._commit_delta(spark, batch, version, man,
                                       schema_json, extra)
                    return
                except ConcurrentCommitError:
                    continue
            # the touched-bucket set is ≤ num_buckets — a bounded
            # collect, the partition-pruning decision every format makes
            touched = sorted(
                int(r[0]) for r in batch.select(self._bucket_expr())
                .distinct().collect())
            try:
                if not touched:
                    self._commit_version(spark, None, version, man, (),
                                         man["schema"], extra)
                    return
                snap_touched = self._read_buckets(spark, man, touched)
                schema_json = man["schema"]
                if self.schema_evolution == "merge":
                    snap_touched, batch, evolved = _evolve_schemas(
                        snap_touched, batch, self.seq_col, self.op_col,
                        self.DELETED)
                    if evolved:
                        # the evolved schema becomes the log's truth;
                        # untouched buckets' old files NULL-fill the new
                        # columns at read
                        schema_json = json.dumps(
                            snap_touched.schema.jsonValue())
                merged = merge_cdc_fenced(
                    snap_touched, batch, self.key_cols,
                    seq_col=self.seq_col, op_col=self.op_col,
                    deleted_col=self.DELETED)
                self._commit_version(
                    spark,
                    merged.withColumn(self.BUCKET, self._bucket_expr()),
                    version, man, touched, schema_json, extra)
                return
            except ConcurrentCommitError:
                continue  # rebase on the interleaved commit
        raise ConcurrentCommitError(
            f"gave up after {self._COMMIT_RETRIES} rebased attempts on "
            f"{self.path} (writer contention)")

    # -- operations ------------------------------------------------------------
    def compact(self, spark: SparkSession, fence_seq: int) -> int:
        for _attempt in range(self._COMMIT_RETRIES):
            self._backoff(_attempt)
            man = self._latest_manifest(spark)
            if man.get("pending"):
                # tombstones may live only in pending deltas: fold them
                # into buckets first so the covered-scan sees them all
                self.compact_deltas(spark)
                man = self._latest_manifest(spark)
            prev = (int(man["fence_seq"]) if "fence_seq" in man
                    else None)
            fence = max(int(fence_seq), prev) if prev is not None \
                else int(fence_seq)
            covered = F.col(self.DELETED) & (F.col(self.seq_col) <= fence)
            # only buckets actually holding coverable tombstones rewrite
            dirty = sorted(
                int(r[0]) for r in
                self._read_buckets(spark, man, self._mapping(man))
                .where(covered)
                .select(self._bucket_expr()).distinct().collect())
            version = int(man["version"]) + 1
            extra = {"compaction": True, "fence_seq": fence}
            try:
                if not dirty:
                    self._commit_version(spark, None, version, man, (),
                                         man["schema"], extra)
                    return version
                kept = self._read_buckets(spark, man, dirty) \
                    .where(~covered)
                self._commit_version(
                    spark, kept.withColumn(self.BUCKET,
                                           self._bucket_expr()),
                    version, man, dirty, man["schema"], extra)
                return version
            except ConcurrentCommitError:
                continue
        raise ConcurrentCommitError(
            f"compact gave up after {self._COMMIT_RETRIES} attempts on "
            f"{self.path}")

    def rebucket(self, spark: SparkSession,
                 new_num_buckets: int) -> int:
        """Change the bucket count — a FULL REWRITE by necessity (the
        key-hash layout is the merge-pruning contract), committed as
        one new version: the folded snapshot re-hashes into the new
        buckets, pending deltas materialize, and the manifest's
        ``table_conf`` flips so every handle still constructed with
        the old count fails loudly instead of merging into the wrong
        buckets. This handle adopts the new count on success."""
        if int(new_num_buckets) < 1:
            raise ValueError("num_buckets must be >= 1")
        for _attempt in range(self._COMMIT_RETRIES):
            self._backoff(_attempt)
            man = self._latest_manifest(spark)
            self._check_conf(man)  # only a conforming handle may flip
            old = self._materialize_view(spark, man)
            prev_n = self.num_buckets
            extra = {"rebucket_from": prev_n}
            if "fence_seq" in man:
                extra["fence_seq"] = int(man["fence_seq"])
            self.num_buckets = int(new_num_buckets)
            try:
                self._commit_version(
                    spark, old.withColumn(self.BUCKET,
                                          self._bucket_expr()),
                    int(man["version"]) + 1, man,
                    touched=set(self._mapping(man)),
                    schema_json=man["schema"], extra=extra,
                    pending_override=[], allow_conf_change=True)
                return int(man["version"]) + 1
            except ConcurrentCommitError:
                self.num_buckets = prev_n
                continue
            except Exception:
                self.num_buckets = prev_n
                raise
        raise ConcurrentCommitError(
            f"rebucket gave up after {self._COMMIT_RETRIES} attempts "
            f"on {self.path}")

    def restore(self, spark: SparkSession, version: int) -> int:
        """RESTORE TO VERSION, bucket-shaped: the restored content
        (and its manifest SCHEMA — restoring past a schema evolution
        restores the old schema, like Delta) commits as a new version
        superseding every prior bucket; fence and txn map carry
        forward from the LATEST manifest so protection never regresses
        through a restore."""
        for _attempt in range(self._COMMIT_RETRIES):
            self._backoff(_attempt)
            man = self._latest_manifest(spark)
            old_man = self._manifest_at(spark, version)
            old = self._materialize_view(spark, old_man)
            extra = {"restore_of": int(version)}
            if "fence_seq" in man:
                extra["fence_seq"] = int(man["fence_seq"])
            try:
                self._commit_version(
                    spark, old.withColumn(self.BUCKET,
                                          self._bucket_expr()),
                    int(man["version"]) + 1, man,
                    touched=set(self._mapping(man)),
                    schema_json=old_man["schema"], extra=extra,
                    pending_override=[])
                return int(man["version"]) + 1
            except ConcurrentCommitError:
                continue
        raise ConcurrentCommitError(
            f"restore gave up after {self._COMMIT_RETRIES} attempts on "
            f"{self.path}")

    def data_path(self, spark: SparkSession) -> str:
        """Not a single directory here: buckets of the live snapshot may
        live under SEVERAL writer versions. Use :meth:`bucket_paths` for
        stats indexing instead."""
        raise NotImplementedError(
            "PartitionedCdcTable snapshots span writer versions; index "
            "per-bucket via bucket_paths()")

    def bucket_paths(self, spark: SparkSession) -> "list[str]":
        """The live snapshot's bucket directories (one per mapped
        bucket, each under its writer version) — the unit a
        ``StatsIndex`` indexes: a merge moves only its touched buckets'
        paths, so untouched buckets keep their committed stats."""
        man = self._latest_manifest(spark)
        if man.get("pending"):
            raise ValueError(
                "snapshot has pending merge-on-read deltas — "
                "compact_deltas() before stats-indexing bucket files")
        return self._bucket_paths(man, self._mapping(man))

    def optimize(self, spark: SparkSession, zorder_cols, ranges,
                 bits: int = 16, partitions: "int | None" = None) -> int:
        """OPTIMIZE ZORDER BY, bucket-respecting: every mapped bucket
        rewrites with its rows laid out along the Morton curve WITHIN
        the bucket (the bucket hash keyed on the merge key must stay
        the outer layout — merges prune on it), so in-bucket file
        min/max stats prune scans on any z-ordered column while merge
        cost stays touched-bucket-proportional. One range exchange on
        (bucket, z); content-identical; fence rides along."""
        from systems_spark.operators.zorder import z_value

        for _attempt in range(self._COMMIT_RETRIES):
            self._backoff(_attempt)
            man = self._latest_manifest(spark)
            prior = self._mapping(man)
            snap = self._read_buckets(spark, man, prior)
            z = z_value(zorder_cols, ranges, bits)
            laid = (snap.withColumn(self.BUCKET, self._bucket_expr())
                    .withColumn("_cdc_z", z))
            parts = [F.col(self.BUCKET), F.col("_cdc_z")]
            laid = (laid.repartitionByRange(partitions, *parts)
                    if partitions else laid.repartitionByRange(*parts))
            laid = laid.sortWithinPartitions(self.BUCKET, "_cdc_z") \
                .drop("_cdc_z")
            extra = {"optimize": True,
                     "zorder": [str(c) for c in zorder_cols]}
            if "fence_seq" in man:
                extra["fence_seq"] = int(man["fence_seq"])
            version = int(man["version"]) + 1
            try:
                self._commit_version(spark, laid, version, man,
                                     touched=set(prior),
                                     schema_json=man["schema"],
                                     extra=extra)
                return version
            except ConcurrentCommitError:
                continue  # relayout the NEW snapshot
        raise ConcurrentCommitError(
            f"optimize gave up after {self._COMMIT_RETRIES} attempts on "
            f"{self.path}")

    def vacuum(self, spark: SparkSession, keep_last: int = 2,
               older_than_ms: "int | None" = None) -> "list[int]":
        """Retain the newest ``keep_last`` manifests (they stay
        time-travelable); older manifests are dropped, and a version's
        DATA directory is dropped only once no kept manifest's bucket
        mapping references it — a bucket directory stays on disk as
        long as any retained snapshot still reads it (the
        transaction-log retention rule). ``older_than_ms`` adds the
        time-retention guard (see the flat table's vacuum). Returns
        the versions whose data was deleted."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        vs = self.versions(spark)
        keep = set(vs[-keep_last:]) if keep_last < len(vs) else set(vs)
        mans = {m["version"]: m for m in self._manifests(spark)}
        if older_than_ms is not None:
            keep |= {v for v in vs
                     if int(mans[v].get("committed_at_ms", 0))
                     >= int(older_than_ms)}
        referenced = set()
        for v in keep:
            referenced.update(mans[v].get("dirs", {}).values())
            referenced.update(mans[v].get("pending", []))
        for v in vs:
            if v not in keep:
                fs, m = self._fs(spark, self._marker_path(v))
                fs.delete(m, False)
        # sweep data dirs from DISK, not the marker list: a writer
        # version can outlive its marker (still referenced by a kept
        # snapshot when its own manifest aged out) and must be
        # reconsidered by every later vacuum, or it orphans forever —
        # and loser/crashed staging dirs (never referenced by any
        # manifest) fall out the same way. Same caveat as every
        # format's vacuum: don't run concurrently with an in-flight
        # writer, whose staging dir is indistinguishable from a dead one
        dropped = []
        fs, root = self._fs(spark, self.path)
        for status in fs.listStatus(root):
            name = status.getPath().getName()
            if not (name.startswith("version=")
                    or name.startswith("delta=")):
                continue
            if name not in referenced:
                fs.delete(status.getPath(), True)
                dropped.append(int(name.split("=", 1)[1].split("__")[0]))
        return sorted(set(dropped))
