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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from systems_spark.sources import _fs_read_text, _fs_write_text

_COMMIT_DIR = "_commits"


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
