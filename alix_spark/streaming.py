"""Structured Streaming ingest: micro-batch MERGE into the live index.

The reference is batch-only with an atomic directory swap at the end of
each load (``/root/reference/java/alix/cli/Load.java:157-165``) and
delete-then-reinsert per source file
(``/root/reference/java/alix/lucene/SAXIndexer.java:133-137``). This
module is the streaming generalization a 100 TB pipeline needs: a
``readStream`` of changed documents drives ``foreachBatch``, each
micro-batch MERGEs by (repo, path) through
:func:`alix_spark.index.update.incremental_update` (only touched
docId-range segments re-encoded), and the new index version is published
with the same atomic pointer-swap discipline — readers always see a
complete, consistent version.

Layout::

    <index_dir>/v<N>/{docs,segments,norms}   # immutable versions
    <index_dir>/CURRENT                       # pointer file (atomic rename)
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alix_spark.index import segments as seg_mod
from alix_spark.index.update import incremental_update

DOCS_SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, sha256 string, doc_id long"
)


class StreamingIndexer:
    """foreachBatch sink maintaining a versioned, atomically-published
    inverted index."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        seg_size: int = seg_mod.DEFAULT_SEG_SIZE,
        n_buckets: int = seg_mod.DEFAULT_BUCKETS,
        text_col: str = "content",
    ):
        self.spark = spark
        self.index_dir = index_dir
        self.seg_size = seg_size
        self.n_buckets = n_buckets
        self.text_col = text_col
        Path(index_dir).mkdir(parents=True, exist_ok=True)

    # -- version pointer (the Load.java atomic-swap analogue) ----------
    def current_version(self) -> int:
        p = Path(self.index_dir) / "CURRENT"
        if not p.exists():
            return 0
        return int(json.loads(p.read_text())["version"])

    def _publish(self, version: int) -> None:
        p = Path(self.index_dir) / "CURRENT"
        tmp = p.with_suffix(".tmp")
        tmp.write_text(json.dumps({"version": version}))
        os.replace(tmp, p)  # atomic on POSIX

    def _vdir(self, version: int) -> str:
        return f"{self.index_dir}/v{version}"

    def load_tables(self) -> tuple[DataFrame, DataFrame, DataFrame]:
        """(docs, segments, norms) of the CURRENT version; empty frames
        with the right schemas before the first publish."""
        v = self.current_version()
        if v == 0:
            docs = self.spark.createDataFrame([], DOCS_SCHEMA)
            segs = self.spark.createDataFrame([], seg_mod.SEGMENT_SCHEMA)
            norms = self.spark.createDataFrame([], seg_mod.NORMS_SCHEMA)
            return docs, segs, norms
        d = self._vdir(v)
        return (
            self.spark.read.parquet(f"{d}/docs"),
            self.spark.read.parquet(f"{d}/segments"),
            self.spark.read.parquet(f"{d}/norms"),
        )

    # -- the foreachBatch callback --------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        docs, segs, norms = self.load_tables()
        docs_new, segs_new, norms_new, affected = incremental_update(
            docs,
            segs,
            norms,
            batch_df,
            seg_size=self.seg_size,
            n_buckets=self.n_buckets,
            text_col=self.text_col,
        )
        v = self.current_version() + 1
        d = self._vdir(v)
        docs_new.write.mode("overwrite").parquet(f"{d}/docs")
        segs_new.write.mode("overwrite").parquet(f"{d}/segments")
        norms_new.write.mode("overwrite").parquet(f"{d}/norms")
        # publish only after every table committed (_SUCCESS markers):
        # a crash mid-batch leaves CURRENT on the previous good version
        self._publish(v)

    def start(
        self,
        stream_df: DataFrame,
        checkpoint: str,
        available_now: bool = True,
    ):
        """Attach to a streaming docs source and run. ``available_now``
        drains what exists and stops (the testable mode); False runs
        continuously with the default trigger."""
        w = (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
        )
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()


def windowed_event_counts(
    events: DataFrame,
    window_dur: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over an event stream →
    (window, event_type, n, sum_value). Late events older than the
    watermark are dropped — the standard Structured Streaming late-data
    discipline for the A7-style chronology curves when the corpus arrives
    as a stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_dur), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("value").alias("sum_value"),
        )
    )


def docs_file_stream(
    spark: SparkSession, src_dir: str, with_sha: bool = True
) -> DataFrame:
    """readStream over a directory of parquet doc files (the canonical
    landing zone of a crawl: new files appear, each holding changed
    (repo, path, commit, lang, content) rows)."""
    schema = (
        "repo string, path string, commit string, lang string, "
        "content string" + (", sha256 string" if with_sha else "")
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # one micro-batch per file
        .parquet(src_dir)
    )
