"""Checkpoint-resumable build: per-stage lineage + metrics tables.

Every build stage writes its output table to ``<index_dir>/<stage>``
followed by a row in ``<index_dir>/_lineage`` (stage, status, input
fingerprint, snapshot) and ``<index_dir>/_metrics`` (rows, bytes, wall
ms). On a re-run, a stage whose lineage row says ``done`` with a matching
input fingerprint is skipped and its output reloaded — so a killed build
resumes from the last completed stage (north-rule requirement; the
reference's analogue is the index-version check of
``/root/reference/java/alix/lucene/search/FieldRail.java:189-219`` plus
the atomic directory swap of ``/root/reference/java/alix/cli/Load.java:157-165``).

Spark-native atomicity: parquet writes commit via the Hadoop output
committer (_SUCCESS marker); the lineage row is written only after the
data commit, so a crash between the two re-runs the stage idempotently
(mode=overwrite).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class BuildContext:
    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        Path(index_dir).mkdir(parents=True, exist_ok=True)
        self._lineage_dir = Path(index_dir) / "_lineage"
        self._lineage_dir.mkdir(exist_ok=True)

    # -- lineage records (one small JSON per stage: cheap, atomic rename) --
    def _lineage_path(self, stage: str) -> Path:
        return self._lineage_dir / f"{stage}.json"

    def stage_done(self, stage: str, fingerprint: str) -> bool:
        p = self._lineage_path(stage)
        if not p.exists():
            return False
        rec = json.loads(p.read_text())
        return rec.get("status") == "done" and rec.get("fingerprint") == fingerprint

    def _record(self, stage: str, fingerprint: str, rows: int, wall_ms: float):
        rec = {
            "stage": stage,
            "status": "done",
            "fingerprint": fingerprint,
            "rows": rows,
            "wall_ms": round(wall_ms, 1),
            "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        tmp = self._lineage_path(stage).with_suffix(".tmp")
        tmp.write_text(json.dumps(rec))
        tmp.rename(self._lineage_path(stage))

    def out_path(self, stage: str) -> str:
        return f"{self.index_dir}/{stage}"

    def run_stage(
        self,
        stage: str,
        fingerprint: str,
        build: "callable[[], DataFrame]",
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Run (or resume-skip) one stage; returns the stage output table
        as read back from its parquet checkpoint."""
        out = self.out_path(stage)
        if self.stage_done(stage, fingerprint):
            return self.spark.read.parquet(out)
        t0 = time.time()
        df = build()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out)
        back = self.spark.read.parquet(out)
        rows = back.count()
        self._record(stage, fingerprint, rows, (time.time() - t0) * 1000)
        return back

    # -- consolidated tables for inspection --
    def lineage_table(self) -> DataFrame:
        recs = [
            json.loads(p.read_text())
            for p in sorted(self._lineage_dir.glob("*.json"))
        ]
        return self.spark.createDataFrame(
            recs or [{"stage": None, "status": None}]
        )

    def write_tables(self):
        """Materialize _lineage/_metrics as parquet tables in the index."""
        lt = self.lineage_table()
        lt.select("stage", "status", "fingerprint", "ts").write.mode(
            "overwrite"
        ).parquet(f"{self.index_dir}/_lineage_table")
        lt.select("stage", "rows", "wall_ms").write.mode("overwrite").parquet(
            f"{self.index_dir}/_metrics"
        )
