"""Durable stage handoffs for the composed pipelines.

``q_pipeline_llm`` and ``q_pipeline_media`` cut their
multiply-referenced stage handoffs either with
``localCheckpoint(eager=False)`` (test-scale default: executor-side
blocks, no fs round-trip — but non-replicated, and Spark 4.1
materializes them at builder time) or, with ``stage_dir=``, as parquet
tables on whatever storage the path lives on (HDFS/S3 in production:
executor loss costs one stage recompute at most, every stage output
independently inspectable).

``resume=True`` makes a staged run RESTARTABLE: a stage whose parquet
is already complete (``_SUCCESS`` present) and whose recorded
parameter fingerprint matches the current call is READ back without
recomputing — after a mid-pipeline failure, the completed prefix is
reused and only the missing suffix runs. Two deliberate contract
points:

- The fingerprint covers the pipeline PARAMETERS, not the input data
  (fingerprinting 100 TB of input would cost a full scan — the thing
  resume exists to avoid). Resuming over a CHANGED INPUT with a stale
  stage_dir is the caller's responsibility, exactly as with every
  checkpoint/restart system (Spark streaming checkpoints included).
- A parameter mismatch RAISES instead of silently mixing two
  configurations: the fingerprint is encoded in the marker FILE NAME
  (``<stage>.fp-<md5>``), so the check is a pure existence probe — no
  driver-side read, and it works identically on local fs, HDFS, and
  S3 through the Hadoop FileSystem API.

Reference analogue: the reference restarts its 15-minute retrain
pipeline from scratch on failure (trainer.py:45-66 has no
intermediate persistence); at 100 TB a composed curation run is hours
long and restart-from-scratch is not an option — this is the Spark
idiom for the same scheduled-pipeline surface.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Callable

from pyspark.sql import DataFrame


def _fingerprint(params: dict | None) -> str:
    blob = json.dumps(params or {}, sort_keys=True, default=str)
    return hashlib.md5(blob.encode()).hexdigest()


def _fs(df: DataFrame, path: str):
    """(FileSystem, Path) for ``path`` via the JVM Hadoop API — the
    one FS abstraction that behaves identically on file://, hdfs://
    and s3a:// (driver-side metadata ops only, never data)."""
    spark = df.sparkSession
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def make_stage(stage_dir: str | None,
               resume: bool = False,
               params: dict | None = None,
               ) -> Callable[[DataFrame, str], DataFrame]:
    """Build the ``_stage(df, name)`` handoff function the composed
    pipelines thread through their stages. See the module docstring
    for the staging/resume contract."""
    if resume and stage_dir is None:
        raise ValueError("resume=True requires stage_dir")
    fp = _fingerprint(params)

    def _stage(df: DataFrame, name: str) -> DataFrame:
        if stage_dir is None:
            return df.localCheckpoint(eager=False)
        path = f"{stage_dir}/{name}"
        fs, jpath, jvm = _fs(df, path)
        marker = jvm.org.apache.hadoop.fs.Path(
            f"{stage_dir}/{name}.fp-{fp}")
        success = jvm.org.apache.hadoop.fs.Path(f"{path}/_SUCCESS")
        if resume and fs.exists(success):
            if not fs.exists(marker):
                raise ValueError(
                    f"stage {name!r} at {path} was written by a run "
                    "with DIFFERENT pipeline parameters (no matching "
                    f".fp-{fp} marker) — refusing to resume across "
                    "configurations; clear the stage_dir or rerun "
                    "with the original parameters")
            return df.sparkSession.read.parquet(path)
        df.write.mode("overwrite").parquet(path)
        # drop any marker from a previous configuration FIRST: a
        # stale .fp-<other> next to freshly-overwritten data would
        # let a later resume under the OLD parameters adopt rows
        # computed under the new ones
        for st in fs.globStatus(jvm.org.apache.hadoop.fs.Path(
                f"{stage_dir}/{name}.fp-*")) or []:
            fs.delete(st.getPath(), False)
        fs.create(marker, True).close()
        return df.sparkSession.read.parquet(path)

    return _stage
