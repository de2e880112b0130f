"""Per-partition checkpoint/resume (north rule: "resumable from
per-partition checkpoints with lineage").

Batch Spark has no built-in resumable stages, so resumability is built as
stage-boundary materialization:

  * the input is bucketed deterministically (`pmod(xxhash64(url), N)`), so
    the same row always lands in the same bucket on every run;
  * each stage writes its output under
    `{dir}/{run_id}/{stage}/bucket=<k>/...parquet`, one bucket at a time
    committed via a JSON manifest listing finished buckets;
  * on resume, finished buckets are loaded from the checkpoint and only the
    missing buckets are recomputed (an anti-join by bucket id — cheap,
    because the bucket id is a pure function of the key column).

A killed run therefore restarts exactly where it stopped, and the recomputed
output is bit-identical because every stage is deterministic.
"""

from __future__ import annotations

import json
import os
from typing import Callable, List

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest.json"


def with_bucket(df: DataFrame, key_col: str, n_buckets: int) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")
    )


def _manifest_path(base: str, run_id: str, stage: str) -> str:
    return os.path.join(base, run_id, stage, MANIFEST)


def read_manifest(base: str, run_id: str, stage: str) -> dict | None:
    path = _manifest_path(base, run_id, stage)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def completed_buckets(base: str, run_id: str, stage: str) -> List[int]:
    m = read_manifest(base, run_id, stage)
    return sorted(m.get("completed", [])) if m else []


def _mark_completed(base: str, run_id: str, stage: str, buckets: List[int],
                    extra: dict | None = None) -> None:
    path = _manifest_path(base, run_id, stage)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    done = set(completed_buckets(base, run_id, stage)) | set(buckets)
    payload = {"completed": sorted(done), "stage": stage, "run_id": run_id}
    payload.update(extra or {})
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)  # atomic commit


def run_stage_resumable(
    spark: SparkSession,
    inp: DataFrame,
    stage_fn: Callable[[DataFrame], DataFrame],
    base: str,
    run_id: str,
    stage: str,
    key_col: str = "url",
    n_buckets: int = 8,
    buckets_per_commit: int = 4,
) -> DataFrame:
    """Applies `stage_fn` to `inp`, checkpointing per input bucket.

    The stage function must be row-local w.r.t. `key_col` partitioning (true
    for extract/normalize stages — they never mix urls), so per-bucket
    execution equals whole-input execution.
    Returns the stage output for ALL buckets (checkpointed ∪ fresh).
    """
    stage_dir = os.path.join(base, run_id, stage)
    manifest = read_manifest(base, run_id, stage)
    if manifest is not None:
        # fail FAST on parameter drift: pending buckets derive from
        # range(n_buckets) and row→bucket mapping from (key_col, n_buckets);
        # resuming with different values would silently mismatch the
        # completed-bucket list, and the torn-state repair below would then
        # DELETE bucket dirs it wrongly considers pending
        m_nb = manifest.get("n_buckets")
        m_kc = manifest.get("key_col")
        if (m_nb, m_kc) != (n_buckets, key_col):
            # a manifest WITHOUT the keys (pre-round-3) is also a hard stop:
            # its parameters cannot be validated, and proceeding on a guess
            # risks exactly the destructive repair this guard exists for
            raise ValueError(
                f"checkpoint resume mismatch for {stage_dir}: manifest has "
                f"n_buckets={m_nb}, key_col={m_kc!r} (None = legacy manifest "
                f"without recorded parameters) but this invocation uses "
                f"n_buckets={n_buckets}, key_col={key_col!r}"
            )
    done = set(manifest.get("completed", [])) if manifest else set()
    manifest_schema = manifest.get("schema") if manifest else None
    pending = [b for b in range(n_buckets) if b not in done]

    # fail FAST on stage-schema drift, BEFORE the torn-state repair below
    # deletes anything: resuming a checkpoint whose completed buckets were
    # written by an older stage_fn (e.g. the round-3 `occ` column added to
    # the extract flat schema) would otherwise mix two schemas in one
    # dataset — old rows silently null-fill the new columns on read. The
    # probe is plan-only (limit(0) → schema), no job runs.
    if manifest_schema is not None and done and pending:
        probe_schema = stage_fn(inp.limit(0)).schema.json()
        if probe_schema != manifest_schema:
            raise ValueError(
                f"checkpoint resume mismatch for {stage_dir}: the stage "
                f"output schema changed since the completed buckets were "
                f"written (recorded {manifest_schema} != current "
                f"{probe_schema}); discard the checkpoint or use a new "
                f"run_id")

    # torn-state repair: a crash AFTER the parquet append but BEFORE the
    # manifest commit leaves orphan data for still-pending buckets; a
    # resume would recompute them and APPEND duplicates. The manifest is
    # the single source of truth — clear any uncommitted bucket dirs
    # before recomputing, making the append idempotent.
    import shutil
    for b in pending:
        orphan = os.path.join(stage_dir, "data", f"bucket={b}")
        if os.path.exists(orphan):
            shutil.rmtree(orphan)

    binp = with_bucket(inp, key_col, n_buckets)

    group: List[int] = []
    out_schema_json = None
    for b in pending:
        group.append(b)
        if len(group) >= buckets_per_commit or b == pending[-1]:
            part = binp.filter(F.col("bucket").isin(group))
            out = stage_fn(part.drop("bucket"))
            out_schema_json = out.schema.json()
            (with_bucket(out, key_col, n_buckets)
             .write.mode("append").partitionBy("bucket")
             .parquet(stage_dir + "/data"))
            # the output schema rides in the manifest so a resumed or
            # zero-row run can read the data dir back without relying on
            # parquet schema inference (which throws when the stage
            # produced no part files at all)
            _mark_completed(base, run_id, stage, group,
                            extra={"schema": out_schema_json,
                                   "n_buckets": n_buckets,
                                   "key_col": key_col})
            group = []

    if out_schema_json is None:  # fully resumed: schema from the manifest
        with open(_manifest_path(base, run_id, stage)) as f:
            out_schema_json = json.load(f).get("schema")
    if out_schema_json is not None:
        from pyspark.sql.types import StructType
        schema = StructType.fromJson(json.loads(out_schema_json))
        data_dir = stage_dir + "/data"
        if not os.path.isdir(data_dir):
            # every bucket committed zero rows — no dir was ever created
            return spark.createDataFrame([], schema)
        return spark.read.schema(
            with_bucket(spark.createDataFrame([], schema),
                        key_col, n_buckets).schema
        ).parquet(data_dir).drop("bucket")
    # legacy manifest without a schema: fall back to inference
    return spark.read.parquet(stage_dir + "/data").drop("bucket")
