"""Key-partitioned MERGE/upsert — the engine's flagship operator.

Implements BASELINE.json:6's "key-partitioned MERGE/upsert (keyed on
repo+path, ordered by commit LSN with last-writer-wins dedup in a per-key
sorted-merge apply)" as a copy-on-write merge into the bucketed
``SnapshotTable``:

1.  validate/parse the CDC batch (quarantine malformed rows);
2.  detect additive schema evolution vs the table's schema registry
    (micro-batch-boundary resolution, BJ:6);
3.  one bucket-granular pass over the batch collects affected buckets +
    per-bucket source offset ranges (drives manifest-level pruning);
4.  union the batch with ONLY the affected buckets' stored rows and take
    the last writer per key — two interchangeable, test-proven-equal
    resolution strategies:

    * ``maxby`` (scale default): ``groupBy(key).agg(max_by(row,
      (lsn, commit)))``. Catalyst plans partial_max_by before the shuffle,
      so a hot key is pre-reduced map-side on every input partition —
      skew defuses for free and everything stays in whole-stage codegen.
    * ``sorted_merge``: the north-rule's literal per-key sorted-merge
      apply — a salted ``max_by`` pre-reduce (explicit skew salt,
      BJ:6 "salted repartitioning on hot repos") caps group sizes, then
      ``applyInPandas`` folds each key's events in (lsn, commit) order.
      Vectorized Arrow transfer; no per-row Python outside the fold.
    * ``raw`` (merge-on-read only): no batch dedup at all — every
      validated event lands as a delta row and the read/compaction LWW
      resolves winners. One payload shuffle per epoch (the bucket-aligned
      write) instead of two; measured ~equal to ``maxby`` on the bench
      workload (~3 events/key/epoch) and strictly better for insert-heavy
      streams; costs larger delta files under heavy per-key churn.

    LWW is associative/commutative over the total order (lsn, commit) —
    commit ids are unique per event — so both strategies and any salting
    produce the identical final row; ties (event re-delivery) are exact
    duplicates and collapse. A late LOWER-lsn event never clobbers: the
    stored row participates in the same max with its stored lsn.
5.  winners that are deletes drop the row; survivors are rewritten into
    the affected buckets (zstd parquet, ``_bucket=K`` layout); unaffected
    buckets carry forward by reference;
6.  atomic, epoch-fenced manifest commit (idempotent under re-delivery);
7.  per-bucket/file lineage + per-epoch throughput metrics from parquet
    footers (no extra Spark job).

Scale notes (100 TB posture): merge-on-read epochs scan the batch
EXACTLY ONCE — batch stats ride the resolve+write action via
``Observation`` and the affected-bucket list falls out of the
partitioned write (round 3; previously a dedicated stats job added a
second full scan + a collect barrier per epoch). Copy-on-write keeps the
pre-pass because it must know the affected buckets before reading their
stored rows. The target table is never scanned beyond affected buckets;
all logic is JVM-side except the optional sorted-merge fold; the write
routes each bucket wholly to one task (4x-spread hash partitioning —
see step 5) with ``partitionBy`` splitting bucket directories.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from .lineage import MetricsTable, shuffle_totals
from .table import BUCKET_COL, TOMBSTONE_COL, SnapshotTable, bucket_expr

VALID_OPS = ("insert", "update", "delete")
_STORED = "__stored__"
SHA_COL = "content_sha256"
# Deterministic LWW tie-break (round-6, advice item #1): at an IDENTICAL
# (lsn, commit) ordering key, a delete/tombstone beats a live row. Ties
# between NON-identical rows arise only from out-of-band corrections that
# stamp a tombstone at the victim's own order (delete_where) — and then
# again downstream when read_changes propagates that delete into a table
# holding the identical live row. Without a tie-break, max_by's winner is
# partition/merge-order dependent: a re-delivered original event could
# resurrect a deleted key, and a propagated delete could silently fail to
# apply. The priority column is appended LAST in the order struct, so it
# only ever decides exact (lsn, commit) ties.
_LWW_PRI = "_lww_pri"


def _list_written_files(data_dir: str) -> dict[int, list[str]]:
    """Enumerate ``data_dir/_bucket=K/*.parquet`` after a partitioned write."""
    out: dict[int, list[str]] = {}
    if not os.path.isdir(data_dir):
        return out
    for entry in os.listdir(data_dir):
        if not entry.startswith(f"{BUCKET_COL}="):
            continue
        b = int(entry.split("=", 1)[1])
        bdir = os.path.join(data_dir, entry)
        files = [
            os.path.join(bdir, f)
            for f in os.listdir(bdir)
            if f.endswith(".parquet") or f.endswith(".zstd.parquet")
        ]
        if files:
            out[b] = sorted(files)
    return out


def _evolved_schema(table: SnapshotTable, batch: DataFrame) -> tuple[StructType, list[str]]:
    """Additive evolution vs the registry: batch data columns not in the
    table schema are appended as nullable fields (BJ:6)."""
    cur = table.schema()
    known = set(cur.fieldNames())
    new_fields = [
        StructField(f.name, f.dataType, True)
        for f in batch.schema.fields
        if f.name not in known and f.name != "op"
    ]
    if not new_fields:
        return cur, []
    return StructType(cur.fields + new_fields), [f.name for f in new_fields]


def _align(df: DataFrame, schema: StructType, extra: list[str]) -> DataFrame:
    """Project ``df`` onto ``schema``'s columns (missing -> typed nulls),
    keeping ``extra`` columns (e.g. ``op``) as-is."""
    have = set(df.columns)
    cols = [
        (F.col(f.name).cast(f.dataType) if f.name in have else F.lit(None).cast(f.dataType)).alias(f.name)
        for f in schema.fields
    ]
    return df.select(*cols, *[F.col(c) for c in extra])


def _resolve_maxby(
    unioned: DataFrame, key_cols: list[str], all_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """LWW via max_by — partial aggregation map-side (skew-proof, codegen)."""
    winner = F.max_by(
        F.struct(*[F.col(c) for c in all_cols]),
        F.struct(*[F.col(c) for c in order_cols]),
    ).alias("_w")
    return unioned.groupBy(*key_cols).agg(winner).select("_w.*")


# Winner-set size above which _resolve_two_phase abandons the broadcast
# semi join and falls back to maxby: broadcasting ~120B/winner, 2M rows is
# ~240MB on the driver AND every executor — past that the "minimal payload
# movement" trade inverts into an OOM risk. LWW associativity makes the
# fallback state-identical (tests/test_merge.py pins the digest).
TWO_PHASE_MAX_BROADCAST_ROWS = 2_000_000


def _resolve_two_phase(
    unioned: DataFrame,
    key_cols: list[str],
    all_cols: list[str],
    order_cols: list[str],
    max_broadcast_rows: int | None = None,
) -> DataFrame:
    """LWW with minimal payload movement — the large-row scale path.

    ``maxby`` shuffles every full row (large ``content``) into the
    group-by exchange. Here the winner per key is chosen on a SLIM
    projection (keys + order columns, ~50B/row — column pruning means the
    underlying scans don't even read content), then the full rows are
    fetched back with a null-safe LEFT SEMI join on (key, order). Payload
    bytes cross a shuffle only for WINNER rows (post-dedup), which at
    CDC update ratios is a small fraction of the raw batch.

    Exact re-deliveries (same key+lsn+commit as a stored row or a
    duplicate event) tie in the semi join; the rows are state-identical
    by construction, so ``dropDuplicates(key)`` resolves the tie without
    affecting the final state.
    """
    if max_broadcast_rows is None:
        max_broadcast_rows = TWO_PHASE_MAX_BROADCAST_ROWS
    slim = unioned.select(*key_cols, *order_cols)
    winner = F.max(F.struct(*[F.col(c) for c in order_cols])).alias("_w")
    winners = slim.groupBy(*key_cols).agg(winner).select(*key_cols, "_w.*")
    # Materialize the slim winner set once (localCheckpoint) so the size
    # check and the subsequent broadcast share one computation, then GUARD
    # the broadcast: round-2 review — an unconditionally forced broadcast
    # on a very large epoch OOMs the driver instead of degrading. Past the
    # threshold, fall back to maxby (state-identical by LWW associativity).
    w = winners.select(
        *[F.col(c).alias(f"_win_{c}") for c in key_cols + order_cols]
    ).localCheckpoint(eager=True)
    if w.count() > max_broadcast_rows:
        return _resolve_maxby(unioned, key_cols, all_cols, order_cols)
    cond = None
    for c in key_cols + order_cols:
        e = F.col(c).eqNullSafe(F.col(f"_win_{c}"))
        cond = e if cond is None else cond & e
    # broadcast is forced below the guard: a sort-merge semi join would
    # shuffle the full payload rows on the join keys, defeating the point.
    fetched = unioned.join(F.broadcast(w), cond, "left_semi")
    return fetched.dropDuplicates(key_cols)


def _resolve_sorted_merge(
    unioned: DataFrame,
    key_cols: list[str],
    all_cols: list[str],
    order_cols: list[str],
    num_salts: int,
) -> DataFrame:
    """North-rule-literal per-key sorted-merge apply (applyInPandas).

    Stage 1 — salted pre-reduce: ``groupBy(key, salt)`` with max_by caps
    any hot key at ``num_salts`` surviving rows before the per-key stage
    (explicit skew handling; LWW associativity makes this lossless).
    Stage 2 — ``applyInPandas`` folds each key's rows in (lsn, tiebreak)
    order: the last writer wins whole-row.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(num_salts)).alias("_salt")
    winner = F.max_by(
        F.struct(*[F.col(c) for c in all_cols]),
        F.struct(*[F.col(c) for c in order_cols]),
    ).alias("_w")
    pre = unioned.groupBy(*key_cols, salt).agg(winner).select("_w.*")

    out_schema = StructType([pre.schema[c] for c in all_cols])

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        # na_position='first' matches Spark struct ordering (nulls sort
        # FIRST ascending), so all three resolve strategies agree on the
        # winner even if an order column is ever null on one side.
        pdf = pdf.sort_values(order_cols, kind="stable", na_position="first")
        return pdf.iloc[[-1]]

    return pre.groupBy(*key_cols).applyInPandas(fold, schema=out_schema)


def merge_batch(
    spark: SparkSession,
    table: SnapshotTable,
    batch: DataFrame,
    *,
    job_id: str = "job",
    epoch_id: int = 0,
    metrics: MetricsTable | None = None,
    resolve: str = "maxby",
    num_salts: int = 16,
    quarantine_dir: str | None = None,
    write_mode: str = "cow",
    fault_injector: Callable[[str], None] | None = None,
    branch: str | None = None,
) -> dict[str, Any]:
    """Apply one micro-batch of CDC events to the table, exactly once.

    ``write_mode``:
      * ``cow`` (copy-on-write): rewrite affected buckets with the merged
        state — reads stay cheap, writes pay the rewrite.
      * ``mor`` (merge-on-read): append the batch's per-key winners as
        bucket DELTA files — no stored-table read, no rewrite; reads
        resolve LWW across base+deltas until compaction folds them
        (maintenance.compact_buckets). The at-scale ingest fast path.

    ``branch``: write-audit-publish — the merge reads stored rows from and
    commits to the named branch head; main is untouched until
    ``table.fast_forward(branch)`` publishes.

    Returns a summary dict; ``{"skipped": True}`` when the epoch fence was
    already committed (idempotent re-delivery, BJ:6).
    """
    if write_mode not in ("cow", "mor"):
        raise ValueError(f"unknown write_mode {write_mode!r}")
    if resolve == "raw" and write_mode != "mor":
        raise ValueError("resolve='raw' (no batch dedup) requires write_mode='mor'")
    t0 = time.monotonic()
    shuffle0 = shuffle_totals(spark)  # None unless the UI/REST is enabled
    fence = f"{job_id}:{epoch_id}"
    hook = fault_injector or (lambda stage: None)
    table.refresh()
    if table.is_fence_committed(fence, branch=branch):
        return {"skipped": True, "fence": fence}
    # snapshot this cow rewrite READS from — commit validates the affected
    # buckets are unchanged since (Iceberg-style conflict detection; a
    # concurrent writer to the same bucket must fail the commit, not lose
    # its rows under our rewrite). Branch merges read the BRANCH head.
    if branch is not None and branch not in table.branches():
        raise KeyError(
            f"branch {branch!r} not found — create_branch first "
            f"(known branches: {sorted(table.branches())})"
        )
    head_snapshot = table.resolve_tag(branch) if branch is not None else None
    read_snapshot = (
        (head_snapshot if branch is not None else table.snapshot()["snapshot_id"])
        if write_mode == "cow"
        else None
    )

    key_cols = table.key_cols

    # -- 1. parse/validate (S3): op whitelist + non-null key/order cols -----
    order_col = table.order_col
    cond = F.col("op").isin(*VALID_OPS) & F.col(order_col).isNotNull()
    for k in key_cols:
        cond = cond & F.col(k).isNotNull()
    ev = batch.filter(cond)
    quarantined = 0
    if quarantine_dir is not None:
        bad = batch.filter(~F.coalesce(cond, F.lit(False)))
        quarantined = bad.count()
        if quarantined:
            bad.write.mode("append").option("compression", "zstd").parquet(quarantine_dir)

    # -- 2. schema-evolution gate (T7) --------------------------------------
    schema, new_cols = _evolved_schema(table, batch)
    all_cols = [f.name for f in schema.fields]

    # -- 3. batch stats: affected buckets + offset ranges -------------------
    # Two execution shapes (identical outputs):
    #   * cow / two_phase: a dedicated stats pass BEFORE the resolve — cow
    #     must know the affected buckets to read only their stored rows,
    #     and two_phase's plan traverses the batch twice (an observe node
    #     there would double-count).
    #   * mor single-pass (the ingest hot path): NO extra job. Stats ride
    #     the resolve+write action itself via Observation, and the
    #     affected-bucket list falls out of the partitioned write's
    #     directory layout. One scan of the batch per epoch instead of
    #     two (measured round 3: the stats pass was ~15% of epoch wall
    #     and scaled worst, being a short-task barrier).
    t_stats0 = time.monotonic()
    nb = table.num_buckets
    single_pass = write_mode == "mor" and resolve != "two_phase"
    obs = None
    affected: list[int] | None = None
    n_events = n_deletes = 0
    src_lo = src_hi = None
    if not single_pass:
        bstats = (
            ev.groupBy(bucket_expr(key_cols, nb).alias(BUCKET_COL))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min(order_col).alias("lo"),
                F.max(order_col).alias("hi"),
                F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("dels"),
            )
            .collect()
        )
        affected = sorted(r[BUCKET_COL] for r in bstats)
        n_events = sum(r["n"] for r in bstats)
        n_deletes = sum(r["dels"] for r in bstats)
        src_lo = min((r["lo"] for r in bstats), default=None)
        src_hi = max((r["hi"] for r in bstats), default=None)

    timings: dict[str, float] = {"stats": round(time.monotonic() - t_stats0, 2)}
    summary: dict[str, Any] = {
        "fence": fence,
        "quarantined": quarantined,
        "new_columns": new_cols,
    }

    if not single_pass:
        summary.update(events=n_events, deletes=n_deletes, affected_buckets=len(affected))
        if n_events == 0:
            # still commit the fence so re-delivery of an empty epoch is a no-op
            snap = table.commit(
                {}, [], fence=fence, summary={**summary, "operation": "noop"}, branch=branch
            )
            summary["snapshot_id"] = None if snap is None else snap["snapshot_id"]
            summary["skipped"] = snap is None
            summary["timings"] = timings
            return summary

    # -- 4. LWW resolve ------------------------------------------------------
    # cow: resolve over (batch ∪ affected stored rows); the stored side
    # INCLUDES tombstones so a duplicate/late lower-LSN insert re-delivery
    # can never resurrect a deleted key.
    # mor: resolve over the batch ALONE — conflicts against stored rows
    # (including tombstones) are resolved at READ time by the table's
    # merge-on-read LWW (table.read), which is the same associative max.
    ev_aligned = _align(ev, schema, ["op"]).select(*all_cols, "op")
    if single_pass:
        from pyspark.sql import Observation

        obs = Observation(f"epoch_stats_{fence}")
        ev_aligned = ev_aligned.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.min(order_col).alias("lo"),
            F.max(order_col).alias("hi"),
            F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("dels"),
        )
    if write_mode == "mor":
        unioned = ev_aligned
    else:
        # read-planning bucket (round-6 verdict #2): driver-side cost of
        # planning the stored-side scan — scan_files pruning + the
        # field-id _read_files grouping added in r5. Measured ~1-3 ms per
        # epoch at 32 buckets / single live schema (see BENCH/BASELINE.md
        # drift-attribution note); grows with live schema versions S as S
        # multi-file scans, not with file count.
        t_rp0 = time.monotonic()
        # Read stored rows under the CURRENT REGISTRY schema id (never an
        # explicit out-of-registry StructType): read()'s field-id projection
        # only engages when it knows the target schema_id, so passing the
        # evolved StructType here would silently fall back to read-by-NAME
        # and null out renamed columns' pre-rename files (round-5 bug, caught
        # by the cdc_rename_evolution_state oracle gate). Mid-merge ADDITIVE
        # columns (not yet committed to the registry) are null back-filled by
        # _align below instead.
        stored = table.read(
            spark,
            buckets=affected,
            schema_id=table.meta["current_schema_id"],
            include_tombstones=True,
            snapshot_id=head_snapshot,
        )
        stored_aligned = _align(stored, schema, []).withColumn("op", F.lit(_STORED))
        unioned = ev_aligned.unionByName(stored_aligned)
        timings["read_plan"] = round(time.monotonic() - t_rp0, 3)

    # deterministic total order: (lsn, commit) — commit is unique per event;
    # tables without a commit column fall back to lsn alone (SURVEY §7.4.3).
    # _LWW_PRI is appended as the FINAL order component: delete beats live
    # at an exact (lsn, commit) tie (see the constant's comment).
    order_cols = [table.order_col] + (["commit"] if "commit" in all_cols else [])
    if resolve != "raw":
        del_flag = (F.col("op") == "delete") | (
            (F.col("op") == _STORED) & F.coalesce(F.col(TOMBSTONE_COL), F.lit(False))
        )
        unioned = unioned.withColumn(_LWW_PRI, del_flag.cast("int"))
    carry_cols = all_cols + ["op", _LWW_PRI]
    resolve_order = order_cols + [_LWW_PRI]
    if resolve == "raw":
        # merge-on-read fast path with NO batch dedup: every validated event
        # becomes a delta row (deletes as tombstones) and read/compaction's
        # LWW resolves winners. Correct by the same associativity argument
        # as deferring conflicts against stored rows; trades delta size for
        # removing the resolve shuffle entirely — the payload then crosses
        # exactly ONE exchange per epoch (the bucket-aligned write
        # distribution). Best for insert-heavy / low-duplication streams.
        resolved = ev_aligned
    elif resolve == "maxby":
        resolved = _resolve_maxby(unioned, key_cols, carry_cols, resolve_order).drop(_LWW_PRI)
    elif resolve == "two_phase":
        resolved = _resolve_two_phase(unioned, key_cols, carry_cols, resolve_order).drop(_LWW_PRI)
    elif resolve == "sorted_merge":
        resolved = _resolve_sorted_merge(
            unioned, key_cols, carry_cols, resolve_order, num_salts
        ).drop(_LWW_PRI)
    else:
        raise ValueError(f"unknown resolve strategy {resolve!r}")

    is_del = (F.col("op") == "delete") | (
        (F.col("op") == _STORED) & F.coalesce(F.col(TOMBSTONE_COL), F.lit(False))
    )
    # winners: stored rows keep their sha; winning deletes become tombstones
    # (payload nulled — only key + lsn are retained); new upserts get
    # sha2(content) computed JVM-side.
    final = resolved.withColumn(TOMBSTONE_COL, is_del)
    if SHA_COL in all_cols:
        # the per-row invariant column; tables declared without it (generic
        # keyed upsert, no content hash) simply skip this derivation
        final = final.withColumn(
            SHA_COL,
            F.when(is_del, F.lit(None).cast("string"))
            .when(F.col("op") == _STORED, F.col(SHA_COL))
            .otherwise(F.sha2(F.col("content"), 256) if "content" in all_cols else F.lit(None).cast("string")),
        )
    # Tombstones must retain their FULL ordering key (lsn AND the commit
    # tiebreak): nulling 'commit' would let a future distinct event with the
    # same lsn and any non-null commit beat the tombstone and resurrect the
    # key, contradicting the (lsn, commit) total order.
    payload_cols = [
        c for c in all_cols if c not in (*key_cols, *order_cols, TOMBSTONE_COL, SHA_COL)
    ]
    for c in payload_cols:
        f = schema[c]
        final = final.withColumn(c, F.when(is_del, F.lit(None).cast(f.dataType)).otherwise(F.col(c)))
    final = final.drop("op").withColumn(BUCKET_COL, bucket_expr(key_cols, nb))

    # -- 5. copy-on-write: rewrite affected buckets ---------------------------
    # Bucket-aligned write distribution (Iceberg's hash mode): route each
    # bucket to exactly ONE task so an epoch writes ONE file per affected
    # bucket. Without this, every shuffle partition writes a sliver into
    # every bucket directory (tasks x buckets tiny files) and subsequent
    # epochs drown in file-open overhead. The partition count is 4x the
    # bucket count (empty partitions are free): hashing B distinct bucket
    # values into exactly B partitions is balls-in-bins — ~1/e of the
    # partitions land empty while others carry 3-4 buckets, and at high
    # core counts the multi-bucket stragglers gate the stage (measured
    # round 3). Each bucket still maps wholly to ONE partition, so the
    # one-file-per-bucket invariant holds. Parallelism remains bounded by
    # #affected buckets — size num_buckets >= cluster cores at scale.
    hook("pre_write")
    t_w0 = time.monotonic()
    data_dir = table.new_data_dir()
    n_parts = 4 * nb if single_pass else max(4 * len(affected), 1)
    (
        final.repartition(n_parts, F.col(BUCKET_COL))
        .write.partitionBy(BUCKET_COL)
        .option("compression", "zstd")
        .parquet(data_dir)
    )
    timings["resolve_write"] = round(time.monotonic() - t_w0, 2)
    files_by_bucket = _list_written_files(data_dir)
    if single_pass:
        # stats observed during the write action; affected buckets from
        # the partitioned directory layout — no separate stats job ran.
        # Zero written files <=> zero validated events (every event yields
        # a row on this path), and on an EMPTY plan Catalyst's
        # empty-relation propagation erases the CollectMetrics node, so
        # obs.get must not be consulted there.
        if files_by_bucket:
            m = obs.get
            n_events = m["n"] or 0
            n_deletes = m["dels"] or 0
            src_lo, src_hi = m["lo"], m["hi"]
        affected = sorted(files_by_bucket)
        summary.update(events=n_events, deletes=n_deletes, affected_buckets=len(affected))
        if n_events == 0:
            # single-pass learns the epoch was empty only AFTER the write
            # ran; the write produced no committed-referenced files (zero
            # rows), so drop the orphan data_dir (+_SUCCESS marker) instead
            # of leaving one per empty epoch of a long-running stream
            import shutil

            shutil.rmtree(data_dir, ignore_errors=True)
            snap = table.commit(
                {}, [], fence=fence, summary={**summary, "operation": "noop"}, branch=branch
            )
            summary["snapshot_id"] = None if snap is None else snap["snapshot_id"]
            summary["skipped"] = snap is None
            summary["timings"] = timings
            return summary

    # -- 6. fenced atomic commit ---------------------------------------------
    hook("pre_commit")
    t_c0 = time.monotonic()
    snap = table.commit(
        files_by_bucket,
        affected,
        fence=fence,
        new_schema=schema if new_cols else None,
        summary={**summary, "operation": f"merge_{write_mode}", "timings": timings},
        mode="append_delta" if write_mode == "mor" else "replace",
        validate_from_snapshot=read_snapshot,
        branch=branch,
    )
    if snap is None:  # fence raced us — our files are orphans, vacuum later
        summary["skipped"] = True
        return summary
    hook("post_commit")
    timings["commit"] = round(time.monotonic() - t_c0, 2)

    # -- 7. lineage + throughput metrics --------------------------------------
    t_l0 = time.monotonic()
    secs = time.monotonic() - t0
    shuffle1 = shuffle_totals(spark) if shuffle0 is not None else None
    sh_read = sh_write = io_in = io_out = None
    if shuffle0 is not None and shuffle1 is not None:
        sh_read = shuffle1["shuffle_read_bytes"] - shuffle0["shuffle_read_bytes"]
        sh_write = shuffle1["shuffle_write_bytes"] - shuffle0["shuffle_write_bytes"]
        io_in = shuffle1["input_bytes"] - shuffle0["input_bytes"]
        io_out = shuffle1["output_bytes"] - shuffle0["output_bytes"]
    summary.update(
        snapshot_id=snap["snapshot_id"],
        files_written=sum(len(v) for v in files_by_bucket.values()),
        seconds=secs,
        events_per_sec=(n_events / secs if secs > 0 else None),
        shuffle_read_bytes=sh_read,
        shuffle_write_bytes=sh_write,
    )
    timings["lineage"] = 0.0
    if metrics is not None:
        metrics.emit_lineage(
            job_id, epoch_id, snap["snapshot_id"], files_by_bucket, src_lo, src_hi, table.root
        )
        timings["lineage"] = round(time.monotonic() - t_l0, 2)
        metrics.emit_epoch(
            {
                "job_id": job_id,
                "epoch_id": epoch_id,
                "snapshot_id": snap["snapshot_id"],
                "events": n_events,
                "upserts": n_events - n_deletes,
                "deletes": n_deletes,
                "quarantined": quarantined,
                "affected_buckets": len(affected),
                "files_written": summary["files_written"],
                "seconds": secs,
                "events_per_sec": summary["events_per_sec"],
                "shuffle_read_bytes": sh_read,
                "shuffle_write_bytes": sh_write,
                "input_bytes": io_in,
                "output_bytes": io_out,
            }
        )
    summary["timings"] = timings
    return summary


# ------------------------------------------------------------ predicate DML
def delete_where(
    spark: SparkSession,
    table: SnapshotTable,
    predicate,
    filters: list[tuple] | None = None,
) -> dict:
    """``DELETE FROM table WHERE predicate`` with CDC-correct semantics.

    Matching LIVE rows become delete TOMBSTONES (payload and content-sha
    nulled; key + the FULL ordering key retained) via a copy-on-write
    rewrite of only the affected buckets — the same commit shape as
    ``maintenance.purge_tombstones``. Tombstoning instead of physical
    removal keeps the table's replay invariants: a late/duplicate
    re-delivery of any event at-or-below the row's (lsn, commit) order
    cannot resurrect the key, while a genuinely newer event re-inserts it
    (standard point-in-time DELETE under concurrent ingest). The payload
    bytes leave the CURRENT snapshot immediately; older snapshots still
    reference the old files until ``expire_snapshots`` + ``vacuum`` — run
    those for a full scrub (GDPR path). ``purge_tombstones`` later
    reclaims the tombstone rows themselves.

    ``predicate``: a Column or SQL-expression string evaluated against
    live rows only (existing tombstones are never re-deleted, which also
    makes the operation idempotent). ``filters`` (optional triplets) are
    forwarded to ``table.read`` for scan pruning AND conjoined into the
    delete condition itself — the semantics are consistently
    ``predicate AND filters`` (round-6 advice #4: pruning-only filters
    made the tombstoned set bucket-discovery-dependent when the filters
    weren't implied by the predicate).

    At 100 TB: one filtered scan to find affected buckets (stats/bucket
    pruning applies), then a rewrite shuffling only those buckets —
    untouched buckets carry forward by reference. Racing writers fail the
    CAS commit and the delete recomputes from fresh state.
    """
    from .table import CommitConflict

    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    for attempt in range(3):
        try:
            return _delete_once(spark, table, pred, filters)
        except CommitConflict:
            if attempt == 2:
                raise
    raise AssertionError("unreachable")


def _delete_once(spark, table, pred, filters) -> dict:
    from .stats import filters_to_expr, validate_filters

    table.refresh()
    read_snapshot = table.snapshot()["snapshot_id"]
    nb = table.num_buckets
    # table.read(filters=...) re-applies the filters as a row predicate, so
    # the find scan already counts pred AND filters; conjoin the same
    # filters into the rewrite's delete condition below so both agree.
    fexpr = filters_to_expr(validate_filters(filters)) if filters else None
    if fexpr is not None:
        pred = pred & fexpr
    live = table.read(spark, filters=filters)
    hit = (
        live.filter(pred)
        .select(bucket_expr(table.key_cols, nb).alias(BUCKET_COL))
        .groupBy(BUCKET_COL)
        .count()
        .collect()
    )
    buckets = sorted(r[BUCKET_COL] for r in hit)
    n_deleted = sum(r["count"] for r in hit)
    if not buckets:
        return {"buckets_rewritten": 0, "rows_deleted": 0, "snapshot_id": read_snapshot}

    schema = table.schema()
    all_cols = schema.fieldNames()
    order_cols = [table.order_col] + (["commit"] if "commit" in all_cols else [])
    keep_cols = set(table.key_cols) | set(order_cols) | {TOMBSTONE_COL}
    # live row AND matches the predicate -> tombstone with nulled payload.
    # Materialize the flag BEFORE touching TOMBSTONE_COL: the expression
    # references _deleted, which the tombstone withColumn replaces.
    is_live = ~F.coalesce(F.col(TOMBSTONE_COL), F.lit(False))
    full = table.read(spark, buckets=buckets, include_tombstones=True)
    out = full.withColumn(
        "_to_del", is_live & F.coalesce(pred.cast("boolean"), F.lit(False))
    ).withColumn(
        TOMBSTONE_COL, F.coalesce(F.col(TOMBSTONE_COL), F.lit(False)) | F.col("_to_del")
    )
    for f in schema.fields:
        if f.name not in keep_cols:
            out = out.withColumn(
                f.name,
                F.when(F.col("_to_del"), F.lit(None).cast(f.dataType)).otherwise(F.col(f.name)),
            )
    out = out.drop("_to_del").withColumn(BUCKET_COL, bucket_expr(table.key_cols, nb))
    data_dir = table.new_data_dir()
    (
        out.repartition(max(len(buckets), 1), F.col(BUCKET_COL))
        .sortWithinPartitions(BUCKET_COL, *table.key_cols)
        .write.partitionBy(BUCKET_COL)
        .option("compression", "zstd")
        .parquet(data_dir)
    )
    files_by_bucket = _list_written_files(data_dir)
    snap = table.commit(
        files_by_bucket,
        buckets,
        summary={"operation": "delete_where", "rows_deleted": n_deleted},
        validate_from_snapshot=read_snapshot,
    )
    return {
        "buckets_rewritten": len(buckets),
        "rows_deleted": n_deleted,
        "snapshot_id": snap["snapshot_id"],
    }


def merge_into(
    spark: SparkSession,
    table: SnapshotTable,
    source: DataFrame,
    new_order: int,
    *,
    when_matched: str = "update",
    matched_condition=None,
    when_not_matched: str = "insert",
    job_id: str = "merge_into",
    epoch_id: int | None = None,
    **merge_kwargs,
) -> dict:
    """Conditional ``MERGE INTO table USING source ON keys`` — the classic
    warehouse DML shape, composed over ``merge_batch``.

    ``source`` is any DataFrame carrying the table's key columns plus the
    payload columns to write (it does NOT need the order column — every
    emitted change is stamped at ``new_order``, which must sit above the
    stream's delivered watermark exactly like ``update_where``).

    Clauses (each optional branch of the standard statement):

    * ``when_matched``: ``"update"`` (matched target rows are upserted
      with the source's values), ``"delete"`` (matched rows are
      tombstoned), or ``"ignore"`` (insert-only merge).
    * ``matched_condition``: optional SQL boolean over the joined view —
      source columns by their own names, target columns as ``t_<name>``
      (e.g. ``"value > t_value"`` = upsert only newer). Matched rows
      failing it are left untouched.
    * ``when_not_matched``: ``"insert"`` or ``"ignore"``.

    Duplicate source keys are REJECTED (ANSI/Delta MERGE semantics: one
    source row per target row; LWW silently picking one would mask a bug
    in the feed). Everything downstream is inherited from ``merge_batch``:
    epoch fencing via ``epoch_id``, LWW vs concurrent ingest (events above
    ``new_order`` still win), bucket-local rewrite, lineage, content-sha.

    At 100 TB: the target is read ONLY for the buckets the source keys
    hash into (one O(num_buckets) collect), the match join is an equi
    join on the key columns (sort-merge/shuffled-hash — source and the
    pruned target shuffle once each), and the resulting change batch
    flows through the same bucket-aligned write as any ingest epoch.
    """
    if when_matched not in ("update", "delete", "ignore"):
        raise ValueError(f"when_matched must be update|delete|ignore, got {when_matched!r}")
    if when_not_matched not in ("insert", "ignore"):
        raise ValueError(f"when_not_matched must be insert|ignore, got {when_not_matched!r}")
    key_cols = table.key_cols
    missing = [k for k in key_cols if k not in source.columns]
    if missing:
        raise ValueError(f"source is missing key column(s) {missing}")
    schema = table.schema()
    order_col = table.order_col

    cond_nn = None
    for k in key_cols:
        e = F.col(k).isNotNull()
        cond_nn = e if cond_nn is None else cond_nn & e
    src = source.filter(cond_nn)
    if src.groupBy(*key_cols).count().filter("count > 1").limit(1).count() > 0:
        raise ValueError(
            "duplicate keys in MERGE source: the statement requires at most "
            "one source row per target row (pre-aggregate the source, e.g. "
            "LWW it on its own ordering, before merging)"
        )

    # bucket-prune the target read to the buckets the source keys hash
    # into (same shape as delete_where's find scan; O(num_buckets) rows)
    nb = table.num_buckets
    hit = (
        src.select(bucket_expr(key_cols, nb).alias(BUCKET_COL))
        .groupBy(BUCKET_COL)
        .count()
        .collect()
    )
    buckets = sorted(r[BUCKET_COL] for r in hit)
    tgt = table.read(spark, buckets=buckets).select(
        *[F.col(k).alias(f"_t_{k}") for k in key_cols],
        *[
            F.col(f.name).alias(f"t_{f.name}")
            for f in schema.fields
            if f.name not in key_cols and f.name != TOMBSTONE_COL
        ],
    )
    jcond = None
    for k in key_cols:
        e = F.col(k) == F.col(f"_t_{k}")
        jcond = e if jcond is None else jcond & e
    joined = src.join(tgt, jcond, "left")
    matched = F.col(f"_t_{key_cols[0]}").isNotNull()
    mcond = (
        F.lit(True)
        if matched_condition is None
        else F.coalesce(
            (F.expr(matched_condition) if isinstance(matched_condition, str) else matched_condition).cast("boolean"),
            F.lit(False),
        )
    )

    src_cols = [c for c in source.columns if c in schema.fieldNames()]
    # ANSI/Delta MERGE UPDATE-SET semantics (round-6 advice #1): payload
    # columns the source does NOT carry keep the matched target row's
    # value — previously merge_batch's _align null back-filled them, so a
    # partial-column source silently wiped unassigned target columns.
    # One select serves every branch: for a matched row ``t_<c>`` is the
    # stored value; for a not-matched insert the outer join leaves
    # ``t_<c>`` null, which is exactly the standard INSERT back-fill.
    # Order/sha/tombstone stay excluded (stamped/derived/engine-owned).
    payload_fields = [
        f
        for f in schema.fields
        if f.name not in key_cols and f.name not in (order_col, TOMBSTONE_COL, SHA_COL)
    ]
    out_sel = [F.col(k) for k in key_cols] + [
        (F.col(f.name) if f.name in src_cols else F.col(f"t_{f.name}").alias(f.name))
        for f in payload_fields
    ]
    branches = []
    if when_matched in ("update", "delete"):
        op = "update" if when_matched == "update" else "delete"
        branches.append(joined.filter(matched & mcond).select(*out_sel, F.lit(op).alias("op")))
    if when_not_matched == "insert":
        branches.append(joined.filter(~matched).select(*out_sel, F.lit("insert").alias("op")))
    if not branches:
        raise ValueError("both clauses are 'ignore' — the merge would be a no-op")
    batch = branches[0]
    for b in branches[1:]:
        batch = batch.unionByName(b)
    batch = batch.withColumn(order_col, F.lit(new_order).cast(schema[order_col].dataType))
    if SHA_COL in schema.fieldNames() and SHA_COL in batch.columns:
        batch = batch.drop(SHA_COL)  # derived, never accepted from the source
    return merge_batch(
        spark, table, batch, job_id=job_id, epoch_id=epoch_id, **merge_kwargs
    )


def update_where(
    spark: SparkSession,
    table: SnapshotTable,
    assignments: dict,
    predicate,
    new_order: int,
    job_id: str = "update_where",
    epoch_id: int | None = None,
    filters: list[tuple] | None = None,
    **merge_kwargs,
) -> dict:
    """``UPDATE table SET ... WHERE predicate`` under concurrent CDC ingest.

    Implemented AS A MERGE: the matching live rows are read, the
    assignments applied, and the result fed back through ``merge_batch``
    as a correction batch at ``new_order`` — so UPDATE inherits the whole
    ingest contract for free: epoch fencing (pass ``epoch_id`` for
    exactly-once), quarantine validation, LWW resolution, bucket-local
    copy-on-write, lineage, and the content-sha invariant (updating
    ``content`` recomputes ``content_sha256`` like any upsert).

    ``new_order`` is the correction's position in the table's total
    order and MUST be above the source's delivered watermark: events
    already delivered (order <= new_order) can no longer beat the
    corrected row, while genuinely newer events win as usual. The
    original rows' unique ``commit`` tiebreak is carried through, so two
    corrections at the same ``new_order`` stay deterministic per key.

    ``assignments`` maps column name -> Column or plain literal (a str
    IS a literal — pass ``F.expr(...)`` for an expression; auto-parsing
    strings would make ``{"note": "flagged"}`` silently reference a
    column named flagged). Key/order/engine columns are rejected
    (changing a key is a delete+insert, not an update). ``filters`` are
    part of the update semantics — ``table.read`` re-applies them as a
    row predicate before ``predicate``, so the corrected set is
    consistently ``predicate AND filters`` (same contract as
    ``delete_where``); they additionally drive scan pruning.
    """
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    schema = table.schema()
    cols = set(schema.fieldNames())
    protected = set(table.key_cols) | {table.order_col, TOMBSTONE_COL, SHA_COL}
    for name in assignments:
        if name in protected:
            raise ValueError(
                f"column {name!r} is a key/order/engine column and cannot be "
                "assigned (delete + re-insert to change a key; the content "
                "sha is derived, never assigned)"
            )
        if name not in cols:
            raise KeyError(f"column {name!r} not in table schema {sorted(cols)}")
    upd = table.read(spark, filters=filters).filter(pred)
    for name, value in assignments.items():
        from pyspark.sql import Column

        col = value if isinstance(value, Column) else F.lit(value)
        upd = upd.withColumn(name, col.cast(schema[name].dataType))
    upd = upd.withColumn(table.order_col, F.lit(new_order).cast("long"))
    if SHA_COL in cols:
        # merge_batch derives the sha for non-stored upserts; drop ours
        upd = upd.drop(SHA_COL)
    batch = upd.withColumn("op", F.lit("update"))
    return merge_batch(
        spark, table, batch, job_id=job_id, epoch_id=epoch_id, **merge_kwargs
    )
