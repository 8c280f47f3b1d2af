"""Deterministic CDC change-event generation + the sequential oracle.

The reference checkout is empty (SURVEY.md §0), so the executable stand-in
for "the reference's final table state after replay" (BASELINE.json:14) is
``apply_oracle``: a single-process, dict-based, strictly-LSN-ordered apply
of the same change-event log. Per-row sha256(content) equality between the
engine's snapshot table and this oracle is the correctness bar
(BASELINE.json:15).

Event envelope (BASELINE.json:6 "parses insert/update/delete change
events ... ordered by commit LSN"):

    op:      'insert' | 'update' | 'delete'
    lsn:     globally unique long, total order of the logical history
    repo:    upsert-key part 1
    path:    upsert-key part 2
    commit:  40-hex commit id (unique per event)
    content: file content (absent for deletes)
    lang:    OPTIONAL — appears only in post-evolution segments
             (BASELINE.json:6 "additive schema evolution (new columns like
             lang metadata)")

Apply semantics shared by engine and oracle:
    insert|update -> upsert whole row (LWW by (lsn, commit))
    delete        -> remove key
A later event wins entirely (whole-row LWW); events may ARRIVE in any
order — correctness comes from LSN ordering, not arrival order.

Generation is numpy/pandas-vectorized and chunked so 10^6-10^8-event bench
logs are practical; everything derives from the seed.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql.types import LongType, StringType, StructField, StructType

# Envelope schemas (explicit, never inferred on the hot path — SURVEY §1.3)
CDC_BASE_SCHEMA = StructType(
    [
        StructField("op", StringType(), False),
        StructField("lsn", LongType(), False),
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("content", StringType(), True),
    ]
)
CDC_EVOLVED_SCHEMA = StructType(CDC_BASE_SCHEMA.fields + [StructField("lang", StringType(), True)])

# Target-table schemas (input_hint: repo,path,commit,lang,content + engine cols)
TARGET_BASE_SCHEMA = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), True),
        StructField("content", StringType(), True),
        StructField("lsn", LongType(), False),
        StructField("content_sha256", StringType(), True),
    ]
)
# evolution APPENDS new nullable fields (matches merge._evolved_schema)
TARGET_EVOLVED_SCHEMA = StructType(
    TARGET_BASE_SCHEMA.fields + [StructField("lang", StringType(), True)]
)

_EXT_LANG = {"py": "python", "rs": "rust", "go": "go", "js": "javascript", "md": "markdown"}
_EXTS = list(_EXT_LANG)


@dataclass
class EventLogSpec:
    """Knobs for a deterministic synthetic change-event log."""

    seed: int = 42
    n_events: int = 10_000
    n_repos: int = 100
    paths_per_repo: int = 50
    hot_ratio: float = 0.0  # probability mass landing on repo 0 (skew knob)
    p_delete: float = 0.05
    p_insert: float = 0.40  # rest are updates
    n_files: int = 8  # binlog segment files
    evolve_at: float | None = None  # fraction of ARRIVAL at which `lang` appears
    shuffle_window: int = 64  # local arrival-order shuffling (out-of-order-ness)
    content_repeat: int = 3  # content size knob (bigger -> heavier rows)
    duplicate_ratio: float = 0.0  # fraction of events re-delivered (dup files)


@dataclass
class EventLog:
    dir: str
    spec: EventLogSpec
    files: list[str] = field(default_factory=list)  # arrival-ordered
    evolved_from_file: int | None = None  # index of first file carrying `lang`


def _make_events_meta(spec: EventLogSpec) -> dict[str, np.ndarray]:
    """Numeric skeleton of the log in ARRIVAL order (cheap: numpy only)."""
    rng = np.random.default_rng(spec.seed)
    n = spec.n_events

    # --- keys: optionally skewed toward repo 0 ("hot repo", BJ:6 skew) ----
    repo_idx = rng.integers(0, spec.n_repos, size=n)
    if spec.hot_ratio > 0:
        hot = rng.random(n) < spec.hot_ratio
        repo_idx = np.where(hot, 0, repo_idx)
    path_idx = rng.integers(0, spec.paths_per_repo, size=n)

    # --- ops ---------------------------------------------------------------
    u = rng.random(n)
    op_code = np.where(u < spec.p_delete, 0, np.where(u < spec.p_delete + spec.p_insert, 1, 2))

    # --- LSN: unique total order; arrival is locally shuffled --------------
    lsn = np.arange(n, dtype=np.int64)
    arrival_key = lsn + rng.uniform(0, max(1, spec.shuffle_window), size=n)
    arrival = np.argsort(arrival_key, kind="stable")
    return {
        "op_code": op_code[arrival],
        "lsn": lsn[arrival],
        "repo_idx": repo_idx[arrival],
        "path_idx": path_idx[arrival],
    }


_OP_NAMES = np.array(["delete", "insert", "update"], dtype=object)


def _strings_for_slice(meta: dict[str, np.ndarray], lo: int, hi: int, content_repeat: int) -> pd.DataFrame:
    """Materialize the string columns for arrival rows [lo, hi) — every
    value is a pure function of the numeric skeleton, so chunked
    materialization is byte-identical to whole-frame materialization
    (memory stays bounded by the segment size even for 10^7+ event logs)."""
    repo_idx = meta["repo_idx"][lo:hi]
    path_idx = meta["path_idx"][lo:hi]
    lsn = meta["lsn"][lo:hi]
    op = _OP_NAMES[meta["op_code"][lo:hi]]
    ext_idx = path_idx % len(_EXTS)
    df = pd.DataFrame(
        {
            "op": pd.array(op, dtype="string"),
            "lsn": lsn,
        }
    )
    ridx = pd.Series(repo_idx, index=df.index)
    pidx = pd.Series(path_idx, index=df.index)
    df["repo"] = ("org" + (ridx // 10).astype(str) + "/repo" + ridx.astype(str)).astype("string")
    ext = pd.Series(np.array(_EXTS, dtype=object)[ext_idx], index=df.index)
    df["path"] = ("src/mod" + (pidx // 10).astype(str) + "/f" + pidx.astype(str) + "." + ext).astype("string")
    df["lang"] = pd.Series(
        np.array([_EXT_LANG[e] for e in _EXTS], dtype=object)[ext_idx], index=df.index
    ).astype("string")
    # commit: unique 40-hex derived from lsn (cheap, deterministic)
    df["commit"] = pd.Series(lsn).map(lambda x: format(x, "040x")).astype("string").values
    lsn_str = df["lsn"].astype(str)
    body = "// " + df["repo"] + "/" + df["path"] + "@" + lsn_str + "\n"
    filler = "fn unit() -> u64 { " + lsn_str + " }\n"
    df["content"] = (body + filler * content_repeat).astype("string")
    df.loc[df["op"] == "delete", "content"] = pd.NA
    return df


def _make_events_frame(spec: EventLogSpec) -> pd.DataFrame:
    """All events of the log, in ARRIVAL order, as a pandas frame."""
    meta = _make_events_meta(spec)
    return _strings_for_slice(meta, 0, spec.n_events, spec.content_repeat)


def _write_segment(df: pd.DataFrame, path: str, with_lang: bool) -> None:
    cols = ["op", "lsn", "repo", "path", "commit", "content"] + (["lang"] if with_lang else [])
    schema_fields = [
        ("op", pa.string()),
        ("lsn", pa.int64()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("content", pa.string()),
    ] + ([("lang", pa.string())] if with_lang else [])
    table = pa.Table.from_pandas(df[cols], schema=pa.schema(schema_fields), preserve_index=False)
    tmp = path + ".tmp"
    # Bounded row groups (32k rows ≈ 25MB raw content): a real WAL/binlog
    # segment writer flushes bounded batches, and row groups are Spark's
    # scan-split unit — one monolithic row group per segment made every
    # scan stage's parallelism = #files-per-trigger, leaving cores idle at
    # high parallelism (measured round 3: the TRUE cause of the 8->32
    # scaling ceiling, previously misattributed to memory bandwidth).
    pq.write_table(table, tmp, compression="zstd", row_group_size=32_768)
    os.rename(tmp, path)  # files appear atomically for the stream tail


def generate_event_log(out_dir: str, spec: EventLogSpec) -> EventLog:
    """Write the event log as ``n_files`` parquet segments in arrival order.

    If ``spec.evolve_at`` is set, segments past that arrival fraction carry
    the additive ``lang`` column (schema evolution input, BJ:6).
    If ``spec.duplicate_ratio`` > 0, extra ``dup-*.parquet`` segments
    re-deliver a sample of already-delivered events (at-least-once input).
    """
    os.makedirs(out_dir, exist_ok=True)
    meta = _make_events_meta(spec)
    n = spec.n_events
    bounds = np.linspace(0, n, spec.n_files + 1).astype(int)
    evolve_row = int(spec.evolve_at * n) if spec.evolve_at is not None else None
    log = EventLog(dir=out_dir, spec=spec)
    for i in range(spec.n_files):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        if hi <= lo:
            continue
        seg = _strings_for_slice(meta, lo, hi, spec.content_repeat)
        with_lang = evolve_row is not None and lo >= evolve_row
        if with_lang and log.evolved_from_file is None:
            log.evolved_from_file = i
        seg = seg if with_lang else seg.drop(columns=["lang"])
        p = os.path.join(out_dir, f"events-{i:05d}.parquet")
        _write_segment(seg, p, with_lang)
        log.files.append(p)
    if spec.duplicate_ratio > 0:
        rng = np.random.default_rng(spec.seed + 1)
        k = int(n * spec.duplicate_ratio)
        picks = np.sort(rng.choice(n, size=k, replace=False))
        dup = _strings_for_slice({c: v[picks] for c, v in meta.items()}, 0, k, spec.content_repeat)
        # a re-delivery carries the SAME payload the original delivery was
        # read with: pre-evolution originals surface lang=null (column
        # absent), so their duplicates must too — otherwise a duplicate
        # would be a non-identical row tied on (lsn, commit), making the
        # LWW winner between original and duplicate ambiguous.
        with_lang = evolve_row is not None
        if with_lang:
            dup.loc[picks < evolve_row, "lang"] = pd.NA
        p = os.path.join(out_dir, f"events-{spec.n_files:05d}-dup.parquet")
        _write_segment(dup.drop(columns=[] if with_lang else ["lang"]), p, with_lang)
        log.files.append(p)
    return log


# --------------------------------------------------------------------------
# Sequential oracle — the reference-semantics stand-in (SURVEY §0, §5.3)
# --------------------------------------------------------------------------

def read_log_pandas(dir_or_files: str | list[str]) -> pd.DataFrame:
    """Read every event segment into one pandas frame (lang := NA if absent)."""
    if isinstance(dir_or_files, str):
        files = sorted(
            os.path.join(dir_or_files, f) for f in os.listdir(dir_or_files) if f.endswith(".parquet")
        )
    else:
        files = list(dir_or_files)
    frames = []
    for f in files:
        d = pq.read_table(f).to_pandas(types_mapper=lambda t: pd.StringDtype() if t == pa.string() else None)
        if "lang" not in d.columns:
            d["lang"] = pd.NA
        frames.append(d)
    return pd.concat(frames, ignore_index=True)


def apply_oracle(events: pd.DataFrame) -> dict[tuple[str, str], dict]:
    """Strictly (lsn, commit)-ordered sequential apply. Duplicated event
    deliveries collapse (same lsn -> same row state). Returns final state
    keyed by (repo, path). At an exact (lsn, commit) tie a delete applies
    LAST (delete-beats-live — the engine's deterministic tie-break for
    out-of-band tombstones stamped at a victim's own order)."""
    state: dict[tuple[str, str], dict] = {}
    ev = events.assign(_pri=(events["op"] == "delete").astype(int)).sort_values(
        ["lsn", "commit", "_pri"], kind="stable"
    )
    for row in ev.itertuples(index=False):
        key = (row.repo, row.path)
        if row.op == "delete":
            state.pop(key, None)
        else:
            lang = row.lang if isinstance(row.lang, str) else None
            state[key] = {
                "repo": row.repo,
                "path": row.path,
                "commit": row.commit,
                "content": row.content,
                "lang": lang,
                "lsn": int(row.lsn),
            }
    return state


def oracle_digests(state: dict[tuple[str, str], dict]) -> dict[tuple[str, str], str]:
    """Per-row sha256(content) — the BASELINE.json:15 invariant."""
    return {
        k: hashlib.sha256(v["content"].encode("utf-8")).hexdigest() for k, v in state.items()
    }
