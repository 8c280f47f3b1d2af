"""Per-file column statistics (Iceberg manifest min/max concept) + scan pruning.

Every data file committed to a :class:`~etlframwork_spark.table.SnapshotTable`
gets per-column ``[lower_bound, upper_bound]`` stats recorded in the table
metadata, harvested from the parquet FOOTER (no data scan — the writer
already paid for row-group statistics). Reads that carry predicates skip
files whose bounds cannot satisfy them — at 100 TB this is what turns a
"WHERE lang = 'py' AND lsn > X" query from a full-table scan into a scan of
the handful of files that can match, exactly like Iceberg's manifest
filtering.

Safety rules (each one is load-bearing):

- Bounds are BOUNDS, not exact extremes. The parquet spec requires writers
  to store widened-but-valid min/max when they truncate, and we widen again
  when truncating long strings for metadata compactness (lower bound =
  plain prefix, upper bound = prefix with last code point incremented, or
  ``None`` = unbounded when no finite widening exists).
- A file with missing/unknown stats for a referenced column is always KEPT.
- Pruning never changes results: callers re-apply the full predicate in the
  DataFrame plan; skipping is a pure scan optimization.
- All supported operators (=, <, <=, >, >=, in) are null-rejecting, and
  parquet min/max exclude nulls, so null-heavy files prune correctly.
- Merge-on-read: file skipping is only sound in CLEAN (delta-free) buckets.
  Inside a dirty bucket, skipping the file that holds the NEWEST version of
  a key (because the new version moved outside the predicate range) would
  let a stale version win the read-time last-writer-wins resolve.
  ``SnapshotTable.read`` therefore prunes clean buckets only.
"""

from __future__ import annotations

import os
from typing import Any, Iterable

_MAX_STR_BOUND = 16
_MAX_CODEPOINT = 0x10FFFF

#: filter tuple ops understood by :func:`file_matches`
OPS = ("=", "<", "<=", ">", ">=", "in")


def truncate_lower(s: str, length: int = _MAX_STR_BOUND) -> str:
    """A prefix of a string is always a valid (<=) lower bound."""
    return s[:length]


def truncate_upper(s: str, length: int = _MAX_STR_BOUND) -> str | None:
    """Valid upper bound of at most ``length`` code points, or ``None``
    when no finite widening exists (all-0x10FFFF prefix).

    Iceberg's ``truncate`` transform for upper bounds: cut to the prefix,
    then increment the last code point (dropping trailing code points that
    cannot be incremented). The result compares >= every string that starts
    with the original prefix.
    """
    if len(s) <= length:
        return s
    prefix = list(s[:length])
    for i in range(len(prefix) - 1, -1, -1):
        cp = ord(prefix[i])
        if cp < _MAX_CODEPOINT:
            prefix[i] = chr(cp + 1)
            return "".join(prefix[: i + 1])
    return None  # unbounded above


def _is_stat_value(v: Any) -> bool:
    return isinstance(v, (str, int, float)) and not isinstance(v, bool)


def collect_file_stats(
    root: str, rel_files: Iterable[str], stats_cols: list[str]
) -> dict[str, dict[str, Any]]:
    """Harvest per-file stats from parquet footers (metadata-only read).

    Returns ``{rel_path: {"rows": n, "cols": {col: [lo, hi]}}}``; a column
    is omitted when any row group lacks usable min/max for it (conservative
    unknown). ``hi`` may be ``None`` = unbounded above (string widening).
    """
    import pyarrow.parquet as pq

    out: dict[str, dict[str, Any]] = {}
    for rel in rel_files:
        path = os.path.join(root, rel)
        try:
            md = pq.ParquetFile(path).metadata
        except Exception:
            continue  # unreadable footer -> no stats, file always kept
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        bounds: dict[str, list[Any]] = {}
        for col in stats_cols:
            ci = names.get(col)
            if ci is None:
                continue
            lo = hi = None
            ok = True
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                mn, mx = st.min, st.max
                if not (_is_stat_value(mn) and _is_stat_value(mx)):
                    ok = False
                    break
                lo = mn if lo is None or mn < lo else lo
                hi = mx if hi is None or mx > hi else hi
            if ok and lo is not None:
                if isinstance(lo, str):
                    bounds[col] = [truncate_lower(lo), truncate_upper(hi)]
                else:
                    bounds[col] = [lo, hi]
        out[rel] = {"rows": md.num_rows, "cols": bounds}
    return out


def _comparable(bound: Any, value: Any) -> bool:
    if isinstance(bound, bool) or isinstance(value, bool):
        return False
    if isinstance(bound, str) and isinstance(value, str):
        return True
    return isinstance(bound, (int, float)) and isinstance(value, (int, float))


def _matches_one(lo: Any, hi: Any, op: str, value: Any) -> bool:
    """Can ANY row in [lo, hi] satisfy ``col <op> value``? ``hi=None`` means
    unbounded above. Incomparable types -> True (keep)."""
    if op == "in":
        vals = [v for v in value if v is not None]
        return any(_matches_one(lo, hi, "=", v) for v in vals) or not vals
    if value is None or not _comparable(lo, value):
        return True
    if op == "=":
        return lo <= value and (hi is None or value <= hi)
    if op == "<":
        return lo < value
    if op == "<=":
        return lo <= value
    if op == ">":
        return hi is None or hi > value
    if op == ">=":
        return hi is None or hi >= value
    return True  # unknown op -> keep


def file_matches(stats: dict[str, Any] | None, filters: list[tuple]) -> bool:
    """True when the file's bounds admit rows satisfying EVERY filter
    (conjunction). Missing stats for a referenced column -> keep."""
    if not stats:
        return True
    cols = stats.get("cols") or {}
    for col, op, value in filters:
        b = cols.get(col)
        if b is None:
            continue
        if not _matches_one(b[0], b[1], op, value):
            return False
    return True


def prune_files(
    file_stats: dict[str, dict], rel_files: list[str], filters: list[tuple]
) -> list[str]:
    """Subset of ``rel_files`` whose stats admit the filters (files without
    recorded stats are kept)."""
    if not filters:
        return rel_files
    return [f for f in rel_files if file_matches(file_stats.get(f), filters)]


def filters_to_expr(filters: list[tuple]):
    """Lower the filter tuples to a Spark Column so callers re-apply the
    exact predicate the pruning assumed (pruning stays a pure optimization)."""
    from pyspark.sql import functions as F

    expr = None
    for col, op, value in filters:
        c = F.col(col)
        if op == "=":
            e = c == F.lit(value)
        elif op == "<":
            e = c < F.lit(value)
        elif op == "<=":
            e = c <= F.lit(value)
        elif op == ">":
            e = c > F.lit(value)
        elif op == ">=":
            e = c >= F.lit(value)
        elif op == "in":
            e = c.isin(list(value))
        else:
            raise ValueError(f"unsupported filter op {op!r} (supported: {OPS})")
        expr = e if expr is None else (expr & e)
    return expr


def validate_filters(filters: list[tuple]) -> list[tuple]:
    out = []
    for f in filters:
        if len(f) != 3 or f[1] not in OPS:
            raise ValueError(f"bad filter {f!r}: want (col, op, value), op in {OPS}")
        out.append((str(f[0]), f[1], f[2]))
    return out
