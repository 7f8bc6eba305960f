"""Deterministic size-aware partition planning over Parquet shards.

The explicit skew-handling shuffle-avoider of the encode path: instead of a
blind ``repartition``, the planner reads ONLY the ``n_tok`` column (column
pruning at the read) to bin contiguous row ranges into partitions of
~``target_tokens`` each. Heavy-tailed docs are handled explicitly: a row
group whose token sum exceeds 1.5x target is re-planned at row granularity,
and a single giant doc gets its own partition. Partition ids are a pure
function of (input files, target), so a resumed run re-plans identically
and can skip completed partitions via the manifest.

At cluster scale the per-row-group scan is a metadata-sized distributed
pass (one (file, row_group, token_sum) triple per row group); in-sandbox it
runs threaded on the driver through pyarrow with the same outputs.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np
import pyarrow.parquet as pq


@dataclass
class PartitionSpec:
    pid: int
    file: str
    row_start: int
    row_count: int
    est_tokens: int

    def to_dict(self) -> dict:
        return {
            "pid": self.pid, "file": self.file, "row_start": self.row_start,
            "row_count": self.row_count, "est_tokens": self.est_tokens,
        }


def _scan_file(
    path: str, token_col: str
) -> tuple[str, list[tuple[int, int, np.ndarray]], int, bool]:
    """(path, per-row-group (rows, token_sum, per_row_counts), num_rows,
    has_token_col). Tables without a token-count column fall back to
    cost=1 per row (partitioning by row count — no extra read at all,
    just footer metadata)."""
    f = pq.ParquetFile(path)
    has_col = token_col in f.schema_arrow.names
    out = []
    if has_col:
        # one whole-file single-column read, sliced at row-group boundaries
        # — per-row-group reads pay a ~3ms fixed cost each, which dominated
        # planning time on many-row-group shards
        all_vals = f.read(columns=[token_col]).column(0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        pos = 0
        for rg in range(f.metadata.num_row_groups):
            nrows = f.metadata.row_group(rg).num_rows
            vals = all_vals[pos: pos + nrows]
            pos += nrows
            out.append((nrows, int(vals.sum()), vals))
    else:
        for rg in range(f.metadata.num_row_groups):
            vals = np.ones(f.metadata.row_group(rg).num_rows, dtype=np.int64)
            out.append((len(vals), int(vals.sum()), vals))
    return path, out, f.metadata.num_rows, has_col


def plan_partitions(
    paths: list[str],
    target_tokens: int,
    token_col: str = "n_tok",
    max_workers: int = 8,
) -> list[PartitionSpec]:
    """Bin contiguous row ranges (file by file, in path order) into
    partitions of ~target_tokens."""
    paths = sorted(paths)
    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        scans = list(ex.map(lambda p: _scan_file(p, token_col), paths))

    specs: list[PartitionSpec] = []
    pid = 0

    def emit(file, start, count, tokens):
        nonlocal pid
        if count > 0:
            specs.append(PartitionSpec(pid, file, start, count, int(tokens)))
            pid += 1

    for path, groups, _total, has_col in scans:
        # cost-1 fallback (no token column): cap partitions by row count so
        # a token-sized target doesn't lump millions of rows into one task
        target = target_tokens if has_col else min(target_tokens, 1_048_576)
        row = 0
        acc_start, acc_rows, acc_tok = 0, 0, 0
        for nrows, tsum, vals in groups:
            if tsum > 1.5 * target:
                # flush accumulator, then row-granular split of this group
                emit(path, acc_start, acc_rows, acc_tok)
                acc_start, acc_rows, acc_tok = row + nrows, 0, 0
                cum = np.cumsum(vals)
                s = 0
                while s < nrows:
                    base = cum[s - 1] if s else 0
                    e = int(np.searchsorted(cum, base + target, side="right"))
                    e = min(max(e, s + 1), nrows)
                    emit(path, row + s, e - s, int(cum[e - 1] - base))
                    s = e
            else:
                if acc_rows and acc_tok + tsum > target:
                    emit(path, acc_start, acc_rows, acc_tok)
                    acc_start, acc_rows, acc_tok = row, 0, 0
                if acc_rows == 0:
                    acc_start = row
                acc_rows += nrows
                acc_tok += tsum
                if acc_tok >= target:
                    emit(path, acc_start, acc_rows, acc_tok)
                    acc_start, acc_rows, acc_tok = row + nrows, 0, 0
            row += nrows
        emit(path, acc_start, acc_rows, acc_tok)
    return specs


def read_partition(spec: dict, columns: list[str] | None = None):
    """Read a partition's row range, touching only overlapping row groups."""
    f = pq.ParquetFile(spec["file"])
    start, count = spec["row_start"], spec["row_count"]
    end = start + count
    rgs, first_row = [], None
    row = 0
    for rg in range(f.metadata.num_row_groups):
        n = f.metadata.row_group(rg).num_rows
        if row < end and row + n > start:
            if first_row is None:
                first_row = row
            rgs.append(rg)
        row += n
        if row >= end:
            break
    table = f.read_row_groups(rgs, columns=columns)
    return table.slice(start - first_row, count)
