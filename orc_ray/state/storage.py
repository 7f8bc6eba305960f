"""Pluggable storage backend for blobs and manifests (pyarrow.fs).

The reference abstracts its storage behind ``SizedReaderAt``
(/root/reference/reader.go:25-28) and an ``io.Writer``; the engine's
analogue is this module: every blob/manifest byte that crosses a process
boundary routes through these helpers, which dispatch on the out_dir
PATH STRING — so Ray workers resolve the same backend independently from
the path alone, with no filesystem object threaded through task closures.

Resolution rules:

- plain paths (``/data/enc``) -> the local-OS fast path (open/os.replace/
  listdir), byte-for-byte the behavior the bench numbers were taken on;
- URIs (``s3://bucket/enc``, ``gs://...``, ``hdfs://...``, ``file://``)
  -> ``pyarrow.fs.FileSystem.from_uri`` in whichever process touches them;
- ``subtree+local:///abs/base`` -> ``SubTreeFileSystem`` over the local
  fs: a URI-derivable backend that exercises the full pyarrow.fs code
  path across Ray workers against a shared directory (the dev/test stand-
  in for an object store).

Commit semantics per backend:

- local / rename-capable fs: tmp file + atomic rename (the manifest file's
  existence is the commit point, exactly as before);
- object stores (no atomic rename): ONE ``open_output_stream`` put to the
  final content/partition-addressed name — visibility of a completed put
  is the store's atomicity, and partition ids/lineage tags are
  deterministic, so a retried task re-puts identical bytes to the
  identical key (idempotent, never torn across keys).
"""

from __future__ import annotations

import os

_SUBTREE_SCHEME = "subtree+local://"


def _parse(path: str):
    """(fs, fs_path) for URI paths, (None, path) for plain local paths."""
    if "://" not in path:
        return None, path
    from pyarrow import fs as pafs

    if path.startswith(_SUBTREE_SCHEME):
        rest = path[len(_SUBTREE_SCHEME):]
        # subtree+local:///abs/base//rel/inside  (base ends at the '//')
        base, sep, rel = rest.partition("//")
        if not sep:
            base, rel = rest, ""
        sub = pafs.SubTreeFileSystem(base or "/", pafs.LocalFileSystem())
        return sub, rel.lstrip("/") or "."
    fs, p = pafs.FileSystem.from_uri(path)
    return fs, p


def is_remote(path: str) -> bool:
    return "://" in path


def join(base: str, *parts: str) -> str:
    """Path join that preserves URI schemes (os.path.join would collapse
    '//')."""
    if "://" not in base:
        return os.path.join(base, *parts)
    out = base.rstrip("/")
    for p in parts:
        out += "/" + p.strip("/")
    return out


def makedirs(path: str) -> None:
    fs, p = _parse(path)
    if fs is None:
        os.makedirs(p, exist_ok=True)
    else:
        fs.create_dir(p, recursive=True)


def write_file_atomic(path: str, data: bytes) -> None:
    """Write ``data`` so a reader never observes a torn file at ``path``:
    tmp+rename where the backend has rename, single-put otherwise."""
    fs, p = _parse(path)
    if fs is None:
        tmp = f"{p}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, p)
        return
    from pyarrow import fs as pafs

    local_like = isinstance(fs, pafs.LocalFileSystem) or \
        isinstance(fs, pafs.SubTreeFileSystem)
    if local_like:
        tmp = f"{p}.tmp.{os.getpid()}"
        with fs.open_output_stream(tmp) as f:
            f.write(data)
        fs.move(tmp, p)
    else:
        with fs.open_output_stream(p) as f:
            f.write(data)


def read_file(path: str) -> bytes:
    fs, p = _parse(path)
    if fs is None:
        with open(p, "rb") as f:
            return f.read()
    with fs.open_input_stream(p) as f:
        return f.read()


def read_file_range(path: str, offset: int, length: int) -> bytes:
    """One byte-range read (a GET with Range on object stores)."""
    fs, p = _parse(path)
    if fs is None:
        with open(p, "rb") as f:
            f.seek(offset)
            return f.read(length)
    with fs.open_input_file(p) as f:
        f.seek(offset)
        return f.read(length)


def open_input(path: str):
    """pyarrow NativeFile / python file for random-access reads
    (pq.ParquetFile-compatible)."""
    fs, p = _parse(path)
    if fs is None:
        return p  # pq.ParquetFile accepts a path directly (fastest)
    return fs.open_input_file(p)


def exists(path: str) -> bool:
    fs, p = _parse(path)
    if fs is None:
        return os.path.exists(p)
    from pyarrow import fs as pafs

    return fs.get_file_info(p).type != pafs.FileType.NotFound


def listdir(path: str) -> list[str]:
    """Base names of files directly under ``path`` ([] when absent)."""
    fs, p = _parse(path)
    if fs is None:
        return os.listdir(p) if os.path.isdir(p) else []
    from pyarrow import fs as pafs

    try:
        infos = fs.get_file_info(pafs.FileSelector(p, recursive=False))
    except (FileNotFoundError, OSError):
        return []
    return [i.base_name for i in infos if i.type == pafs.FileType.File]


def remove(path: str) -> None:
    fs, p = _parse(path)
    if fs is None:
        os.remove(p)
    else:
        fs.delete_file(p)
