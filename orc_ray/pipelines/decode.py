"""Decode pipeline: manifests -> stripe blobs -> Arrow batches.

The analogue of Reader/Cursor (reader.go:335-338, cursor.go:29-176): the
manifest parquet directory is the footer; ``decode_dataset`` reads it with
``ray.data.read_parquet`` and fans stripe decodes out via ``map_batches``.
Column projection decodes only the selected columns' streams (Select,
cursor.go:38-41). Each manifest row yields one output block, so block sizes
track stripe sizes and the stream stays bounded.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from .._tuning import remote_args
from ..state import manifest as mf
from ..stripe import decode_blob


class StripeDecoder:
    def __init__(self, out_dir: str, columns: list[str] | None = None):
        from .._tuning import prewarm

        prewarm()
        self.blobs_dir = mf.blobs_dir(out_dir)
        self.columns = columns

    def __call__(self, man: pa.Table):
        for row in man.select(["blob_path", "meta_json"]).to_pylist():
            with open(os.path.join(self.blobs_dir, row["blob_path"]), "rb") as f:
                blob = f.read()
            meta = json.loads(row["meta_json"])
            yield decode_blob(blob, meta, columns=self.columns)


def decode_dataset(
    out_dir: str,
    columns: list[str] | None = None,
    concurrency: int | tuple[int, int] | None = None,
):
    """Lazy decoded Dataset over an encoded directory."""
    import ray.data

    from .encode import _default_concurrency

    if concurrency is None:
        concurrency = _default_concurrency()
    man = ray.data.read_parquet(mf.manifest_dir(out_dir))
    return man.map_batches(
        StripeDecoder,
        fn_constructor_kwargs={"out_dir": out_dir, "columns": columns},
        batch_size=None,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
        **remote_args(),
    )


def decode_table(out_dir: str, columns: list[str] | None = None) -> pa.Table:
    """Driver-side decode of a (small) encoded directory without Ray — used
    by tests and tools (the orc2csv analogue)."""
    man = mf.read_manifest(out_dir)
    dec = StripeDecoder(out_dir, columns)
    tables = [t for t in dec(man)]
    return pa.concat_tables(tables) if tables else None
