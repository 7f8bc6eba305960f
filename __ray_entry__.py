"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in orc_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: read documents ->
    tokenize (map_batches) -> stripe-encode to blobs+manifests (actor pool)
    -> decode from manifests -> verify token-array equality -> return the
    decoded Dataset."""
    from orc_ray.pipelines.decode import decode_dataset
    from orc_ray.pipelines.queries import encoded_dir, tokens_dataset
    from orc_ray.pipelines.verify import verify_encoded

    sf_dir = "/root/testdata/sf0.001"
    out = encoded_dir(sf_dir, fresh=True)
    res = verify_encoded(tokens_dataset(sf_dir), out)
    assert res["match"], f"round-trip mismatch: {res}"
    return decode_dataset(out)


def queries() -> dict[str, Callable[[str], Any]]:
    from orc_ray.pipelines import queries as q

    return {
        "tokenize_stats": q.q_tokenize_stats,
        "roundtrip_tokens": q.q_roundtrip_tokens,
        "manifest_stats": q.q_manifest_stats,
        "decode_projection": q.q_decode_projection,
    }


def oracle_sql() -> dict[str, str]:
    from orc_ray.pipelines import queries as q

    return {
        "tokenize_stats": q.SQL_TOKENIZE_STATS,
        "roundtrip_tokens": q.SQL_ROUNDTRIP_TOKENS,
        "manifest_stats": q.SQL_MANIFEST_STATS,
        "decode_projection": q.SQL_DECODE_PROJECTION,
    }
