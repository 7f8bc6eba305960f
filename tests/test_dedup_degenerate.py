"""Adversarial corpus shapes through the near-dup pipelines.

Probes the edges the happy-path fixtures never hit: empty texts, one-word
docs (no complete 3-shingle), and a several-hundred-copy identical
cluster (one LSH bucket holding the whole cluster — the skew case the
band-partition guard exists for). Both verify paths of minhash and the
simhash pipeline must agree with first principles: identical docs pair at
jaccard 1000 / hamming 0, degenerate docs neither crash nor emit bogus
pairs, and the pair set is exactly the within-cluster closure.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from orc_ray.functions import dedup


def _docs_table():
    rng = np.random.default_rng(99)
    rows = []
    # a 300-copy identical cluster: all land in the same LSH buckets
    cluster = "the quick brown fox jumps over the lazy dog again and again"
    rows += [(i, cluster) for i in range(300)]
    # empty and whitespace-only texts
    rows += [(1000, ""), (1001, " "), (1002, "   ")]
    # one- and two-word docs: shorter than the 3-word shingle window
    rows += [(1100, "hello"), (1101, "hello world"), (1102, "solo")]
    # unique long docs: must pair with nothing
    words = [f"w{j}" for j in range(500)]
    for i in range(40):
        rows.append((2000 + i,
                     " ".join(rng.choice(words, 60, replace=False))))
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    return t


def _pairs(ds):
    tabs = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tabs:
        return set()
    t = pa.concat_tables(tabs)
    return set(zip(t.column("doc_a").to_pylist(),
                   t.column("doc_b").to_pylist()))


CLUSTER_PAIRS = {(a, b) for a in range(300) for b in range(300) if a < b}


@pytest.mark.parametrize("verify", ["broadcast", "join"])
def test_minhash_identical_cluster_and_degenerates(ray_session, verify):
    ds = rd.from_arrow(_docs_table())
    got = _pairs(dedup.minhash_dedup_pairs(ds, threshold=0.8, verify=verify))
    # exactly the 300-copy cluster's closure: no degenerate or unique doc
    # may appear on either side of any pair
    assert got == CLUSTER_PAIRS
    t = pa.concat_tables(list(
        dedup.minhash_dedup_pairs(ds, threshold=0.8, verify=verify)
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    assert set(t.column("jaccard_x1000").to_pylist()) == {1000}


def test_simhash_identical_cluster_and_degenerates(ray_session):
    ds = rd.from_arrow(_docs_table())
    got = _pairs(dedup.simhash_dedup_pairs(ds, max_hamming=0))
    # hamming 0 = identical signatures: the cluster pairs, plus any
    # accidental signature collisions among degenerate docs (empty and
    # whitespace-only texts all hash to the same signature — that IS
    # near-duplication under simhash semantics)
    assert CLUSTER_PAIRS <= got
    short_ids = {1000, 1001, 1002, 1100, 1101, 1102}
    extras = got - CLUSTER_PAIRS
    assert all(a in short_ids and b in short_ids for a, b in extras)
    # unique long docs never pair
    assert not any(a >= 2000 or b >= 2000 for a, b in got)


def test_minhash_all_empty_corpus(ray_session):
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["", "", ""], pa.string()),
    })
    for verify in ("broadcast", "join"):
        got = _pairs(dedup.minhash_dedup_pairs(rd.from_arrow(t),
                                               threshold=0.8, verify=verify))
        assert got == set()
