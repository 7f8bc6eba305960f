"""Deduplication operators over the ``documents`` table.

- exact:      md5(text) key -> hash-partitioned group-by, keep min(doc_id)
- minhash:    3-word shingles -> 128 minhashes -> 32 bands x 4 rows -> LSH
              bucket groupby -> candidate pairs -> EXACT shingle-Jaccard
              verification (so output equals the exact >=threshold pair set
              with recall ~1-1e-7 at t=0.8)
- simhash:    64-bit simhash of word hashes; near-dup = hamming distance <= k
- ngram:      exact pairwise shingle-Jaccard (the verification kernel,
              usable standalone at small scale / per-bucket at large scale)
- embedding:  cosine >= threshold near-dup pairs over the embeddings table
              (blocked matmul; the broadcast-small-side pattern)

Scale notes: the only wide op is the LSH/bucket groupby on band keys
(band buckets co-locate candidates — skewed giant buckets are capped).
Minhashing itself is embarrassingly parallel map_batches; pair verification
happens per bucket group. Exact dedup's group-by ships only (key, doc_id)
pairs, never text.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

NUM_HASHES = 128
BANDS = 32
ROWS_PER_BAND = NUM_HASHES // BANDS
_MERSENNE = (1 << 61) - 1


def _word_shingles(texts: pa.Array, k: int = 3) -> list[np.ndarray]:
    """Per-doc arrays of 64-bit k-word-shingle hashes (vectorized across the
    batch's concatenated words)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    out = []
    for t in texts.to_pylist():
        words = t.split(" ")
        if len(words) < k:  # no k-shingles: doc never pairs (matches SQL)
            out.append(np.empty(0, dtype=np.uint64))
            continue
        sh = np.array(
            [hash_bytes(" ".join(words[i: i + k]).encode())
             for i in range(len(words) - k + 1)],
            dtype=np.uint64,
        )
        out.append(np.unique(sh))
    return out


def hash_bytes(b: bytes) -> int:
    """Deterministic 64-bit FNV-1a (stable across processes, unlike
    Python's salted hash())."""
    h = 0xCBF29CE484222325
    for byte in b:
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


_rng = np.random.default_rng(12345)
_A = (_rng.integers(1, _MERSENNE, NUM_HASHES, dtype=np.int64)).astype(np.uint64)
_B = (_rng.integers(0, _MERSENNE, NUM_HASHES, dtype=np.int64)).astype(np.uint64)


def minhash_signature(shingles: np.ndarray) -> np.ndarray:
    """128 minhashes via (a*x+b) mod p permutations, vectorized."""
    if not len(shingles):
        return np.full(NUM_HASHES, np.uint64(_MERSENNE), dtype=np.uint64)
    x = shingles[:, None].astype(np.uint64)
    hv = (x * _A[None, :] + _B[None, :]) % np.uint64(_MERSENNE)
    return hv.min(axis=0)


def minhash_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> one row per (doc, band): band key + signature."""
    shingle_sets = _word_shingles(batch.column("text"))
    doc_ids = batch.column("doc_id").cast(pa.int64()).to_pylist()
    rows_doc, rows_band, rows_key, rows_nsh = [], [], [], []
    for did, sh in zip(doc_ids, shingle_sets):
        sig = minhash_signature(sh)
        bands = sig.reshape(BANDS, ROWS_PER_BAND)
        for b in range(BANDS):
            key = hash_bytes(bytes([b]) + bands[b].tobytes())
            rows_doc.append(did)
            rows_band.append(b)
            rows_key.append(key)
            rows_nsh.append(len(sh))
    return pa.table({
        "doc_id": pa.array(rows_doc, type=pa.int64()),
        "band": pa.array(rows_band, type=pa.int64()),
        "bucket": pa.array(rows_key, type=pa.uint64()),
        "n_shingles": pa.array(rows_nsh, type=pa.int64()),
    })


def exact_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def minhash_dedup_pairs(ds, threshold: float = 0.8):
    """Full LSH pipeline: minhash -> bucket groupby -> per-bucket candidate
    pairs -> exact-Jaccard verify. Returns a Dataset of
    (doc_a, doc_b, jaccard_x1000) pairs with doc_a < doc_b.

    The shingle sets needed for verification are recomputed per bucket from
    the docs' text (shipped alongside); at larger scale you'd broadcast a
    doc->shingle-sketch store instead.
    """
    sigs = ds.map_batches(
        lambda b: _minhash_with_text(b), batch_format="pyarrow"
    )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2 or n > 200:  # cap pathological buckets (skew guard)
            return _pairs_table([], [], [])
        docs = group.column("doc_id").to_pylist()
        texts = group.column("text")
        sets = _word_shingles(texts)
        thr_x1000 = int(round(threshold * 1000))
        aa, bb, jj = [], [], []
        for i in range(n):
            for j in range(i + 1, n):
                if docs[i] == docs[j]:
                    continue
                inter = len(np.intersect1d(sets[i], sets[j], assume_unique=True))
                union = len(sets[i]) + len(sets[j]) - inter
                # integer math exactly mirrors the SQL oracle
                if union and inter * 1000 >= thr_x1000 * union:
                    a, b = sorted((docs[i], docs[j]))
                    aa.append(a)
                    bb.append(b)
                    jj.append(inter * 1000 // union)
        return _pairs_table(aa, bb, jj)

    pairs = sigs.groupby("bucket").map_groups(bucket_pairs, batch_format="pyarrow")
    # dedupe pairs found in multiple bands: tiny result, driver-side unique
    t = pa.Table.from_pylist(pairs.take_all()) if True else None
    if t is None or t.num_rows == 0:
        return _pairs_table([], [], [])
    import pyarrow.compute as pc  # noqa: F401

    df = t.to_pandas().drop_duplicates(["doc_a", "doc_b"]).sort_values(
        ["doc_a", "doc_b"]
    )
    return pa.Table.from_pandas(df, preserve_index=False)


def _minhash_with_text(batch: pa.Table) -> pa.Table:
    out = minhash_batch(batch)
    texts = batch.column("text").to_pylist()
    ids = batch.column("doc_id").cast(pa.int64()).to_pylist()
    lookup = dict(zip(ids, texts))
    t = [lookup[d] for d in out.column("doc_id").to_pylist()]
    return out.append_column("text", pa.array(t, type=pa.string()))


def _pairs_table(a, b, j) -> pa.Table:
    return pa.table({
        "doc_a": pa.array(a, type=pa.int64()),
        "doc_b": pa.array(b, type=pa.int64()),
        "jaccard_x1000": pa.array(j, type=pa.int64()),
    })


# --- simhash ---------------------------------------------------------------

def simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit simhash over word FNV hashes, vectorized per doc."""
    texts = batch.column("text").to_pylist()
    out = []
    for t in texts:
        hs = np.array([hash_bytes(w.encode()) for w in t.split(" ")],
                      dtype=np.uint64)
        if not len(hs):
            out.append(0)
            continue
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        v = (bits * 2 - 1).sum(axis=0)
        sim = np.uint64(0)
        sim = int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
            dtype=np.uint64))
        out.append(sim)
    return pa.table({
        "doc_id": batch.column("doc_id").cast(pa.int64()),
        "simhash": pa.array(out, type=pa.uint64()),
    })


def simhash_near_pairs(table: pa.Table, max_hamming: int = 3) -> pa.Table:
    """Near-dup pairs by hamming distance (block by 16-bit chunks so a pair
    within distance k shares at least one of 4 chunks exactly — the
    standard simhash blocking trick)."""
    ids = np.asarray(table.column("doc_id").to_pylist(), dtype=np.int64)
    sims = np.asarray(table.column("simhash").to_pylist(), dtype=np.uint64)
    seen = set()
    aa, bb, hh = [], [], []
    for c in range(4):
        chunk = (sims >> np.uint64(16 * c)) & np.uint64(0xFFFF)
        order = np.argsort(chunk, kind="stable")
        sc = chunk[order]
        bounds = np.flatnonzero(np.diff(sc)) + 1
        groups = np.split(order, bounds)
        for g in groups:
            if len(g) < 2 or len(g) > 500:
                continue
            for i in range(len(g)):
                for j in range(i + 1, len(g)):
                    a, b = int(ids[g[i]]), int(ids[g[j]])
                    if a == b:
                        continue
                    a, b = min(a, b), max(a, b)
                    if (a, b) in seen:
                        continue
                    d = bin(int(sims[g[i]]) ^ int(sims[g[j]])).count("1")
                    if d <= max_hamming:
                        seen.add((a, b))
                        aa.append(a)
                        bb.append(b)
                        hh.append(d)
    order = np.lexsort((bb, aa)) if aa else np.empty(0, np.int64)
    return pa.table({
        "doc_a": pa.array(np.asarray(aa)[order] if len(aa) else [], type=pa.int64()),
        "doc_b": pa.array(np.asarray(bb)[order] if len(bb) else [], type=pa.int64()),
        "hamming": pa.array(np.asarray(hh)[order] if len(hh) else [], type=pa.int64()),
    })


# --- embedding near-dup ----------------------------------------------------

def embedding_near_pairs(table: pa.Table, threshold: float = 0.95) -> pa.Table:
    """Cosine >= threshold pairs via blocked matmul (all-pairs at test
    scale; per-bucket after an IVF pass at cluster scale)."""
    emb = np.vstack([np.asarray(v, dtype=np.float64)
                     for v in table.column("embedding").to_pylist()])
    ids = np.asarray(table.column("vec_id").to_pylist(), dtype=np.int64)
    norms = np.linalg.norm(emb, axis=1)
    norms[norms == 0] = 1.0
    unit = emb / norms[:, None]
    aa, bb = [], []
    block = 512
    for s in range(0, len(unit), block):
        sims = unit[s: s + block] @ unit.T
        for i in range(sims.shape[0]):
            gi = s + i
            js = np.flatnonzero(sims[i] >= threshold)
            for j in js:
                if j <= gi:
                    continue
                aa.append(int(ids[gi]))
                bb.append(int(ids[j]))
    # pair membership only: float similarity values are not emitted because
    # reference SQL engines compute float32 cosines with a different
    # accumulation order (not bit-stable across engines)
    return pa.table({
        "vec_a": pa.array(aa, type=pa.int64()),
        "vec_b": pa.array(bb, type=pa.int64()),
    })
