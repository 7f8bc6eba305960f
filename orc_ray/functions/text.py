"""Text analysis stages: token counting, quality scoring, language ID,
document fingerprinting.

Each is a vectorized per-batch transform over the ``documents`` table.
Where an exact DuckDB mirror exists it is defined alongside (used by the
correctness oracle); heuristics without a SQL equivalent (language ID) get
rows-only checks.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --- token counting --------------------------------------------------------

# BPE-ish pre-tokenizer: word pieces or single non-space punctuation
TOKEN_RE = re.compile(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]")
TOKEN_RE_SQL = "[A-Za-z0-9_]+|[^A-Za-z0-9_ \\t\\n]"


class TokenCounter:
    """Actor-pool stage. The BPE-ish count (word-char runs + punctuation
    chars) is computed vectorized over the batch's concatenated byte
    buffer (texthash.bpe_token_counts) — equivalent to len(findall) of
    TOKEN_RE but with no per-row Python; the regex remains only as the
    non-ASCII fallback inside the kernel."""

    def __init__(self, pattern: str = TOKEN_RE.pattern):
        self.custom = pattern != TOKEN_RE.pattern
        self.re = re.compile(pattern)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .texthash import bpe_token_counts

        if self.custom:
            # arbitrary pattern: the byte-class kernel only models the
            # default tokenizer, so honor the contract with the regex
            texts = batch.column("text").to_pylist()
            counts = np.array([len(self.re.findall(t)) for t in texts],
                              dtype=np.int64)
        else:
            counts = bpe_token_counts(batch.column("text"))
        ws = pc.count_substring(batch.column("text"), " ")
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "n_words": pc.add(ws, 1).cast(pa.int64()),
            "n_bpe_tokens": pa.array(counts, type=pa.int64()),
        })


SQL_TOKEN_COUNT = (
    "SELECT doc_id, len(string_split(text, ' ')) AS n_words, "
    f"len(regexp_extract_all(text, '{TOKEN_RE_SQL}')) AS n_bpe_tokens "
    "FROM documents"
)


# --- quality scoring -------------------------------------------------------

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def quality_batch(batch: pa.Table) -> pa.Table:
    """Purely arithmetic quality features so the SQL mirror is exact:
    n_chars, n_words, mean_word_len (x1000, integer), stopword_hits,
    upper-bounded length score."""
    text = batch.column("text")
    n_chars = pc.utf8_length(text).cast(pa.int64())
    n_words = pc.add(pc.count_substring(text, " "), 1).cast(pa.int64())
    mean_wl = pc.cast(
        pc.divide(
            pc.multiply(pc.subtract(n_chars, pc.subtract(n_words, 1)), 1000),
            n_words,
        ),
        pa.int64(),
    )
    stop_hits = None
    for w in STOPWORDS:
        h = pc.count_substring(text, f" {w} ").cast(pa.int64())
        stop_hits = h if stop_hits is None else pc.add(stop_hits, h)
    length_score = pc.min_element_wise(n_words, 100).cast(pa.int64())
    return pa.table({
        "doc_id": batch.column("doc_id").cast(pa.int64()),
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len_x1000": mean_wl,
        "stopword_hits": stop_hits,
        "length_score": length_score,
    })


_sw_sql = " + ".join(
    f"len(text) - len(replace(text, ' {w} ', '')) "
    f"-- {w}\n      " for w in []
)
# count_substring(text, pat) == (len(text)-len(replace(text,pat,'')))/len(pat)
_stop_terms = " + ".join(
    f"(len(text) - len(replace(text, ' {w} ', ''))) // {len(w) + 2}"
    for w in STOPWORDS
)
SQL_QUALITY = (
    "SELECT doc_id, length(text) AS n_chars, "
    "len(string_split(text, ' ')) AS n_words, "
    "(length(text) - (len(string_split(text, ' ')) - 1)) * 1000 "
    "  // len(string_split(text, ' ')) AS mean_word_len_x1000, "
    f"CAST({_stop_terms} AS BIGINT) AS stopword_hits, "
    "CAST(least(len(string_split(text, ' ')), 100) AS BIGINT) AS length_score "
    "FROM documents"
)


# --- language ID (n-gram heuristic; no SQL mirror) -------------------------

_LANG_MARKERS = {
    "en": (" the ", " and ", " of ", " is "),
    "es": (" el ", " la ", " de ", " que "),
    "de": (" der ", " die ", " und ", " ist "),
    "fr": (" le ", " la ", " et ", " est "),
    "zh": ("的", "了", "是", "我"),
}


class LangId:
    """Marker-frequency heuristic; scores computed vectorized per batch."""

    def __init__(self, markers: dict | None = None):
        self.markers = markers or _LANG_MARKERS

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n = batch.num_rows
        scores = np.zeros((len(self.markers), n), dtype=np.int64)
        langs = list(self.markers)
        for i, lang in enumerate(langs):
            for m in self.markers[lang]:
                scores[i] += pc.count_substring(text, m).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
        best = np.argmax(scores, axis=0)
        none = scores.sum(axis=0) == 0
        pred = np.array(langs, dtype=object)[best]
        pred[none] = "unknown"
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "pred_lang": pa.array(pred.tolist(), type=pa.string()),
        })


def _sql_marker_count(marker: str) -> str:
    """DuckDB expression for pc.count_substring(text, marker): both count
    non-overlapping occurrences left-to-right."""
    esc = marker.replace("'", "''")
    return (f"(length(text) - length(replace(text, '{esc}', '')))"
            f" // length('{esc}')")


def _build_langid_sql() -> str:
    """Exact mirror of LangId: per-language marker-count sums, argmax with
    first-in-dict tie order, 'unknown' when every score is zero."""
    langs = list(_LANG_MARKERS)
    score_exprs = ", ".join(
        "(" + " + ".join(_sql_marker_count(m) for m in _LANG_MARKERS[lang])
        + f") AS s_{lang}"
        for lang in langs
    )
    all_zero = " AND ".join(f"s_{lang} = 0" for lang in langs)
    cases = []
    for i, lang in enumerate(langs):
        rest = langs[i + 1:]
        if rest:
            cond = " AND ".join(f"s_{lang} >= s_{r}" for r in rest)
            cases.append(f"WHEN {cond} THEN '{lang}'")
        else:
            cases.append(f"ELSE '{lang}'")
    case_sql = " ".join(cases)
    return (
        f"WITH s AS (SELECT doc_id, {score_exprs} FROM documents) "
        f"SELECT doc_id, CASE WHEN {all_zero} THEN 'unknown' "
        f"{case_sql} END AS pred_lang FROM s"
    )


# --- fingerprinting --------------------------------------------------------

def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """md5 content fingerprint (SQL-mirrorable) + a 64-bit rolling
    Karp-Rabin hash (vectorized) for streaming dedup keys."""
    texts = batch.column("text")
    md5s = [hashlib.md5(t.encode()).hexdigest() for t in texts.to_pylist()]
    roll = _rolling_hash(texts)
    return pa.table({
        "doc_id": batch.column("doc_id").cast(pa.int64()),
        "md5": pa.array(md5s, type=pa.string()),
        "rolling64": pa.array(roll, type=pa.uint64()),
    })


def _rolling_hash(text: pa.Array | pa.ChunkedArray) -> np.ndarray:
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    bufs = text.buffers()
    off_dtype = np.int64 if pa.types.is_large_string(text.type) else np.int32
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
        text.offset: text.offset + len(text) + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    blob = data[offsets[0]: offsets[-1]]
    off = offsets - offsets[0]
    lengths = np.diff(off)
    P = np.uint64(1099511628211)
    pos = np.arange(len(blob), dtype=np.int64) - np.repeat(off[:-1], lengths)
    from ..pipelines.verify import _pow_mod64

    terms = (blob.astype(np.uint64) + np.uint64(0x9E37)) * _pow_mod64(P, pos)
    out = np.zeros(len(lengths), dtype=np.uint64)
    nz = lengths > 0
    if nz.any():
        out[nz] = np.add.reduceat(terms, off[:-1][nz])
    return out


SQL_FINGERPRINT = "SELECT doc_id, md5(text) AS md5 FROM documents"

SQL_LANGID = _build_langid_sql()
