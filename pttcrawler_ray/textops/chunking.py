"""Token-window chunking — the retrieval-side sibling of sequence
packing (:mod:`.packing`).

RAG / retrieval pipelines split every document into overlapping
token-window chunks before embedding; this is the standard sliding
window: chunk ``c`` of a doc covers tokens ``[c*stride, c*stride+size)``
(whitespace tokens, Python ``str.split()`` semantics), chunks start at
0 and advance by ``stride`` until the window reaches the end —
``n_chunks = 1 + ceil(max(n - size, 0) / stride)``; empty docs emit no
chunks.  Chunk text is the tokens joined with a single space (the
tokenizer-facing form; original inter-token whitespace is not
preserved, by spec).

Fully vectorized and SHUFFLE-FREE: one ``map_batches`` pass builds all
chunk token ranges as a single gather index (``pc.take`` on the flat
token array + ``ListArray`` offsets + ``pc.binary_join``) — no Python
loop over docs or chunks, no exchange; output size ≈ input × (size /
stride) expansion, streamed block by block.

The DuckDB oracle is a pure-SQL view over the same spec
(``string_split_regex`` + list slicing + ``array_to_string``), so the
comparison runs at any scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .analysis import _tokens_flat


def chunk_batch(batch: pa.Table, *, size: int, stride: int, id_col: str,
                text_col: str) -> pa.Table:
    flat, parents, counts = _tokens_flat(batch[text_col])
    counts = counts.astype(np.int64)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    over = np.maximum(counts - size, 0)
    nc = np.where(counts == 0, 0, 1 + (over + stride - 1) // stride)
    doc_of = np.repeat(np.arange(len(counts)), nc)
    nc_base = np.concatenate([[0], np.cumsum(nc)])[:-1]
    rank = np.arange(len(doc_of)) - np.repeat(nc_base, nc)
    tok_base = np.concatenate([[0], np.cumsum(counts)])[:-1][doc_of]
    start = rank * stride
    length = np.minimum(size, counts[doc_of] - start)
    offs = np.concatenate([[0], np.cumsum(length)])
    idx = (np.arange(offs[-1], dtype=np.int64)
           - np.repeat(offs[:-1], length)
           + np.repeat(tok_base + start, length))
    taken = pc.take(flat, pa.array(idx, pa.int64()))
    chunks = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), taken)
    return pa.table({
        id_col: pa.array(ids[doc_of], pa.int64()),
        "chunk_id": pa.array(rank, pa.int64()),
        "n_tokens": pa.array(length, pa.int64()),
        "text": pc.binary_join(chunks, " "),
    })


def chunk_docs(docs_ds, size: int = 128, stride: int = 96,
               id_col: str = "doc_id", text_col: str = "text"):
    """Sliding token-window chunks: rows ``(id_col, chunk_id, n_tokens,
    text)``, one streaming pass, no shuffle."""
    if size < 1 or stride < 1:
        raise ValueError(f"size and stride must be >= 1, "
                         f"got size={size} stride={stride}")
    return docs_ds.map_batches(
        chunk_batch,
        fn_kwargs={"size": int(size), "stride": int(stride),
                   "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow")


def chunk_sql(table: str, size: int = 128, stride: int = 96,
              id_col: str = "doc_id", text_col: str = "text") -> str:
    """The DuckDB twin of :func:`chunk_docs` (1-based inclusive list
    slices; ``range(nc)`` enumerates chunk ids)."""
    return f"""
WITH toks AS (
  SELECT {id_col},
         list_filter(string_split_regex(coalesce({text_col}, ''), '\\s+'),
                     x -> x <> '') AS tl
  FROM {table}
), c AS (
  SELECT {id_col}, tl, len(tl) AS n,
         CASE WHEN len(tl) = 0 THEN 0
              ELSE 1 + CAST(ceil(greatest(len(tl) - {size}, 0)
                                 / {stride}.0) AS BIGINT)
         END AS nc
  FROM toks
)
SELECT {id_col}, CAST(i AS BIGINT) AS chunk_id,
       least({size}, n - i * {stride}) AS n_tokens,
       array_to_string(tl[i * {stride} + 1 : i * {stride} + {size}],
                       ' ') AS text
FROM c, unnest(range(nc)) AS g(i)
"""
