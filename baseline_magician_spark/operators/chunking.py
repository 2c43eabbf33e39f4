"""Overlapping text chunking — the RAG / retrieval-corpus prep
operator: split each document into fixed-size character windows with a
configurable overlap, emitting a deterministic per-chunk manifest.

Scale shape: chunk starts are computed with ``sequence`` +
``posexplode`` in ONE narrow projection pass — no shuffle, no Python,
no driver loop; output row count is ``sum(ceil((len - size) / stride))
+ n_docs``, linear in corpus bytes. At 100 TB this is a map-only stage
that preserves the input partitioning (chunks of a document stay in
its partition, which downstream embedding stages want).

Chunk layout (size S, overlap V, stride = S - V):
  start_i = i * stride,  i = 0 .. n_chunks-1
  n_chunks = 1                          if len <= S
             ceil((len - S) / stride)+1 otherwise   (tail covered)
The final chunk may be shorter than S; every character belongs to at
least one chunk; consecutive chunks share exactly V characters except
possibly the last pair.

No reference equivalent (the reference has no text surface) — this is
part of the training-data-pipeline extension (SURVEY §7 phase 6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_starts(length: Column, size: int, overlap: int) -> Column:
    """array<int> of chunk start offsets (0-based) for a text of the
    given length."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    n_chunks = F.when(length <= size, F.lit(1)).otherwise(
        F.floor((length - size + stride - 1) / stride).cast("int") + 1
    )
    return F.sequence(
        F.lit(0), (n_chunks - 1) * stride, F.lit(stride)
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    size: int,
    overlap: int,
) -> DataFrame:
    """One output row per chunk: (id, chunk_id, chunk_start, chunk_len,
    chunk_text). chunk_id is the 0-based window index."""
    starts = chunk_starts(F.length(F.col(text_col)), size, overlap)
    exploded = docs.select(
        F.col(id_col),
        F.col(text_col).alias("_text"),
        F.posexplode(starts).alias("chunk_id", "chunk_start"),
    )
    chunk_text = F.substring(
        F.col("_text"), F.col("chunk_start") + 1, size
    )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.col("chunk_start"),
        F.length(chunk_text).alias("chunk_len"),
        chunk_text.alias("chunk_text"),
    )
