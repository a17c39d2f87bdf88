"""Token-window document chunking — the context-window prep stage.

Long documents must become model-sized pieces before tokenized training
batches exist; the standard form is a sliding token window with overlap
(stride < chunk size) so no boundary sentence is seen by zero chunks.
This is a pure JVM explode — split once, generate the window starts with
``sequence``, ``posexplode`` them, ``slice`` the token array per window:

    tokens = split(trim(text), '\\s+')
    starts = sequence(0, size(tokens) - 1, stride)
    chunk  = slice(tokens, start + 1, chunk_size)

Scale (100 TB): no shuffle, no UDF, no state — chunking is exactly as
cheap as a scan + explode, and the output inherits the input partitioning
(doc-contiguous chunks, which downstream tokenizers want). Row growth is
~n_tokens/stride per doc; cap abusive documents upstream with the F10
length guard, not here.

A real subword tokenizer (BPE) lives Python-side; the whitespace window
is the Spark-native form whose *plumbing* (counts, overlap, determinism)
is oracle-checked — swap the splitter for a Pandas-UDF tokenizer and the
shape of the plan is unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_by_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
    chunk_size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Explode each document into overlapping token windows.

    Output: ``*id_cols, chunk_idx, n_tokens, chunk_text`` — one row per
    window; ``chunk_idx`` counts windows per document from 0; the last
    window may be shorter than ``chunk_size``. Empty/whitespace-only
    documents produce no rows (every caller treats them as dropped
    upstream, and '' would otherwise tokenize to a phantom chunk).
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    if stride > chunk_size:
        raise ValueError(
            f"stride {stride} > chunk_size {chunk_size} would skip tokens entirely"
        )
    ids = list(id_cols)
    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        *ids, tokens.alias("__tokens")
    )
    exploded = base.select(
        *ids,
        "__tokens",
        F.posexplode(
            F.sequence(F.lit(0), F.size("__tokens") - 1, F.lit(stride))
        ).alias("chunk_idx", "__start"),
    )
    chunk = F.slice(F.col("__tokens"), F.col("__start") + 1, chunk_size)
    return exploded.select(
        *ids,
        "chunk_idx",
        F.size(chunk).alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )
