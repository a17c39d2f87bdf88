"""Token-window document chunking — the context-window prep stage.

Long documents must become model-sized pieces before tokenized training
batches exist; the standard form is a sliding token window with overlap
(stride < chunk size) so no boundary sentence is seen by zero chunks.
This is a pure JVM explode — split once, generate the window starts with
``sequence``, ``posexplode`` them, ``slice`` the token array per window:

    tokens = filter(split(trim(text), WS_RE), t -> t <> '')  # explicit class, no phantom '' tokens
    starts = sequence(0, last_start, stride)  # bounded so no window is contained in the previous
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

#: Whitespace class of the cross-engine tokenizer contract, spelled out
#: EXPLICITLY: Java's ``\s`` is ``[ \t\n\x0B\f\r]`` but RE2's (DuckDB's
#: regex engine) ``\s`` omits vertical tab, so a bare ``\s+`` tokenizes
#: ``'a\x0Bb'`` as two tokens on Spark and one on the oracle (review
#: r10). Both dialects parse this class identically, and it equals Java
#: ``\s`` exactly, so Spark-side behavior is unchanged. Every whitespace
#: tokenizer in the package (here and queries/text.py) and every oracle
#: string must use this class — tests/test_core.py greps for bare ``\s``.
WS_RE = r"[ \t\n\x0B\f\r]+"


def _tokens_arr(col) -> F.Column:
    """Document tokens with empty strings removed: ``trim()`` strips only
    ASCII spaces, so a doc bounded by tab/newline splits to leading/
    trailing '' tokens — off-by-one token counts, a trailing space in the
    last chunk's text, and whitespace-only docs passing the emptiness
    check (review r11; same phantom-token class operators/bpe.py
    initial_vocab already filters). Oracles mirror with ``list_filter``."""
    return F.filter(F.split(F.trim(col), WS_RE), lambda t: F.length(t) > 0)


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
    base = df.select(*ids, _tokens_arr(F.col(text_col)).alias("__tokens")).filter(
        F.size("__tokens") > 0
    )
    # last window start: a start s > 0 whose PREVIOUS window already reached
    # the document end (s - stride + chunk_size >= n) would emit a window
    # fully contained in that previous one — duplicated training content
    # (review r11); bound the grid at n - chunk_size + stride - 1 instead
    # of n - 1. stride == chunk_size (no overlap) keeps the old grid.
    n = F.size("__tokens")
    last_start = F.when(
        n > chunk_size, n - F.lit(chunk_size) + F.lit(stride) - 1
    ).otherwise(F.lit(0))
    exploded = base.select(
        *ids,
        "__tokens",
        F.posexplode(F.sequence(F.lit(0), last_start, F.lit(stride))).alias(
            "chunk_idx", "__start"
        ),
    )
    chunk = F.slice(F.col("__tokens"), F.col("__start") + 1, chunk_size)
    return exploded.select(
        *ids,
        "chunk_idx",
        F.size(chunk).alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def chunk_content_defined(
    df: DataFrame,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
    divisor: int = 16,
) -> DataFrame:
    """Content-defined chunking: boundaries picked by token content, not
    position (the rsync/Gear/CDC family, at token granularity).

    A chunk ends after any token whose md5 bucket satisfies
    ``bucket % divisor == 0`` (expected chunk length = ``divisor``
    tokens), plus the document end. Because a boundary depends only on
    the token itself, an insertion near the top of a document shifts the
    ONE chunk it lands in — every later chunk keeps its exact text and
    hash, which is what makes CDC chunks dedup-stable across document
    revisions (fixed-width windows re-align everything downstream of an
    edit; compare :func:`chunk_by_tokens`).

    Output matches :func:`chunk_by_tokens`: ``*id_cols, chunk_idx,
    n_tokens, chunk_text``; empty/whitespace-only docs produce no rows.

    Scale (100 TB): map-side only — the boundary flags, span assembly and
    slicing are linear array kernels per document (no per-index
    ``element_at`` lookups, no window, no shuffle); output inherits the
    input partitioning exactly like the fixed-width chunker. Production
    CDC adds min/max span bounds; this form keeps the pure hash rule the
    oracle can replay.
    """
    if divisor <= 1:
        raise ValueError("divisor must be > 1 (expected chunk length)")
    ids = list(id_cols)
    base = df.select(*ids, _tokens_arr(F.col(text_col)).alias("__tokens")).filter(
        F.size("__tokens") > 0
    )
    n = F.size("__tokens")
    # one linear pass marks every token's (1-based pos, is-boundary) —
    # NOT sequence+element_at, which is per-access bounds-checked
    marked = F.transform(
        F.col("__tokens"),
        lambda t, i: F.struct(
            (i + 1).alias("pos"),
            (
                (F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % divisor)
                == 0
            ).alias("b"),
        ),
    )
    # interior boundary positions (a boundary on the last token is the
    # document end anyway; keeping it would emit an empty phantom span)
    bpos = F.transform(
        F.filter(marked, lambda s: s["b"] & (s["pos"] < n)), lambda s: s["pos"]
    )
    starts = F.concat(F.array(F.lit(1)), F.transform(bpos, lambda p: p + 1))
    ends = F.concat(bpos, F.array(n))
    spans = F.zip_with(starts, ends, lambda s, e: F.struct(s.alias("s"), e.alias("e")))
    rows = base.select(
        *ids, "__tokens", F.posexplode(spans).alias("chunk_idx", "__span")
    )
    chunk = F.slice(
        F.col("__tokens"),
        F.col("__span.s"),
        F.col("__span.e") - F.col("__span.s") + 1,
    )
    return rows.select(
        *ids,
        "chunk_idx",
        F.size(chunk).alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def scrub_boilerplate_segments(
    df: DataFrame,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
    segment_tokens: int = 16,
    max_doc_freq: int = 2,
) -> DataFrame:
    """Corpus-level boilerplate removal (RefinedWeb/CCNet-style line dedup,
    re-expressed over token segments since the corpus may not be line-
    structured): a segment appearing in more than ``max_doc_freq`` distinct
    documents is boilerplate (headers, footers, navigation, license
    blurbs) and is removed from every document; the remaining segments are
    reassembled in original order.

    Output: ``*id_cols, n_segments, n_removed, clean_text`` — one row per
    non-empty input document.

    Plan shape (100 TB): segment via :func:`chunk_by_tokens` with
    stride == size (scan + explode, no shuffle); ONE aggregate builds the
    hot-segment set (distinct segments with doc-frequency > K — bounded
    by total_segments/K, usually small but NOT guaranteed so on a
    boilerplate-heavy corpus, hence no forced broadcast: AQE picks the
    anti-join strategy from the observed size); one final aggregate per
    document reassembles. The
    in-order reassembly uses ``array_sort`` over (chunk_idx, text) structs
    inside the aggregate — no window, no per-doc sort shuffle beyond the
    groupBy itself.
    """
    from functools import reduce
    from operator import and_

    ids = list(id_cols)
    # materialize the segment relation once: it feeds three subtrees (hot-set
    # aggregate, anti-join probe, per-doc totals) that would otherwise each
    # re-run the corpus scan + explode — two redundant full passes at scale.
    # persist, not localCheckpoint (review r11): the relation is
    # corpus-sized, and a checkpoint stores non-replicated blocks with the
    # lineage truncated — one lost executor kills the job; persisted blocks
    # are recomputable and the plan needs no truncation here (no iteration).
    segs = chunk_by_tokens(
        df, text_col, ids, chunk_size=segment_tokens, stride=segment_tokens
    ).persist()
    hot = (
        segs.groupBy("chunk_text")
        .agg(F.countDistinct(*ids).alias("__df"))
        .filter(F.col("__df") > max_doc_freq)
        .select("chunk_text")
    )
    # no forced broadcast (review r11): hot is bounded only by
    # total_segments / max_doc_freq — on a boilerplate-heavy corpus that is
    # a large fraction of all distinct segments, and a pinned broadcast
    # would OOM the driver at scale; AQE runtime-broadcasts whenever the
    # set is genuinely small, which is strictly safer
    kept = segs.join(hot, "chunk_text", "left_anti")
    totals = segs.groupBy(*ids).agg(F.count(F.lit(1)).alias("n_segments"))
    reassembled = kept.groupBy(*ids).agg(
        F.count(F.lit(1)).alias("__n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_text"))),
                lambda s: s["chunk_text"],
            ),
        ).alias("clean_text"),
    )
    # NULL-safe id join (review r11): a document with a NULL id survives
    # groupBy on both sides but a plain equi-join never matches NULL = NULL,
    # which would blank its entire reassembled text
    t, r = totals.alias("__t"), reassembled.alias("__r")
    cond = reduce(and_, [F.col(f"__t.{c}").eqNullSafe(F.col(f"__r.{c}")) for c in ids])
    return t.join(r, cond, "left").select(
        *[F.col(f"__t.{c}").alias(c) for c in ids],
        "n_segments",
        (F.col("n_segments") - F.coalesce(F.col("__n_kept"), F.lit(0))).alias(
            "n_removed"
        ),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


def pack_token_budget(
    chunks: DataFrame,
    budget: int,
    group_cols: Sequence[str] = (),
    order_cols: Sequence[str] = ("doc_id", "chunk_idx"),
    tokens_col: str = "n_tokens",
    pack_col: str = "pack_id",
) -> DataFrame:
    """Assign chunks to fixed-token-budget training sequences (packing).

    Streaming boundary packing: within each group, chunks are laid out in
    ``order_cols`` order and ``pack_id = floor(running_total_before / budget)``
    — a chunk straddling a budget boundary stays in the pack it started in,
    so packs can overrun by at most one chunk (the standard deterministic
    approximation; exact bin packing is NP-hard and order-destroying).
    One window over (group, order) — a single shuffle; grouping by source
    or shard keeps window partitions bounded at 100 TB (an empty
    ``group_cols`` means ONE global ordered partition: fine for tests,
    wrong at scale — always group in production).
    """
    from pyspark.sql import Window

    if budget <= 0:
        raise ValueError("budget must be positive")
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col(tokens_col)).over(w)
    before = running - F.col(tokens_col)
    return chunks.withColumn(pack_col, F.floor(before / F.lit(budget)))
