"""BPE tokenizer training: the iterative merge loop (Sennrich et al. 2016).

``bpe_pair_stats`` (queries/text.py) computes the pair statistic that
selects ONE merge; this module runs the loop — k rounds of exact pair
counting + greedy merge application — producing the ordered merge table
that IS a trained BPE tokenizer (completing the tokenizer-training story
the way dedup_clusters completes LSH banding).

Scale (100 TB): the ONLY corpus-sized operation is the initial word-count
shuffle (map-side combinable, vocabulary-sized output). Every merge round
runs on the VOCABULARY relation — whose size is bounded by language, not
corpus bytes — as one |pairs|-sized aggregate plus a map-side array fold,
so 100x corpus growth with a stable vocabulary adds zero per-round work.
The argmax pair is a driver-bounded collect of exactly ONE row per round
(the same bounded-collect shape as the IVF centroids), and each round's
vocabulary relation is pinned with ``localCheckpoint`` so round r+1 does
not replay rounds 1..r (the connected_components precedent).

Cross-engine determinism: all counts are exact integers; the merge pick
orders by (count DESC, left, right) — binary UTF-8 comparisons on both
engines; greedy left-to-right merge application is an array fold here and
a run-parity window selection in the oracle, which agree because a merged
symbol ``left || right`` can never equal ``left`` (right is non-empty),
so a fold never chain-merges inside one round, and overlapping candidate
positions arise only when ``left == right``, where both forms keep the
even offsets of each run.

Extension beyond the reference (no tokenizer surface there; the nearest
analog is the deterministic hash consolidation in
``scripts/bulk_import_from_hashed.py:96-105``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F


def _adjacent_pairs(syms):
    """``array<struct<ls,rs>>`` of adjacent symbol pairs (empty when the
    word is a single symbol) — zip_with over two slices, never
    per-position ``element_at`` (the non-foldable bounds-checked trap)."""
    n = F.size(syms)
    return F.zip_with(
        F.slice(syms, 1, n - 1),
        F.slice(syms, 2, n - 1),
        lambda a, b: F.struct(a.alias("ls"), b.alias("rs")),
    )


def _apply_merge(syms, ls: str, rs: str):
    """Greedy left-to-right merge of adjacent (ls, rs) into one symbol.

    Fold invariant: the accumulator's last element is compared against the
    LITERAL ``ls``; a symbol created this round is ``ls || rs`` which can
    never equal ``ls``, so each input symbol merges at most once and the
    fold reproduces the textbook non-overlapping left-to-right scan
    ('aaa' + (a,a) -> [aa, a]; 'abab' + (a,b) -> [ab, ab])."""
    merged = F.lit(ls + rs)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(ls))
            & (s == F.lit(rs)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def initial_vocab(
    docs: DataFrame, text_col: str = "text", ws_re: str | None = None
) -> DataFrame:
    """``(freq, syms)`` character-level vocabulary — the loop's seed and
    the ONLY corpus-sized computation (word-count shuffle, map-side
    combinable). Factored out so the plan-hygiene gate can audit the
    round relations directly (the loop's localCheckpoints hide them from
    the returned DataFrame's lineage)."""
    from .chunking import WS_RE

    ws = ws_re if ws_re is not None else WS_RE
    col = F.col(text_col)
    # trim() strips only SPACES: a doc bounded by tab/newline splits to a
    # leading/trailing '' token (review r10). '' never affects merges or
    # encoded output (no symbols, no positions on either engine) but it
    # would sit in the vocabulary relation with real frequency mass —
    # filtered here so downstream consumers never see a phantom word.
    tok = (
        docs.filter(F.length(F.trim(col)) > 0)
        .select(F.explode(F.split(F.trim(col), ws)).alias("w"))
        .filter(F.length("w") > 0)
    )
    return (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("freq", F.split("w", "").alias("syms"))
    )


def pair_counts(vocab: DataFrame) -> DataFrame:
    """One round's merge-selection relation, best pair first:
    ``(ls, rs, pair_count, n_word_positions)`` ordered by
    (count DESC, ls, rs) — vocabulary-sized aggregate."""
    return (
        vocab.select("freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
        .groupBy(F.col("p.ls").alias("ls"), F.col("p.rs").alias("rs"))
        .agg(
            F.sum("freq").cast("long").alias("pair_count"),
            F.count(F.lit(1)).alias("n_word_positions"),
        )
        .orderBy(F.col("pair_count").desc(), "ls", "rs")
    )


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    ws_re: str | None = None,
) -> list[Row]:
    """Run ``n_merges`` BPE training rounds over ``docs[text_col]``.

    Returns the ordered merge table as driver rows (one per round, fewer
    if the vocabulary runs out of adjacent pairs):
    ``merge_idx, left_sym, right_sym, merged_sym, pair_count,
    n_word_positions``. ``pair_count`` weights each vocabulary position
    by word frequency — exactly the ``bpe_pair_stats`` statistic, folded
    into the loop that consumes it.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    vocab = initial_vocab(docs, text_col=text_col, ws_re=ws_re).localCheckpoint(
        eager=True
    )
    merges: list[Row] = []
    for idx in range(1, n_merges + 1):
        best = pair_counts(vocab).limit(1).collect()
        if not best:  # vocabulary fully merged — nothing left to count
            break
        b = best[0]
        merges.append(
            Row(
                merge_idx=idx,
                left_sym=b.ls,
                right_sym=b.rs,
                merged_sym=b.ls + b.rs,
                pair_count=b.pair_count,
                n_word_positions=b.n_word_positions,
            )
        )
        # vocabulary-sized map-side rewrite, pinned so the next round's
        # lineage starts here instead of replaying every prior round
        vocab = vocab.select(
            "freq", _apply_merge(F.col("syms"), b.ls, b.rs).alias("syms")
        ).localCheckpoint(eager=True)
    return merges


def bpe_merge_table(spark: SparkSession, docs: DataFrame, n_merges: int) -> DataFrame:
    """The merge table as a DataFrame (k rows, schema above)."""
    rows = train_bpe_merges(docs, n_merges)
    schema = (
        "merge_idx int, left_sym string, right_sym string, merged_sym string, "
        "pair_count long, n_word_positions long"
    )
    return spark.createDataFrame(rows, schema=schema)


def encode_vocab(vocab: DataFrame, merges) -> DataFrame:
    """Apply an ordered merge table to the ``(freq, syms)`` vocabulary.

    ``merges`` is the list returned by :func:`train_bpe_merges` (or any
    iterable with ``left_sym``/``right_sym``); each merge is one map-side
    array fold applied in training order — encoding with k merges is k
    chained folds over the vocabulary relation, zero shuffles. This is
    the APPLY half of BPE: train once, encode any corpus whose words hit
    the same vocabulary."""
    out = vocab
    merges = list(merges)
    # fold expressions nest: thousands of chained merges in ONE projection
    # would blow up Catalyst analysis (review r10) — apply in bounded
    # chunks, pinning between chunks exactly like the training loop
    chunk = 16
    for start in range(0, len(merges), chunk):
        syms = F.col("syms")
        for m in merges[start : start + chunk]:
            syms = _apply_merge(syms, m.left_sym, m.right_sym)
        out = out.select("freq", syms.alias("syms"))
        if start + chunk < len(merges):
            out = out.localCheckpoint(eager=True)
    return out
