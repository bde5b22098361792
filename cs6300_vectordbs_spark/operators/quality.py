"""Repetition-based quality signals for training-data curation.

Gopher-style (Rae et al. 2021, "Scaling Language Models", §A1.1)
repetition filters: documents dominated by a few repeated tokens or
n-grams are low-quality (boilerplate, SEO spam, generation loops) and
are dropped before LLM pre-training. Signals per document:

- ``dup_token_frac``   = 1 - distinct_tokens / total_tokens
- ``dup_bigram_frac``  = 1 - distinct_bigrams / total_bigrams
- ``top_bigram_frac``  = occurrences_of_most_frequent_bigram / total_bigrams

Complements :mod:`..functions.text` (quality_score / lang_id) — those
are per-row expressions; these need per-doc frequency tables, so they
are operators (explode → two-level hash aggregate), all codegen.

Scale notes (100 TB): the explode fans each doc into ~n_tokens rows,
then two hash aggregates — (doc, term) then (doc) — both map-side
partial. Shuffle keys are (doc_id, term) hashes: high cardinality, no
skew hot-spot (unlike corpus-global term aggregation). The final
assembly joins per-doc aggregate rows (tiny relative to input) on
doc_id; no broadcast of per-doc tables.

All fractions are single IEEE divisions of exact integer aggregates,
so results are bit-exact across engines — no rounding policy needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from .dedup import shingle_rows
from .util import spread as _spread


def contamination_check(
    train: DataFrame,
    test: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Train/test n-gram overlap — the decontamination gate every LLM
    eval pipeline runs (GPT-3 appendix C style: an eval document whose
    n-grams appear in the training set is contaminated).

    Per test document: the fraction of its distinct ``n``-gram shingles
    that occur ANYWHERE in the training corpus, and a flag at
    ``threshold``. Test docs with fewer than ``n`` tokens yield no
    shingles and are omitted (unassessable).

    Scale shape: the training side is reduced to a DISTINCT shingle set
    (one hash aggregate); the probe is an equi-join on the shingle
    string — never doc x doc. The fraction is an exact-integer divide.
    """
    tr = (
        shingle_rows(train, id_col=id_col, text_col=text_col, n=n)
        .select("s")
        .distinct()
    )
    te = shingle_rows(test, id_col=id_col, text_col=text_col, n=n)
    totals = te.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = te.join(tr, "s").groupBy("id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    frac = F.coalesce("n_hits", F.lit(0)).cast("double") / F.col(
        "n_shingles"
    ).cast("double")
    return (
        totals.join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("n_shingles").cast("bigint"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            frac.alias("contamination_frac"),
            (frac >= threshold).alias("is_contaminated"),
        )
    )


def heavy_hitters(
    docs: DataFrame,
    n: int = 20,
    *,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-global top-``n`` tokens by frequency (the exact answer a
    Misra-Gries / count-min sketch approximates). Used to spot corpus
    boilerplate and build stop-lists.

    Plan: explode → groupBy(token) count → ``orderBy().limit(n)``.
    The count aggregate is map-side partial, so hot tokens (the whole
    point of the query) are combined per-partition BEFORE the shuffle —
    per-key shuffle traffic is O(partitions), never O(occurrences), and
    skew cannot hot-spot a reducer. The limit compiles to
    TakeOrderedAndProject: per-partition heap top-n + driver merge, no
    global sort. Rank is assigned after the limit on n rows.

    Returns (rank, token, cnt); ties break token-ascending.
    """
    from pyspark.sql.window import Window

    counts = (
        _spread(docs)
        .select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(n)
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    return counts.select(
        F.row_number().over(w).alias("rank"), "token", "cnt"
    )


def repetition_stats(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document repetition signals (see module docstring).

    Returns (id_col, n_tokens, dup_token_frac, dup_bigram_frac,
    top_bigram_frac), one row per input row, zero-filled for docs too
    short to have tokens/bigrams.
    """
    toks = (
        _spread(docs)
        .select(
            F.col(id_col).alias("id"),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    tok_stats = (
        toks.groupBy("id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .groupBy("id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
    )
    bi_stats = (
        shingle_rows(docs, id_col=id_col, text_col=text_col, n=2, distinct=False)
        .groupBy("id", "s")
        .agg(F.count(F.lit(1)).alias("tf"))
        .groupBy("id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.count(F.lit(1)).alias("n_distinct_bi"),
            F.max("tf").alias("top_bi"),
        )
    )
    base = docs.select(F.col(id_col).alias("id"))

    def _frac(num, den):  # exact ints -> one IEEE divide
        return F.when(
            F.coalesce(den, F.lit(0)) > 0,
            num.cast("double") / den.cast("double"),
        ).otherwise(F.lit(0.0))

    return (
        base.join(tok_stats, "id", "left")
        .join(bi_stats, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.when(
                F.coalesce("n_tokens", F.lit(0)) > 0,
                F.lit(1.0) - F.col("n_distinct").cast("double")
                / F.col("n_tokens").cast("double"),
            ).otherwise(F.lit(0.0)).alias("dup_token_frac"),
            F.when(
                F.coalesce("n_bigrams", F.lit(0)) > 0,
                F.lit(1.0) - F.col("n_distinct_bi").cast("double")
                / F.col("n_bigrams").cast("double"),
            ).otherwise(F.lit(0.0)).alias("dup_bigram_frac"),
            _frac(F.col("top_bi"), F.col("n_bigrams")).alias("top_bigram_frac"),
        )
    )


def exact_ntile(
    df: DataFrame,
    order_cols: list[str],
    n_tiles: int = 10,
    *,
    out_col: str = "tile",
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Exact ntile over a TOTAL order without the global single-
    partition sort that ``ntile(n).over(Window.orderBy(...))`` compiles
    to (Exchange SinglePartition + Sort — the one serial point Spark
    ever forces, and a guaranteed OOM/straggler at 100 TB).

    Distributed equivalent, bit-identical output for a total order:

    1. ``repartitionByRange`` on the order key — a sampling-based range
       exchange, every partition sorts in parallel;
    2. per-partition local ``row_number`` (window partitioned by the
       range-partition id — never a single reducer);
    3. per-partition row counts (one tiny aggregate; P integers to the
       driver) prefix-summed into offsets, broadcast back;
    4. global_row = offset + local_row, and the exact SQL NTILE tile
       formula: with N rows, the first N % n tiles get one extra row.

    ``order_cols`` must be a TOTAL order (include a unique tie-break) —
    that is also what makes plain ntile deterministic in the first
    place.
    """
    spark = df.sparkSession
    cols = [F.col(c) for c in order_cols]
    P = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    if materialize:
        # Pin the INPUT once too: the range exchange's sampling job
        # executes the full child plan before the exchange runs it
        # again, so an unpinned upstream (doc_stats' regex battery,
        # a cleaning composite) would compute twice end-to-end. The
        # pinned blocks are the caller's narrow projection — callers
        # project to (key, value) first (see q_quality_deciles).
        df = df.localCheckpoint(eager=True)
    ranged = df.repartitionByRange(P, *cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    from pyspark.sql.window import Window

    wl = Window.partitionBy("__pid").orderBy(*cols)
    local = ranged.withColumn("__lrn", F.row_number().over(wl))
    # Materialize ONCE before counting: the counts job and the main job
    # must see the identical range-partition assignment (re-executing a
    # sampling-based range exchange twice risks different boundaries,
    # which would silently mis-offset every tile), and the input is
    # scanned once instead of twice. ``materialize=False`` exposes the
    # lazy plan for tests that assert its shape.
    if materialize:
        local = local.localCheckpoint(eager=True)

    counts = sorted(
        (r["__pid"], r["n"])
        for r in local.groupBy("__pid").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    )
    n_total = sum(n for _, n in counts)
    offsets, acc = {}, 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    off_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()],
            "__pid int, __off bigint",
        )
    )
    base, rem = divmod(n_total, n_tiles)
    r = F.col("__off") + F.col("__lrn")  # 1-based global row index
    threshold = rem * (base + 1)
    if base == 0:
        tile = r
    else:
        tile = F.when(
            r <= F.lit(threshold),
            F.floor((r - 1) / F.lit(base + 1)) + 1,
        ).otherwise(
            F.lit(rem) + F.floor((r - F.lit(threshold) - 1) / F.lit(base)) + 1
        )
    return (
        local.join(off_df, on="__pid")
        .withColumn(out_col, tile.cast("bigint"))
        .drop("__pid", "__lrn", "__off")
    )


def null_audit(
    df: DataFrame, table_name: str, columns: list[str] | None = None
) -> DataFrame:
    """Per-column data-validation report: (table_name, column, n_null,
    n_blank, n_rows). ``n_blank`` counts string cells that are empty or
    whitespace-only after trim (0 for non-strings).

    Every testdata column is nullable in its parquet footer, so a
    100-TB corpus WILL contain NULL cells; the engine's contract is
    that ingestion quarantines NULL *required* cells (id/text), and
    this report is how a pipeline measures that before trusting a
    source. ONE full scan regardless of column count — all counters
    are conditional sums in a single global aggregate (map-side
    partial, 1-row exchange), then the wide row is exploded to
    per-column rows driver-free via inline().
    """
    cols = columns or df.columns
    str_cols = {f.name for f in df.schema.fields if f.dataType.simpleString() == "string"}
    aggs = []
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"__null_{c}")
        )
        blank = (
            F.when(
                F.col(c).isNotNull() & (F.trim(F.col(c)) == ""), 1
            ).otherwise(0)
            if c in str_cols
            else F.lit(0)
        )
        aggs.append(F.sum(blank).cast("bigint").alias(f"__blank_{c}"))
    wide = df.agg(*aggs, F.count(F.lit(1)).cast("bigint").alias("__rows"))
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__null_{c}").alias("n_null"),
                F.col(f"__blank_{c}").alias("n_blank"),
            )
            for c in cols
        ]
    )
    return wide.select(
        F.lit(table_name).alias("table_name"),
        F.inline(structs),
        F.col("__rows").alias("n_rows"),
    )


GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_rules(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher quality-filter signals and pass/fail flags per document
    (Rae et al. 2021, "Scaling Language Models: ... Gopher", §A1.1 —
    the published heuristic battery every LLM pre-training pipeline
    runs some variant of). One row per input row:

      n_words            whitespace tokens
      mean_word_len      sum(len(word)) / n_words
      symbol_ratio       ('#' chars + '...' runs) / n_words
      alpha_word_frac    words containing >=1 letter / n_words
      stop_hits          how many of the 8 Gopher stopwords appear
      pass_*             one boolean per rule; keep = AND of all

    Cross-engine determinism: every ratio is ONE IEEE division of
    exact integer counts (sum-of-word-lengths comes from
    len(whitespace-stripped text), not a float fold), so no rounding
    policy is needed; rule comparisons sit on exact thresholds only a
    bit-identical ratio can straddle. NULL text yields NULL
    n_words/pass_word_count, ZERO-filled ratios (the guarded
    divisions fall through otherwise(0.0)), and a definite FALSE keep
    — the NULL pass_word_count collapses through three-valued AND
    with the ratio rules' definite booleans to false, matching DuckDB
    (pinned in tests; the ingestion layer quarantines NULL text
    before curation anyway; see null_audit).

    Scale: map-only column expressions — no shuffle, no UDF; the
    letter test is a per-token rlike inside an array filter, the rest
    is length arithmetic. Filters compose with whole-stage codegen
    and run at parquet-scan throughput at 100 TB.
    """
    t = F.trim(F.col(text_col))
    toks = tokens(t)
    n_words = F.size(toks).cast("bigint")
    sum_word_len = F.length(F.regexp_replace(F.lower(t), r"\s+", "")).cast(
        "bigint"
    )
    mean_word_len = F.when(
        n_words > 0, sum_word_len.cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    n_hash = (F.length(t) - F.length(F.replace(t, F.lit("#")))).cast("bigint")
    n_ellipsis = F.floor(
        (F.length(t) - F.length(F.replace(t, F.lit("...")))) / F.lit(3)
    ).cast("bigint")
    symbol_ratio = F.when(
        n_words > 0,
        (n_hash + n_ellipsis).cast("double") / n_words.cast("double"),
    ).otherwise(F.lit(0.0))
    n_alpha = F.size(
        F.filter(toks, lambda x: x.rlike(r"\p{L}"))
    ).cast("bigint")
    alpha_word_frac = F.when(
        n_words > 0, n_alpha.cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    stop_hits = F.size(
        F.filter(stop_arr, lambda w: F.array_contains(toks, w))
    ).cast("bigint")

    pass_word_count = (n_words >= min_words) & (n_words <= max_words)
    pass_mean_len = (mean_word_len >= min_mean_word_len) & (
        mean_word_len <= max_mean_word_len
    )
    pass_symbol = symbol_ratio <= max_symbol_ratio
    pass_alpha = alpha_word_frac >= min_alpha_word_frac
    pass_stop = stop_hits >= min_stop_hits
    return _spread(docs).select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_word_frac.alias("alpha_word_frac"),
        stop_hits.alias("stop_hits"),
        pass_word_count.alias("pass_word_count"),
        pass_mean_len.alias("pass_mean_len"),
        pass_symbol.alias("pass_symbol"),
        pass_alpha.alias("pass_alpha"),
        pass_stop.alias("pass_stop"),
        (
            pass_word_count & pass_mean_len & pass_symbol & pass_alpha & pass_stop
        ).alias("keep"),
    )
