"""Sequence packing — the pretraining "concatenate and chunk" stage.

A training-data pipeline's last hop before the trainer: documents are
laid end-to-end in a deterministic order and the token stream is cut
into fixed-budget training sequences (GPT-style packing; spans that
cross a boundary are split). The operator emits one row per
(sequence, document-span): which slice of which document lands where
in which sequence — exactly the manifest a distributed tokenizer/
writer consumes to materialize packed examples.

Scale design: the only global structure needed is the EXCLUSIVE
PREFIX SUM of token counts in document order. A window prefix sum
over an unpartitioned ORDER BY is Spark's one forced serial point
(Exchange SinglePartition), so this module computes it the
distributed way — the same two-phase shape as
:func:`..quality.exact_ntile`:

1. ``repartitionByRange`` on the order key (parallel sampling-based
   range exchange);
2. per-partition local cumulative sum (window partitioned by the
   range-partition id);
3. per-partition totals (P integers) prefix-summed on the driver and
   broadcast back as offsets.

Everything downstream is per-row arithmetic + one ``sequence``
explode (a document touches ceil(n_tokens / budget) + 1 sequences at
most), all codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_running_totals(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    *,
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Adds ``__end`` (inclusive prefix sum of ``value_col`` over the
    total order ``order_cols``) without any single-partition exchange.
    ``__start`` = ``__end - value`` is the exclusive form."""
    spark = df.sparkSession
    cols = [F.col(c) for c in order_cols]
    P = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    if materialize:
        # Pin the INPUT once too: repartitionByRange runs a sampling
        # job over the full child plan before the exchange itself
        # executes it again, so an unpinned upstream lineage runs
        # twice end-to-end. Ruinous when the caller feeds a composite
        # (curation_batches packs the whole clean_corpus pipeline in
        # here). What gets pinned is the caller's narrow projection
        # (order key + value), never a wide corpus row.
        df = df.localCheckpoint(eager=True)
    ranged = df.repartitionByRange(P, *cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    wl = (
        Window.partitionBy("__pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn(
        "__lsum", F.sum(F.col(value_col).cast("bigint")).over(wl)
    )
    # Materialize ONCE before counting — the totals job and the main
    # job must see the identical range-partition assignment (a
    # sampling-based exchange re-executed twice risks different
    # boundaries → silently wrong offsets), and the input scans once.
    # ``materialize=False`` exposes the lazy plan for plan tests.
    if materialize:
        local = local.localCheckpoint(eager=True)
    counts = sorted(
        (r["__pid"], r["t"])
        for r in local.groupBy("__pid")
        .agg(F.sum(F.col(value_col).cast("bigint")).alias("t"))
        .collect()
    )
    offsets, acc = [], 0
    for pid, t in counts:
        offsets.append((pid, acc))
        acc += t or 0
    off_df = F.broadcast(
        spark.createDataFrame(offsets, "__pid int, __off bigint")
    )
    return (
        local.join(off_df, on="__pid")
        .withColumn("__end", (F.col("__off") + F.col("__lsum")).cast("bigint"))
        .drop("__pid", "__lsum", "__off")
    )


def pack_sequences(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    num_partitions: int | None = None,
) -> DataFrame:
    """Pack documents (ordered by ``id_col``) into fixed-``budget``
    training sequences, splitting documents across sequence boundaries.

    Returns one row per (sequence, doc-span):
      ``(seq_id, <id_col>, offset, n_tok)`` — the span occupies
    ``[offset, offset + n_tok)`` inside sequence ``seq_id`` and covers
    the document's tokens in order. Zero-token documents emit nothing.
    Deterministic given the order — the manifest is reproducible run
    to run and engine to engine (exact integer arithmetic only).
    """
    pos = global_running_totals(
        docs, [id_col], tokens_col, num_partitions=num_partitions
    )
    spans = (
        pos.filter(F.col(tokens_col) > 0)
        .withColumn("__start", F.col("__end") - F.col(tokens_col))
        .withColumn(
            "seq_id",
            F.explode(
                F.sequence(
                    F.floor(F.col("__start") / budget),
                    F.floor((F.col("__end") - 1) / budget),
                )
            ),
        )
    )
    span_start = F.greatest(F.col("__start"), F.col("seq_id") * budget)
    span_end = F.least(F.col("__end"), (F.col("seq_id") + 1) * budget)
    return spans.select(
        "seq_id",
        F.col(id_col),
        (span_start - F.col("seq_id") * budget).cast("bigint").alias("offset"),
        (span_end - span_start).cast("bigint").alias("n_tok"),
    )


def mixture_epoch_plan(
    docs: DataFrame,
    *,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
    budget: int,
    temperature: float = 0.5,
) -> DataFrame:
    """Epoch planning — allocate a global token ``budget`` across
    sources by the temperature-scaled mixing weights and report each
    source's REPETITION FACTOR: the Pile/LLaMA-recipe "how many epochs
    of each source" table. ``target = budget * weight``; ``epochs =
    target / available`` (>1 means the source is oversampled and will
    repeat; <1 means it is subsampled within one pass).

    Determinism: every derived column is computed from the ALREADY
    round(9)-canonicalized weight, so both engines do bit-identical
    IEEE double arithmetic downstream of the one shuffled aggregate.
    Scale shape: two |sources|-row aggregates + broadcast joins —
    nothing corpus-sized moves.
    """
    w = source_mixture_weights(
        docs,
        source_col=source_col,
        tokens_col=tokens_col,
        temperature=temperature,
    )
    nd = docs.groupBy(F.col(source_col).alias("__src")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    b = F.lit(float(budget))
    target = F.round(b * F.col("weight"), 3)
    epochs = b * F.col("weight") / F.col("avail_tokens")
    # The flag compares the 3-decimal target against the integer
    # available count — NOT epochs > 1.0, where the weight's round(9)
    # dust (e.g. 0.666666667 vs 2/3) would flip a source sitting
    # exactly at one pass. The doc-count join is NULL-SAFE: a NULL
    # source is a legal group in both engines' GROUP BY, and a plain
    # equi-join would silently drop it (NULL != NULL).
    return (
        w.withColumnRenamed("n_items", "avail_tokens")
        .join(
            F.broadcast(nd),
            F.col("source").eqNullSafe(F.col("__src")),
        )
        .select(
            "source",
            "n_docs",
            "avail_tokens",
            "weight",
            target.alias("target_tokens"),
            F.round(epochs, 9).alias("epochs"),
            (target > F.col("avail_tokens")).alias("oversampled"),
        )
    )


def source_mixture_weights(
    docs: DataFrame,
    *,
    source_col: str = "source",
    tokens_col: str | None = None,
    temperature: float = 0.7,
) -> DataFrame:
    """Temperature-scaled sampling weights per source — the standard
    multi-corpus mixing rule (weight_i ∝ share_i^T, T<1 upsamples
    small/rare sources; T=1 is proportional, T=0 uniform). Counts by
    documents, or by tokens when ``tokens_col`` is given.

    One tiny aggregate (|sources| rows) + a broadcast of its total —
    nothing corpus-sized moves. Returns
    ``(source, n_items, share, weight)`` with weights summing to 1.
    """
    size = (
        F.sum(F.col(tokens_col).cast("bigint"))
        if tokens_col is not None
        else F.count(F.lit(1))
    )
    per = docs.groupBy(F.col(source_col).alias("source")).agg(
        size.cast("bigint").alias("n_items")
    )
    tot = per.agg(
        F.sum("n_items").alias("__t"),
    )
    shared = per.crossJoin(F.broadcast(tot)).withColumn(
        "share", F.col("n_items") / F.col("__t")
    )
    powed = shared.withColumn(
        "__p", F.pow(F.col("share"), F.lit(float(temperature)))
    )
    ptot = powed.agg(F.sum("__p").alias("__pt"))
    return (
        powed.crossJoin(F.broadcast(ptot))
        .select(
            "source",
            "n_items",
            F.round("share", 9).alias("share"),
            F.round(F.col("__p") / F.col("__pt"), 9).alias("weight"),
        )
    )
