"""Corpus-curation operators for tokenizer training and data selection.

  bpe_pair_counts    adjacent-symbol pair statistics — step 1 of BPE
                     tokenizer training (Sennrich et al. 2016, "Neural
                     Machine Translation of Rare Words with Subword
                     Units", alg. 1: the most frequent pair is the
                     first merge)
  dsir_log_weights   importance weights for data selection via hashed
                     unigram models (Xie et al. 2023, "Data Selection
                     for Language Models via Importance Resampling")

Both are pure DataFrame compositions with no UDFs, designed around the
classic BPE scale trick: aggregate the corpus to its *vocabulary*
first (word -> count), then do per-word work on the vocab table, which
is orders of magnitude smaller than the corpus. At 100 TB the corpus
pass is one map-side-combined shuffle on the word key; everything
after runs on vocab/bucket-sized data.

Cross-engine determinism: bucket hashing uses the repo's portable
md5-hash64 (dedup._md5_hash64 — reproducible in DuckDB as
``('0x' || substr(md5(...), 1, 15))::BIGINT``), and DSIR's per-bucket
log-ratios are quantized to integer micro-nats BEFORE the per-doc sum,
so document weights are exact BIGINT sums (order-independent; the only
cross-engine float op is one ln() per bucket, and a 1-ulp libm
difference flips a micro-nat with probability ~1e-9 per bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokens
from .dedup import _md5_hash64

# Salt for DSIR's hashed unigram feature space — any fixed int; kept
# distinct from MinHash permutation salts (0..num_hashes) by offset.
_DSIR_SALT = 97


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary: (w, wc). THE one corpus-sized shuffle both
    operators share — partial aggregation makes the exchange carry
    vocab-sized, not corpus-sized, data."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wc"))
    )


def bpe_pair_counts(
    docs: DataFrame, text_col: str = "text", top_n: int = 50
) -> DataFrame:
    """Top adjacent character-pair counts over the corpus — the
    statistic a BPE trainer computes to pick each merge.

    corpus -> vocab (one shuffle) -> per-word pair explode (vocab-
    sized) -> pair aggregate (vocab-sized shuffle) -> ordered top_n.
    Words are weighted by their corpus frequency, exactly like the BPE
    reference algorithm's dictionary-of-words representation. Total
    order (cnt DESC, pair ASC) makes top_n deterministic.
    """
    words = word_counts(docs, text_col).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "wc",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair").asc())
        .limit(top_n)
    )


def _bucket(c: Column, n_buckets: int) -> Column:
    return F.pmod(_md5_hash64(c, _DSIR_SALT), F.lit(n_buckets))


def dsir_log_weights(
    docs: DataFrame,
    target_pred: Column,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """DSIR importance weights: log p_target(x) - log q_raw(x) under
    add-1-smoothed unigram models over a hashed token space.

    Output: (doc_id, n_toks, log_w_micro) — log_w_micro is the weight
    in integer MICRO-NATS (sum over the doc's tokens of the quantized
    per-bucket log-ratio). Resampling = weighted_sample on
    exp(log_w_micro / 1e6), or rank by it directly.

    Plan shape (scale-first):
      1. corpus pass -> (doc_id, bucket) token stream; one groupBy
         bucket x is_target with map-side combine -> 2*n_buckets rows.
      2. ratio table: n_buckets rows, log-ratio quantized to BIGINT
         micro-nats. Tiny -> broadcast.
      3. corpus token stream joins the broadcast ratio table, groupBy
         doc_id (the only corpus-sized exchange, co-partitioned with
         the corpus key) -> exact integer sum.
    No collect, no UDF; the token stream is computed once per pass
    (Spark recomputes it for pass 1 and 3 — cheaper than caching 100 TB).
    """
    toks = docs.select(
        F.col(id_col),
        target_pred.alias("is_target"),
        F.explode(tokens(text_col)).alias("tok"),
    ).select(id_col, "is_target", _bucket(F.col("tok"), n_buckets).alias("b"))

    per_bucket = toks.groupBy("b").agg(
        F.count(F.lit(1)).cast("double").alias("q_cnt"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0))
        .cast("double")
        .alias("t_cnt"),
    )
    # Totals via an unpartitioned window over the n_buckets-row bucket
    # table (NOT a separate .agg + crossJoin — Spark would recompute
    # the whole token stream for it, a third corpus pass at 100 TB;
    # the window runs on 64 rows in one task).
    w_all = Window.partitionBy()
    ratio = (
        per_bucket
        .withColumn("q_tot", F.sum("q_cnt").over(w_all))
        .withColumn("t_tot", F.sum("t_cnt").over(w_all))
        .select(
            "b",
            F.round(
                (
                    F.log((F.col("t_cnt") + 1.0) / (F.col("t_tot") + float(n_buckets)))
                    - F.log((F.col("q_cnt") + 1.0) / (F.col("q_tot") + float(n_buckets)))
                )
                * 1e6,
                0,
            )
            .cast("bigint")
            .alias("r_micro"),
        )
    )
    return (
        toks.join(F.broadcast(ratio), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_toks"),
            F.sum("r_micro").cast("bigint").alias("log_w_micro"),
        )
    )


_SHARD_SALT = 131


def source_kl_divergence(
    docs: DataFrame,
    *,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source domain shift: KL(p_source || p_corpus) over unigram
    distributions — the standard "how far is this domain from the
    mix" measurement behind domain-weighting / data-selection recipes
    (the population-level companion of dsir_log_weights' per-doc
    importance weights).

    Output: (source, n_tokens, vocab, kl_nano) — kl_nano is the
    divergence in integer NANO-NATS. Per-(source, word) terms
    p_s(w) * ln(p_s(w)/p(w)) are quantized to BIGINT nano-nats BEFORE
    the per-source sum, so the shuffled aggregate is an exact integer
    sum (order-independent; the only cross-engine float op is one
    ln() per vocab row — the dsir_log_weights determinism contract).

    Plan shape: one corpus-sized map-side-combined shuffle to
    (source, word) counts; everything after is vocab-sized — word
    totals re-keyed on word, source totals and the corpus total
    broadcast (|sources| and 1 row).
    """
    sw = (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(tokens(text_col)).alias("w"),
        )
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wt = sw.groupBy("w").agg(F.sum("c").cast("bigint").alias("cw"))
    st = sw.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("ns"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
    )
    tot = st.agg(F.sum("ns").cast("bigint").alias("n"))
    # p_s/p = (c/cw) * (n/ns): each factor is one exact IEEE division
    # of integers, so both engines feed ln() the identical double.
    term = (
        F.lit(1e9)
        * (F.col("c").cast("double") / F.col("ns"))
        * F.log(
            (F.col("c").cast("double") / F.col("cw"))
            * (F.col("n").cast("double") / F.col("ns"))
        )
    )
    return (
        sw.join(wt, on="w")
        .join(F.broadcast(st), on="source")
        .crossJoin(F.broadcast(tot))
        .withColumn("t_nano", F.round(term, 0).cast("bigint"))
        .groupBy("source")
        .agg(
            F.min("ns").cast("bigint").alias("n_tokens"),
            F.min("vocab").cast("bigint").alias("vocab"),
            F.sum("t_nano").cast("bigint").alias("kl_nano"),
        )
    )


def shard_manifest(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 16,
) -> DataFrame:
    """Deterministic training-shard assignment manifest — the export
    step of a pre-training pipeline: a global, seed-stable shuffle of
    the corpus into ``n_shards`` files, summarized as one manifest row
    per shard:

      shard      pmod(md5-hash64(doc_id), n_shards)
      n_docs     documents in the shard
      n_tokens   whitespace tokens in the shard (batch budgeting)
      n_chars    characters in the shard (size budgeting)
      min_key /  first / last doc sort key (the same md5-hash64) —
      max_key    consumers stream a shard in key order to reproduce
                 the exact global shuffle order without re-hashing

    Hash-sharding IS the shuffle: ordering by a cryptographic hash of
    the id is a uniform random permutation that any engine (and any
    later pipeline stage) can reproduce — no stored permutation table,
    no seed state. Writing the actual files is
    ``df.repartition(n_shards, pmod(...)).sortWithinPartitions(key)``
    + a partitioned write; at 100 TB that is one shuffle whose keys
    are uniform by construction (no skew possible) and this manifest
    is its one-aggregate audit twin (map-side combined, n_shards
    output rows).
    """
    key = _md5_hash64(F.col(id_col).cast("string"), _SHARD_SALT)
    return (
        docs.select(
            F.pmod(key, F.lit(n_shards)).cast("bigint").alias("shard"),
            key.alias("sort_key"),
            tokens(text_col).alias("tk"),
            F.length(text_col).alias("nc"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.size("tk")).cast("bigint").alias("n_tokens"),
            F.sum("nc").cast("bigint").alias("n_chars"),
            F.min("sort_key").alias("min_key"),
            F.max("sort_key").alias("max_key"),
        )
        .orderBy("shard")
    )


def semdedup_survivors(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    n_cells: int = 8,
    min_sim: float = 0.92,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster the
    embedding space, call same-cluster pairs above a cosine threshold
    semantic duplicates, keep ONE representative per duplicate group.
    Exactly the paper's recipe, built from this engine's verified
    kernels: IVF-cell blocking (ivf_neardup_pairs — the paper's
    k-means clustering step; pairs are scored only within a cell) ->
    connected components (dedup_clusters, iterative min-label
    propagation) -> keep the min-id member of each component.

    Output, one row per input vector: (id, cluster_id, cluster_size,
    is_survivor). Vectors in no near-dup pair are their own singleton
    cluster (survivors by definition). Training-set construction =
    filter is_survivor, join back to the corpus by id.

    Scale shape: pair generation is ~N^2/n_cells same-cell dots (the
    SemDeDup trick — n_cells grows with N to hold this constant);
    components run on the near-dup pair graph only (typically a small
    fraction of N); the final assembly is a left join + one groupBy
    on cluster_id. No stage is corpus x corpus.
    """
    from ..operators.ann import ivf_neardup_pairs
    from ..operators.graph import dedup_clusters

    pairs = ivf_neardup_pairs(
        emb, corpus_id=id_col, corpus_vec=vec_col, dim=dim,
        n_cells=n_cells, min_sim=min_sim,
    )
    cl = dedup_clusters(pairs, id_a="id_a", id_b="id_b").select(
        F.col("doc_id").alias("__id"), F.col("cluster_id")
    )
    full = (
        emb.select(F.col(id_col).alias("__id"))
        .join(cl, "__id", "left")
        .select(
            "__id",
            F.coalesce("cluster_id", F.col("__id")).alias("cluster_id"),
        )
    )
    sizes = full.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return (
        full.join(sizes, "cluster_id")
        .select(
            F.col("__id").alias(id_col),
            F.col("cluster_id"),
            "cluster_size",
            (F.col("__id") == F.col("cluster_id")).alias("is_survivor"),
        )
    )


def bpe_train_merges(
    docs: DataFrame, *, text_col: str = "text", n_merges: int = 3
) -> DataFrame:
    """The BPE training LOOP (Sennrich et al. 2016, alg. 1) — the
    iterative companion of :func:`bpe_pair_counts` (which computes one
    round's statistic): words spelled as space-joined symbols, then
    ``n_merges`` rounds of [count adjacent symbol pairs weighted by
    word frequency -> pick argmax -> merge every occurrence]. Output
    is the actual tokenizer artifact: the ordered merge table
    (step, pair, merged, cnt).

    Determinism: argmax ties break (cnt DESC, pair ASC); the merge
    rewrite is non-overlapping left-to-right string replace — the
    same greedy order the reference algorithm applies, and identical
    in any engine. Per-round driver traffic is ONE row (the argmax),
    the kmeans-centroid discipline; spellings are localCheckpoint'd
    per round so lineage stays O(1).

    Scale shape: all per-round work runs on the VOCABULARY table
    (word -> spelling, count), orders of magnitude smaller than the
    corpus; the corpus is read once, for word counts. This is exactly
    how production BPE trainers scale (the dictionary trick).
    """
    words = word_counts(docs, text_col).filter(F.length("w") >= 2)
    _, merges = _bpe_rounds(_bpe_spell(words), n_merges, carry=[])
    return docs.sparkSession.createDataFrame(
        merges, "step bigint, pair string, merged string, cnt bigint"
    )


def _bpe_spell(words: DataFrame, *, carry: list[str] | None = None) -> DataFrame:
    """Vocabulary rows (w, wc) -> (``carry``..., sp, wc) with ``sp`` the
    space-joined character spelling (the BPE working representation)."""
    return words.select(
        *(carry or []),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda i: F.col("w").substr(i, F.lit(1)),
            ),
        ).alias("sp"),
        "wc",
    ).localCheckpoint(eager=True)


def _bpe_rounds(
    spell: DataFrame, n_merges: int, *, carry: list[str]
) -> tuple[DataFrame, list[tuple[int, str, str, int]]]:
    """Run ``n_merges`` BPE rounds over a spelled vocabulary.

    Each round: count adjacent symbol pairs weighted by word count,
    pick the argmax (ONE row to the driver — the kmeans-centroid
    collect discipline), then rewrite via a greedy left-to-right fold
    over the symbol list — exactly Sennrich's non-overlapping scan, so
    a run like 'a a a a' merges to 'aa aa' (a delimiter-sharing string
    replace would stop at 'aa a a'). The fold's accumulator is the
    rebuilt spelling string; a merge fires when the accumulator's last
    TOKEN equals p1 and the incoming symbol equals p2. The merged
    token p1||p2 can never itself equal p1 (p2 is non-empty), so a
    just-merged token can never chain into a second merge within the
    round — matching reference BPE. ``carry`` columns (e.g. the word
    key for the encoder) ride along untouched; spellings are
    localCheckpoint'd per round so lineage stays O(1). Words with a
    single symbol contribute zero pairs, so including them (the
    encoder does; the trainer pre-filters) cannot change any merge
    decision.
    """
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        arr = F.split(F.col("sp"), " ")
        pairs = spell.select(
            F.explode(
                F.when(
                    F.size(arr) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(arr) - 1),
                        lambda i: F.concat_ws(
                            " ",
                            F.element_at(arr, i),
                            F.element_at(arr, i + 1),
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("pair"),
            "wc",
        )
        best = (
            pairs.groupBy("pair")
            .agg(F.sum("wc").cast("bigint").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, cnt = best[0]["pair"], best[0]["cnt"]
        merged = pair.replace(" ", "")
        merges.append((step, pair, merged, cnt))
        p1, p2 = pair.split(" ")
        spell = spell.select(
            *carry,
            F.aggregate(
                F.slice(arr, 2, F.size(arr) - 1),
                F.element_at(arr, 1),
                lambda acc, s: F.when(
                    (s == F.lit(p2))
                    & (
                        (acc == F.lit(p1))
                        | acc.endswith(F.lit(" " + p1))
                    ),
                    F.concat(
                        acc.substr(
                            F.lit(1), F.length(acc) - F.lit(len(p1))
                        ),
                        F.lit(merged),
                    ),
                ).otherwise(F.concat(acc, F.lit(" "), s)),
            ).alias("sp"),
            "wc",
        ).localCheckpoint(eager=True)
    return spell, merges


def bpe_encode_stats(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 3,
) -> DataFrame:
    """APPLY the trained BPE merges — the tokenizer's encode side,
    measured per document: train ``n_merges`` merges on the corpus
    (identical argmax sequence to :func:`bpe_train_merges`), encode
    every vocabulary word once, then join the per-word symbol counts
    back onto the documents. Output per doc: word count, character
    count (of the tokenized words), BPE token count, and the
    compression ratio tokens/chars — the fertility statistic tokenizer
    work tracks.

    Scale shape: encoding runs ONCE PER DISTINCT WORD on the
    vocabulary table (the dictionary trick again), never per token
    occurrence; the corpus touches two word-keyed shuffles (vocab
    build, then token->vocab join + doc rollup), both map-side
    combined. The merge table itself is ``n_merges`` driver rows.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("w")
    )
    words = toks.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("wc")
    )
    encoded, _ = _bpe_rounds(
        _bpe_spell(words, carry=["w"]), n_merges, carry=["w"]
    )
    per_word = encoded.select(
        "w",
        F.length(F.replace(F.col("sp"), F.lit(" "), F.lit(""))).cast(
            "bigint"
        ).alias("n_chars_w"),
        F.size(F.split(F.col("sp"), " ")).cast("bigint").alias("n_sym_w"),
    )
    return (
        toks.join(per_word, on="w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_chars_w").cast("bigint").alias("n_chars"),
            F.sum("n_sym_w").cast("bigint").alias("n_bpe_tokens"),
        )
        .select(
            id_col,
            "n_words",
            "n_chars",
            "n_bpe_tokens",
            F.round(
                F.col("n_bpe_tokens").cast("double")
                / F.col("n_chars").cast("double"),
                9,
            ).alias("tokens_per_char"),
        )
    )
