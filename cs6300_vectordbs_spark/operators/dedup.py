"""Deduplication operators for training-data pipelines at 100 TB scale.

Not in the reference (its corpus is pre-deduped, "wiki_movie_plots_
deduped.csv", /root/reference/assignment.md:48-52) — this is the
north-star extension surface. Five strategies, cheapest first:

  exact_dedup           hash-groupBy on normalized content; one shuffle
                        on the fingerprint, map-side combine.
  ngram_jaccard_pairs   exact n-gram Jaccard via explode + self-join on
                        shingle — the small/medium-scale exact method and
                        the correctness oracle for MinHash.
  minhash_lsh_pairs     MinHash signatures + LSH banding: candidate pairs
                        come from equi-joins on band keys, so the join is
                        a hash join on small keys, never all-pairs. The
                        100 TB path.
  simhash_buckets       64-bit SimHash fingerprint; near-dups share a
                        fingerprint (or differ in few bits).
  embedding_neardup     cosine >= threshold over embedding vectors
                        (all-pairs here; LSH-bucketed in operators/ann.py).

Portability note: every hash used in oracle-checked paths is built from
md5() (identical in every engine) rather than engine-native hash().
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint
from ..functions.vector import ColumnOrName, _col
from .util import spread as _spread

# ---------------------------------------------------------------------------
# Exact-dup group memo — amortizes the collapse guard across the family.
#
# Every LSH-family operator (minhash_lsh_pairs, simhash_pairs,
# ngram_jaccard_pairs) runs the same exact-dup pre-collapse on the same
# corpus, and composites (dedup_quality_report, clean_corpus -> packing)
# re-run it per sub-query — the guard's dup-existence job plus the
# members localCheckpoint were ~100% of the r06 headline regression.
# The group table depends ONLY on (docs plan, id_col, text_col), so one
# computation per corpus per session is correct; this memo provides it.
#
# Key safety: the key is the analyzed plan's semanticHash, which for
# file sources is stable across separate spark.read.parquet(path) calls
# (verified on this Spark build) and for in-memory LocalRelations
# INCLUDES the row data — two createDataFrame fixtures with different
# rows can never collide (at worst they miss, which is only a re-run).
# File mutation is guarded by snapshotting (path, size, mtime_ns) of
# docs.inputFiles() into the key; a rewritten parquet gets a new key.
# Cached `members` is localCheckpoint'd, i.e. pinned to the live
# SparkContext — the applicationId in the key drops entries from a
# previous context. Bounded FIFO so long sessions can't leak plans.
# ---------------------------------------------------------------------------
_GROUP_CACHE: dict = {}
_GROUP_CACHE_MAX = 8

# Second memo, same key discipline: the expensive MATERIALIZED
# derivative tables the pair operators checkpoint anyway (MinHash
# signature table, exploded shingle rows, SimHash fingerprints).
# These are pure functions of (corpus, parameters) — the in-session
# analog of the persisted dedup index's stored signatures
# (sources/dedup_index.py), so a composite that runs minhash + ngram +
# simhash over one corpus (dedup_quality_report, clean_corpus ->
# survivors) pays each text pipeline once. The capped and uncapped
# variants of an operator share the same pre-cap table.
_TABLE_CACHE: dict = {}
_TABLE_CACHE_MAX = 16

# One lock for both memo dicts. Multi-threaded drivers (a thread pool
# constructing queries over a shared SparkSession is a standard Spark
# pattern) would otherwise race check-then-pop eviction and
# clear()-during-iteration. The critical sections are dict ops only —
# Spark builds/jobs always run OUTSIDE the lock, so a slow build never
# blocks other threads' memo hits.
_CACHE_LOCK = threading.Lock()


def _release(df) -> None:
    """Best-effort storage hint for an evicted memo entry. NOTE:
    ``DataFrame.unpersist`` only uncaches CacheManager entries — for a
    localCheckpoint'd frame (persisted at the RDD level) it is a
    no-op, so this does NOT free executor storage synchronously. The
    checkpoint RDD blocks are reclaimed by Spark's ContextCleaner once
    the last JVM reference is GC'd, which the dict pop enables (the
    Python wrapper drops promptly under CPython refcounting; the JVM
    side follows at its own GC pace). Deliberately NOT unpersisting
    via the underlying RDD handle: lineage is truncated at checkpoint,
    so force-dropping blocks would break any evicted-but-still-held
    DataFrame a caller is using. Never lets cleanup break the caller."""
    try:
        if df is not None:
            df.unpersist()
    except Exception:
        pass


def clear_exact_group_cache() -> None:
    """Drop all memoized exact-dup group AND derivative tables (test
    isolation / explicit refresh after in-place corpus mutation under
    an unchanged plan — not possible with file sources, whose key
    carries file size+mtime). Eviction releases the PYTHON references;
    the checkpoint blocks themselves are freed asynchronously by the
    ContextCleaner once the JVM drops its last reference (see
    ``_release``) — callers must not assume synchronous storage
    reclamation."""
    with _CACHE_LOCK:
        groups = list(_GROUP_CACHE.values())
        tables = list(_TABLE_CACHE.values())
        _GROUP_CACHE.clear()
        _TABLE_CACHE.clear()
    for members, _base, _ in groups:
        _release(members)
    for df in tables:
        _release(df)


def _memo_checkpoint(src: DataFrame, tag: tuple, build) -> DataFrame:
    """``build()`` localCheckpoint'd, cached per (corpus identity,
    tag) for the session. ``build`` must be a pure deterministic
    function of ``src`` and the parameters spelled out in ``tag`` —
    every caller's tag carries its operator name and every
    text-pipeline parameter. Falls back to a plain checkpoint when
    the corpus identity can't be established cheaply."""
    key = _group_cache_key(src, "", "")
    if key is None:
        return build().localCheckpoint(eager=True)
    key = key + tag
    with _CACHE_LOCK:
        hit = _TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    out = build().localCheckpoint(eager=True)
    winner, evicted = out, None
    with _CACHE_LOCK:
        raced = _TABLE_CACHE.get(key)
        if raced is not None:
            # A concurrent builder won the race; serve its table and
            # release ours (both are correct — build is pure).
            winner, evicted = raced, out
        else:
            if len(_TABLE_CACHE) >= _TABLE_CACHE_MAX:
                evicted = _TABLE_CACHE.pop(next(iter(_TABLE_CACHE)))
            _TABLE_CACHE[key] = out
    if evicted is not None:
        _release(evicted)
    return winner


def prime_table_memo(src: DataFrame, tag: tuple, df: DataFrame) -> bool:
    """Insert ``df`` as the session-memo entry for (corpus of ``src``,
    ``tag``) — the read-through seam for PERSISTED derivative tables
    (sources/dedup_index.ensure_signature_tables): a table read back
    from storage replaces the in-session build, so the first
    construction over the corpus is already warm. The caller owns the
    correctness contract: ``df`` must equal what the tag's builder
    would produce over ``src``. No-op (returns False) when the corpus
    identity can't be keyed, or when the slot is already populated
    (an existing localCheckpoint'd entry is at least as good)."""
    key = _group_cache_key(src, "", "")
    if key is None:
        return False
    key = key + tag
    evicted = None
    with _CACHE_LOCK:
        if key in _TABLE_CACHE:
            return False
        if len(_TABLE_CACHE) >= _TABLE_CACHE_MAX:
            evicted = _TABLE_CACHE.pop(next(iter(_TABLE_CACHE)))
        _TABLE_CACHE[key] = df
    if evicted is not None:
        _release(evicted)
    return True


def peek_group_memo(docs: DataFrame, *, id_col: str, text_col: str):
    """The session's existing ``_exact_groups`` memo entry for this
    corpus, or None. Lets the persisted-store reuse path key its
    table primes off the base plan operators will ACTUALLY resolve
    to (the memoized one), instead of inserting dead entries under a
    freshly reconstructed base nobody looks up."""
    key = _group_cache_key(docs, id_col, text_col)
    if key is None:
        return None
    with _CACHE_LOCK:
        return _GROUP_CACHE.get(key)


def prime_group_memo(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    members: DataFrame | None,
    base: DataFrame,
    has_dups: bool,
) -> bool:
    """Insert a precomputed ``_exact_groups`` result into the session
    memo — the read-through seam for the PERSISTED group table
    (sources/dedup_index.ensure_signature_tables): a fresh session
    reads (members, base, has_dups) back from storage instead of
    re-running the corpus-sized fingerprint aggregate. The caller
    owns the correctness contract: the tuple must equal what
    ``_exact_groups(docs, ...)`` would compute. No-op (False) when
    the corpus can't be keyed or the slot is already populated."""
    key = _group_cache_key(docs, id_col, text_col)
    if key is None:
        return False
    entry = (members if has_dups else None, base, has_dups)
    evicted = None
    with _CACHE_LOCK:
        if key in _GROUP_CACHE:
            return False
        if len(_GROUP_CACHE) >= _GROUP_CACHE_MAX:
            evicted = _GROUP_CACHE.pop(next(iter(_GROUP_CACHE)))
        _GROUP_CACHE[key] = entry
    if evicted is not None:
        _release(evicted[0])
    return True


# Leaf plan nodes whose semanticHash fully determines their DATA:
# LocalRelation/OneRowRelation embed the rows in the plan itself,
# Range is generated from its literal bounds, and LogicalRDD (what
# createDataFrame analyzes to on this build) hashes by RDD identity —
# RDDs are immutable and two frames with different rows get different
# RDD ids (verified: identical-data frames hash DIFFERENTLY, i.e.
# only misses are possible, never false hits). An "unchanged plan,
# changed data" situation is impossible for all of these, so they are
# safe to memoize with no file snapshot.
_IMMUTABLE_LEAVES = ("LocalRelation", "OneRowRelation", "Range", "LogicalRDD")


def _leaf_audit(docs: DataFrame) -> tuple[bool, bool]:
    """(snapshotable, has_file_leaf) over the analyzed plan's leaves.

    ``snapshotable`` is True iff EVERY leaf is either a plan-embedded
    immutable relation (_IMMUTABLE_LEAVES) or a file-scan relation
    whose data the key observes through the inputFiles()
    (uri, size, mtime) snapshot. Anything else — JDBC relations, Hive
    tables, DSv2 tables (Delta/Iceberg/Kafka), streaming relations —
    is mutable in place under a STABLE semanticHash with no file
    evidence, so a plan containing one must not be memoized. This is
    checked on EVERY keying, not only when inputFiles() is empty: a
    plan that JOINS a parquet corpus with a catalog/JDBC side reports
    the parquet files and would otherwise hide the mutable leaf
    behind them. Subquery-expression plans are not main-tree leaves
    and are not walked — same blind spot as inputFiles() itself;
    callers embedding subqueries against mutable sources must clear
    the memo by hand.

    ``has_file_leaf`` lets the caller keep the empty-dir
    conservatism: a file scan with ZERO current files has a stable
    semanticHash but files can appear under it later."""
    leaves = docs._jdf.queryExecution().analyzed().collectLeaves()
    has_file_leaf = False
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        name = leaf.getClass().getSimpleName()
        if any(name.startswith(ok) for ok in _IMMUTABLE_LEAVES):
            continue
        if name.startswith("LogicalRelation"):
            # V1 relation wrapper: file scans (HadoopFsRelation) are
            # snapshotted via inputFiles; JDBCRelation and friends
            # have no file evidence — decline.
            rel = leaf.relation().getClass().getSimpleName()
            if rel.startswith("HadoopFsRelation"):
                has_file_leaf = True
                continue
            return (False, has_file_leaf)
        return (False, has_file_leaf)
    return (True, has_file_leaf)


def _group_cache_key(docs: DataFrame, id_col: str, text_col: str):
    """Cache key for _exact_groups, or None when identity can't be
    established cheaply (then the guard just recomputes)."""
    try:
        snapshotable, has_file_leaf = _leaf_audit(docs)
        if not snapshotable:
            # A leaf is mutable-in-place under a stable semanticHash
            # (catalog/JDBC/DSv2 table): an in-place mutation
            # mid-session would silently serve stale memoized tables.
            # Skip the memo (recompute is merely slower, never wrong).
            return None
        sem = docs._jdf.queryExecution().analyzed().semanticHash()
        app = docs.sparkSession.sparkContext.applicationId
        files = []
        for uri in sorted(docs.inputFiles()):
            p = uri[7:] if uri.startswith("file://") else uri
            try:
                st = os.stat(p)
                files.append((uri, st.st_size, st.st_mtime_ns))
            except OSError:
                files.append((uri, -1, -1))
        if not files and has_file_leaf:
            # A file scan with zero current files (empty-dir read):
            # stable semanticHash, but files can appear under the
            # same plan later — nothing to snapshot, so don't memoize.
            return None
        return (app, id_col, text_col, sem, tuple(files))
    except Exception:
        return None


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct (whitespace/case-normalized) content,
    choosing the smallest id (deterministic winner). min_by keeps the
    aggregation single-pass with partial (map-side) combine — no window,
    no sort."""
    fp = doc_fingerprint(text_col)
    keyed = df.withColumn("__fp", fp)
    agg = keyed.groupBy("__fp").agg(
        F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count")
    )
    return agg.select(id_col, "dup_count", F.col("__fp").alias("fingerprint"))


def _exact_groups(
    docs: DataFrame, *, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame, bool]:
    """Exact-duplicate pre-collapse — the hot-bucket guard shared by
    the LSH pair family (minhash_lsh_pairs, simhash_pairs,
    ngram_jaccard_pairs).

    THE problem it solves: a web-scale corpus is guaranteed to contain
    mega-groups of byte-identical boilerplate (cookie banners, license
    stubs, error pages). Those documents have identical shingle sets,
    hence identical signatures, hence land in the SAME band bucket —
    and a bucket of m identical docs materializes m^2/2 candidate rows
    inside the banded self-join. AQE skew-join splitting spreads that
    shuffle but cannot shrink it: the blowup is in the OUTPUT of the
    join, not its partitioning. Collapsing each distinct normalized
    content to ONE representative before signatures turns the
    mega-bucket into a single row per band; the (definitionally
    correct, similarity 1.0) intra-group pairs are reconstructed
    afterwards by an equi-join on the group key — output-sized work,
    never an LSH blowup.

    Groups are keyed on ``doc_fingerprint`` (md5 of lowercased,
    whitespace-normalized text) — exactly the normalization the
    shingle pipeline applies, so fingerprint-equal docs are
    guaranteed shingle-identical and therefore signature-identical;
    collapse + expansion provably returns the SAME pair set as the
    uncollapsed join (pinned by tests and by the unchanged DuckDB
    oracles). NULL-text docs get a SENTINEL fingerprint (md5 of NULL
    is NULL, and a NULL key silently falls out of every equi-join —
    the group machinery would otherwise drop those docs' pairs, a bug
    the NULL hostile tier caught in r06), forming one proper group
    whose rep carries NULL text; whether that group pairs is then
    each caller's existing semantics (MinHash/Jaccard: no shingles,
    no pairs; SimHash: fingerprint 0, pairs at hamming 0).

    Returns ``(members, base, has_dups)``:
      members   (id, rep_id) for docs in DUPLICATE groups only (group
                size >= 2, rep = min id); slim, localCheckpoint'd;
                None on the fast path
      base      the collapsed corpus, doc-shaped: the original docs
                minus every non-representative duplicate (so each
                distinct content keeps exactly its min-id ROW — text
                untouched); ``docs`` itself on the fast path
      has_dups  False when every group has size 1 — callers use it to
                skip the expansion joins entirely on already-clean
                corpora (one 1-row driver aggregate on the collapsed
                group table, the kmeans-centroid collect discipline)

    Scale shape — TEXT NEVER SHUFFLES in any path:
      * dup-existence check: one job over (fingerprint, id) — ~24
        combinable bytes/doc; nothing materialized on a clean corpus.
      * sparse collapse (dups exist): ``members`` covers only the
        duplicate groups — at web scale that is the boilerplate set,
        orders of magnitude smaller than the corpus — and ``base`` is
        an id anti-join of docs against the non-rep member ids, which
        AQE executes as a broadcast anti-join whenever the dup set is
        broadcastable. The corpus text column rides through untouched
        projections only; the worst case (dup set too big to
        broadcast) is one id-keyed shuffle, the same cost the old
        min_by-collapse paid always.

    EAGERNESS CONTRACT: this function (and therefore building any
    collapse_exact=True operator plan) runs Spark jobs at DataFrame-
    CONSTRUCTION time — the 1-row dup-existence aggregate, plus the
    members localCheckpoint when dups exist. Plan-only consumers
    (explain tooling, plan-fingerprint ledgers) should pass
    ``collapse_exact=False`` to the callers, or accept the one-time
    cost: results are memoized per (corpus plan, id_col, text_col)
    for the session (see ``_group_cache_key``), so every subsequent
    construction over the same corpus — the rest of the LSH family,
    composites, repeated explains — is free. ``clear_exact_group_
    cache()`` drops the memo.
    """
    key = _group_cache_key(docs, id_col, text_col)
    if key is not None:
        with _CACHE_LOCK:
            hit = _GROUP_CACHE.get(key)
        if hit is not None:
            return hit
    fp_col = F.coalesce(doc_fingerprint(text_col), F.lit("__null__"))
    keyed = _spread(docs).select(
        F.col(id_col).alias("id"),
        fp_col.alias("__fp"),
    )
    sizes_plan = keyed.groupBy("__fp").agg(
        F.min("id").alias("rep_id"), F.count(F.lit(1)).alias("grp_n")
    )
    # Fast path costs exactly ONE job: the max-group-size aggregate
    # (fully map-side combinable — the shuffled rows are one per
    # distinct fingerprint per partition). Nothing is materialized
    # unless duplicates actually exist.
    has_dups = (
        sizes_plan.agg(F.max("grp_n").alias("m")).collect()[0]["m"] or 0
    ) > 1
    if not has_dups:
        result = (None, docs, False)
    else:
        dup_groups = sizes_plan.filter(F.col("grp_n") > 1).select(
            "__fp", "rep_id"
        )
        members = (
            keyed.join(dup_groups, "__fp")
            .select("id", "rep_id")
            .localCheckpoint(eager=True)
        )
        non_reps = members.filter(F.col("id") != F.col("rep_id")).select(
            F.col("id").alias("__nr_id")
        )
        base = docs.join(
            non_reps, F.col(id_col) == F.col("__nr_id"), "left_anti"
        )
        result = (members, base, True)
    if key is not None:
        evicted = None
        with _CACHE_LOCK:
            raced = _GROUP_CACHE.get(key)
            if raced is not None:
                # Concurrent builder won; serve its (identical) result
                # and release our members checkpoint.
                result, evicted = raced, result
            else:
                if len(_GROUP_CACHE) >= _GROUP_CACHE_MAX:
                    evicted = _GROUP_CACHE.pop(next(iter(_GROUP_CACHE)))
                _GROUP_CACHE[key] = result
        if evicted is not None:
            _release(evicted[0])
    return result


def _expand_rep_pairs(
    rep_pairs: DataFrame, members: DataFrame, score_cols: list[str]
) -> DataFrame:
    """Expand representative-level pairs back to document-level pairs:
    every (member of group A) x (member of group B) inherits the group
    pair's score columns (signatures are identical within a group, so
    the score is exact, not an approximation). least/greatest restores
    the id_a < id_b convention; each unordered doc pair appears exactly
    once because each unordered group pair does. ``members`` is sparse
    (duplicate groups only), so the joins are LEFT with a coalesce
    fallback to the rep id itself: a singleton-group endpoint simply
    stays as-is, and both join sides are dup-set-sized — broadcastable
    at scale, output-sized always, never an LSH bucket blowup."""
    m_a = members.select(
        F.col("rep_id").alias("id_a"), F.col("id").alias("__ma")
    )
    m_b = members.select(
        F.col("rep_id").alias("id_b"), F.col("id").alias("__mb")
    )
    return (
        rep_pairs.join(m_a, "id_a", "left")
        .join(m_b, "id_b", "left")
        .select(
            F.least(
                F.coalesce("__ma", "id_a"), F.coalesce("__mb", "id_b")
            ).alias("id_a"),
            F.greatest(
                F.coalesce("__ma", "id_a"), F.coalesce("__mb", "id_b")
            ).alias("id_b"),
            *score_cols,
        )
    )


def _intra_group_pairs(members: DataFrame) -> DataFrame:
    """All (id_a < id_b) pairs WITHIN exact-duplicate groups — the
    pairs the collapse removed from the banded join. Generated by a
    self equi-join on the group key: the m^2/2 rows per group are the
    caller-requested OUTPUT (these docs are duplicates by definition),
    produced directly by a hash join instead of surviving an LSH
    bucket explosion times `bands` plus a dropDuplicates."""
    a = members.select("rep_id", F.col("id").alias("id_a"))
    b = members.select("rep_id", F.col("id").alias("id_b"))
    return (
        a.join(b, "rep_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "rep_id")
    )


def word_shingles(text: ColumnOrName, n: int = 3) -> Column:
    """Distinct n-word shingles of lowercased text, as strings.

    Docs with fewer than ``n`` tokens produce an EMPTY array — the
    sequence bound must be guarded because Spark's ``sequence(0, -1)``
    yields a descending [0, -1], not an empty range.
    """
    t = F.lower(F.trim(_col(text)))
    toks = F.filter(F.split(t, r"\s+"), lambda x: x != "")
    # shingle i = tokens[i..i+n-1] joined by space, for i in 0..len-n
    sh = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(sh)


def shingle_rows(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """Exploded (id, s) shingle rows — the whole-stage-codegen path.

    Same shingle set as :func:`word_shingles` + explode, but built from
    posexplode(split) + window ``lead`` instead of per-row array
    higher-order functions: transform/slice/concat_ws lambdas evaluate
    INTERPRETED in Spark, and profiling showed the HOF pipeline (not
    the downstream join) was ~80% of ngram_jaccard_pairs' wall time.
    Generate + window + hash-aggregate all stay in codegen.

    ``lead`` over the empty-token-filtered sequence preserves adjacency
    exactly as slicing the filtered token array does. Docs with fewer
    than ``n`` tokens yield no rows (the trailing lead is NULL).
    """
    from pyspark.sql.window import Window

    t = F.lower(F.trim(_col(text_col)))
    ex = (
        _spread(docs)
        .select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(t, r"\s+")).alias("pos", "tok"),
        )
        .filter(F.col("tok") != "")
    )
    w = Window.partitionBy("id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    sh = (
        ex.select("id", F.concat_ws(" ", *parts).alias("s"), parts[-1].alias("__last"))
        .filter(F.col("__last").isNotNull())
        .select("id", "s")
    )
    return sh.dropDuplicates(["id", "s"]) if distinct else sh


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_jaccard: float = 0.5,
    collapse_exact: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs via shingle inverted index.

    Plan shape: shingle rows (codegen, see :func:`shingle_rows`) →
    self equi-join on shingle → groupBy(pair) count intersection →
    Jaccard from |A|+|B|-|∩|. The equi-join on shingle is a plain hash
    join — no all-pairs blowup; hot shingles (stop-phrases) are the
    skew risk, handled by AQE skew split. Returns (id_a, id_b, jaccard)
    with id_a < id_b.

    ``collapse_exact`` (default ON) is the hot-bucket guard shared
    with minhash_lsh_pairs — see :func:`_exact_groups`. For this
    operator the blowup is even worse uncollapsed: m identical docs
    share EVERY shingle, so the inverted-index join emits
    m^2/2 x |shingles| intersection rows before the groupBy.
    Collapsed, identical content contributes one posting per shingle;
    intra-group pairs return as exact jaccard 1.0 via an output-sized
    equi-join. Result set identical to the uncollapsed join.
    """
    from pyspark.sql.window import Window

    members = None
    base = docs
    if collapse_exact:
        members, base, has_dups = _exact_groups(
            docs, id_col=id_col, text_col=text_col
        )
    # Carry |shingles| on each row via a window count so no per-doc side
    # table (which must never be broadcast at scale) is needed, then
    # materialize: the text->shingle pipeline is the expensive part and
    # both self-join sides would otherwise recompute it. The whole
    # pipeline is constructed INSIDE the builder so a memo hit (session
    # or persisted signature store) does zero plan work.
    ex = _memo_checkpoint(
        base,
        ("shingle_ex", id_col, text_col, n),
        lambda: shingle_rows(
            base, id_col=id_col, text_col=text_col, n=n
        ).withColumn(
            "n_sh", F.count(F.lit(1)).over(Window.partitionBy("id"))
        ),
    )
    a = ex.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"), "s")
    b = ex.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"), "s")
    inter = (
        a.join(b, on="s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = inter.select(
        "id_a",
        "id_b",
        (
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        ).alias("jaccard"),
    )
    out = out.filter(F.col("jaccard") >= min_jaccard)
    if members is None:
        return out
    inter_exp = _expand_rep_pairs(out, members, ["jaccard"])
    # Intra-group pairs only for groups that shingle at all (docs with
    # fewer than n tokens never pair — same rule as the plain join);
    # identical shingle sets make the Jaccard exactly 1.0.
    shingled = ex.select(F.col("id").alias("rep_id")).distinct()
    intra = (
        _intra_group_pairs(members)
        .join(shingled, "rep_id")
        .select("id_a", "id_b", F.lit(1.0).alias("jaccard"))
        .filter(F.lit(1.0) >= F.lit(float(min_jaccard)))
    )
    return inter_exp.unionByName(intra)


def _md5_hash64(c: Column, salt: int) -> Column:
    """Portable 60-bit hash: md5 of salted input, first 15 hex chars.

    conv(hex, 16, 10) — same value any engine can compute from its own
    md5(); used for MinHash permutations so oracle SQL can reproduce
    signatures exactly.
    """
    h = F.md5(F.concat(F.lit(f"s{salt}|"), c))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")


def minhash_signature(text: ColumnOrName, num_hashes: int = 16, n: int = 3) -> Column:
    """MinHash signature: per permutation h_i, min over shingles of
    md5-hash64(salt_i || shingle). Array<bigint> of length num_hashes.

    The per-permutation lambda MUST be built by a one-arg closure
    factory: a ``lambda s, i=i`` would have arity 2, which PySpark
    interprets as the (element, index) form — the array index would
    silently replace the salt.
    """
    return _minhash_from_shingles(word_shingles(text, n), num_hashes)


def _minhash_from_shingles(sh: Column, num_hashes: int) -> Column:
    """MinHash signature from an already-computed shingle array column.

    Callers that reference the signature should materialize the shingle
    array in its OWN projection first (two-step select): this expression
    references ``sh`` ``num_hashes`` times, and if the shingle expression
    is inlined the tokenizer/slicer work runs num_hashes times per row
    (measured 8x slower at 16 hashes). A separate projection keeps
    CollapseProject from inlining it.
    """

    def hash_with_salt(i: int):
        return lambda s: _md5_hash64(s, i)

    mins = [
        F.array_min(F.transform(sh, hash_with_salt(i)))
        for i in range(num_hashes)
    ]
    return F.array(*mins)


def minhash_signature_table(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-doc MinHash signatures as ``(id, sig array<bigint>)`` rows.

    Signature via shingle rows + groupBy(min x num_hashes), NOT per-row
    array higher-order functions: min/md5/conv inside a hash aggregate
    run in whole-stage codegen with map-side partial combine, while
    transform/array_min lambdas evaluate interpreted (measured ~4x
    slower). distinct=False: min() is idempotent under duplicate
    shingles, so the dedup shuffle is skipped. Docs with no shingles
    (shorter than shingle_n) produce no rows — correct, since they
    can't be near-duplicates under this similarity.
    """
    ex = shingle_rows(
        docs, id_col=id_col, text_col=text_col, n=shingle_n, distinct=False
    )
    return (
        ex.groupBy("id")
        .agg(
            *[
                F.min(_md5_hash64(F.col("s"), i)).alias(f"h{i}")
                for i in range(num_hashes)
            ]
        )
        .select(
            "id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
        )
    )


def lsh_band_keys(
    sig_col: str = "sig", *, num_hashes: int = 16, bands: int = 4
) -> Column:
    """array<string> of ``bands`` LSH band keys: md5 over the band's
    signature slice, prefixed with the band index (so equal slices in
    different bands never collide)."""
    rows_per_band = num_hashes // bands
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    F.lit(str(b)),
                    *[
                        F.col(sig_col)[i].cast("string")
                        for i in range(
                            b * rows_per_band, (b + 1) * rows_per_band
                        )
                    ],
                )
            )
            for b in range(bands)
        ]
    )


def minhash_est_jaccard(
    sig_a: str = "sig_a", sig_b: str = "sig_b", *, num_hashes: int = 16
) -> Column:
    """MinHash Jaccard estimate: fraction of equal signature positions."""
    return (
        F.size(
            F.filter(
                F.zip_with(sig_a, sig_b, lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / F.lit(float(num_hashes))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    min_jaccard: float | None = 0.5,
    collapse_exact: bool = True,
    max_band_bucket: int | None = None,
) -> DataFrame:
    """MinHash + LSH banding near-duplicate candidate pairs.

    num_hashes/bands rows per band; docs sharing ANY full band collide.
    Candidates then get an exact MinHash-estimate filter (fraction of
    equal signature positions ≈ Jaccard). At 100 TB the only shuffles
    are groupBy(band_key) — keys are short hashes, heavily combinable.
    Returns (id_a, id_b, est_jaccard).

    Hot-bucket guards (the classic web-scale LSH-dedup killers):

    ``collapse_exact`` (default ON) pre-collapses byte-identical
    (whitespace/case-normalized) documents to one representative
    before signatures — see :func:`_exact_groups` — so a mega-group of
    m identical boilerplate docs occupies ONE row per band bucket
    instead of detonating m^2/2 candidate rows inside the banded
    self-join. The intra-group pairs (est_jaccard exactly 1.0 —
    identical signatures) are reconstructed by an output-sized
    equi-join on the group key; the result set is IDENTICAL to the
    uncollapsed join (unchanged DuckDB oracle proves it). When the
    corpus has no exact dups the expansion is skipped and the plan is
    exactly the pre-guard plan.

    ``max_band_bucket`` (default off) bounds the residual risk the
    collapse can't remove — near-identical-but-not-byte-identical
    TEMPLATED boilerplate that still floods one band bucket. When set,
    each band bucket keeps only its ``max_band_bucket`` smallest doc
    ids (deterministic truncation, reproducible in any engine via a
    rank window), capping candidate generation at C(cap, 2) per
    bucket. Recall trade-off: pairs both of whose members rank beyond
    the cap in EVERY shared bucket are missed — acceptable for dedup
    because a flooded bucket is precisely a near-dup cluster, whose
    members the survivor-selection step collapses through the capped
    members' transitive links anyway. Exact-dup pairs are never capped
    (they bypass banding entirely via the collapse).
    """
    members = None
    base = docs
    if collapse_exact:
        members, base, has_dups = _exact_groups(
            docs, id_col=id_col, text_col=text_col
        )
    # Materialize signatures before the self-join: the signature table is
    # tiny relative to the corpus (num_hashes longs + id per doc), while
    # the text->shingle->hash pipeline above is the expensive part —
    # without a materialization boundary both join sides (plus the
    # dedup/estimate stages) each recompute it (measured 5x at sf0.1;
    # 120s -> 14s). At production scale this boundary is a checkpoint or
    # an intermediate signature table write; locally executor storage
    # suffices — and the session memo shares it with every other query
    # over the same corpus/parameters (capped + uncapped + composites).
    sig = _memo_checkpoint(
        base,
        ("minhash_sig", id_col, text_col, num_hashes, shingle_n),
        lambda: minhash_signature_table(
            base, id_col=id_col, text_col=text_col,
            num_hashes=num_hashes, shingle_n=shingle_n,
        ),
    )

    banded = sig.select(
        "id",
        "sig",
        F.explode(
            lsh_band_keys("sig", num_hashes=num_hashes, bands=bands)
        ).alias("band_key"),
    )
    if max_band_bucket is not None:
        from pyspark.sql.window import Window

        banded = (
            banded.withColumn(
                "__rk",
                F.row_number().over(
                    Window.partitionBy("band_key").orderBy("id")
                ),
            )
            .filter(F.col("__rk") <= max_band_bucket)
            .drop("__rk")
        )
    a = banded.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band_key")
    b_ = banded.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band_key")
    cand = (
        a.join(b_, on="band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    est = cand.select(
        "id_a",
        "id_b",
        minhash_est_jaccard(
            "sig_a", "sig_b", num_hashes=num_hashes
        ).alias("est_jaccard"),
    )
    if min_jaccard is not None:
        est = est.filter(F.col("est_jaccard") >= min_jaccard)
    if members is None:
        return est
    inter = _expand_rep_pairs(est, members, ["est_jaccard"])
    # Intra-group pairs only for groups whose rep HAS a signature:
    # docs shorter than shingle_n produce no signature and never pair
    # (same rule as the uncollapsed join).
    intra = (
        _intra_group_pairs(members)
        .join(sig.select(F.col("id").alias("rep_id")), "rep_id")
        .select("id_a", "id_b", F.lit(1.0).alias("est_jaccard"))
    )
    if min_jaccard is not None:
        intra = intra.filter(F.lit(1.0) >= F.lit(float(min_jaccard)))
    return inter.unionByName(intra)


def _hexmap() -> Column:
    """Literal map hex-char -> value 0..15; a map lookup works inside
    lambda expressions (unlike shift functions, whose shift count must
    be a Python literal) and has a trivial SQL twin (strpos into a hex
    digit string). Built lazily — Column literals need a live session."""
    pairs = [(c, int(c, 16)) for c in "0123456789abcdef"]
    return F.create_map(*[F.lit(x) for pair in pairs for x in pair])


def _bits64(s: Column) -> Column:
    """array<int> of 64 bits (0/1) of md5(s): hex char j (1-based, first
    16 chars) contributes bits 4j-4..4j-1 as (v, v/2, v/4, v/8) % 2."""
    hexmap = _hexmap()
    chars = F.split(F.substring(F.md5(s), 1, 16), "")
    return F.flatten(
        F.transform(
            chars,
            lambda c: F.array(
                (F.element_at(hexmap, c) % 2).cast("int"),
                (F.floor(F.element_at(hexmap, c) / 2) % 2).cast("int"),
                (F.floor(F.element_at(hexmap, c) / 4) % 2).cast("int"),
                (F.floor(F.element_at(hexmap, c) / 8) % 2).cast("int"),
            ),
        )
    )


# Signed weight of bit position i in a two's-complement bigint.
_BIT_WEIGHTS = [2**i for i in range(63)] + [-(2**63)]


def simhash64(text: ColumnOrName, n: int = 2) -> Column:
    """64-bit SimHash over word n-grams, built from md5 bits (portable).

    Single pass over the shingle array: the accumulator is an array of
    64 vote counters; each shingle contributes +1/-1 per bit position
    (via zip_with), and the fingerprint bit is the vote's sign. All
    JVM-side array expressions — no UDF, no per-bit re-scan of the
    shingles. Returns bigint (may be negative: bit 63 is the sign bit).
    Empty shingle sets (short docs) yield fingerprint 0.
    """
    sh = word_shingles(text, n)
    votes = F.aggregate(
        sh,
        F.array_repeat(F.lit(0).cast("bigint"), 64),
        lambda acc, s: F.zip_with(
            acc, _bits64(s), lambda a, b: a + 2 * b.cast("bigint") - 1
        ),
    )
    weights = F.array(*[F.lit(w).cast("bigint") for w in _BIT_WEIGHTS])
    return F.aggregate(
        F.zip_with(votes, weights, lambda v, w: F.when(v > 0, w).otherwise(F.lit(0).cast("bigint"))),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )


def simhash_fingerprints(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """Per-doc 64-bit SimHash as ``(id, simhash)`` rows.

    Computes the same fingerprints as :func:`simhash64` but via explode
    + groupBy with 64 codegen'd SUM aggregates (one per bit position)
    instead of per-row array lambdas: interpreted higher-order functions
    were the entire cost of the column-expression form (measured 4x).
    Per exploded shingle, md5 is computed once and its 16 hex chars are
    decoded once; each bit is a shift+mod of one char value.
    """
    ex = shingle_rows(docs, id_col=id_col, text_col=text_col, n=n)
    # Decode the 16 md5 hex chars as 4x 16-bit chunks (4 conv() string
    # parses per shingle instead of 16 — measured ~15% off the vote
    # stage). Chunk j packs hex chars 4j..4j+3 big-endian, so the bit
    # that the 1-char form read as (char[p//4] >> (p%4)) & 1 sits at
    # chunk bit (3 - (p%16)//4)*4 + p%4 — the shift below preserves the
    # EXACT fingerprint bit order (oracle-compatible).
    hexed = ex.select(
        "id",
        *[
            F.conv(F.substring(F.md5("s"), 4 * j + 1, 4), 16, 10)
            .cast("int")
            .alias(f"c{j}")
            for j in range(4)
        ],
    )
    # votes[p] = sum over shingles of (2*bit_p - 1); null shingles sum
    # to null votes.
    votes = hexed.groupBy("id").agg(
        *[
            F.sum(
                2
                * (
                    F.shiftright(
                        F.col(f"c{p // 16}"),
                        (3 - (p % 16) // 4) * 4 + p % 4,
                    )
                    % 2
                )
                - 1
            ).alias(f"v{p}")
            for p in range(64)
        ]
    )
    # fingerprint = Σ_p (votes[p] > 0 ? weight_p : 0)
    fp_expr = None
    for p in range(64):
        term = F.when(F.col(f"v{p}") > 0, F.lit(_BIT_WEIGHTS[p]).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        fp_expr = term if fp_expr is None else fp_expr + term
    f = votes.select("id", fp_expr.alias("simhash"))
    # Docs too short to shingle have no rows above; re-attach them with
    # fingerprint 0 (the reference semantics for empty shingle sets).
    all_ids = _spread(docs).select(F.col(id_col).alias("id"))
    return all_ids.join(f, on="id", how="left").select(
        "id", F.coalesce("simhash", F.lit(0).cast("bigint")).alias("simhash")
    )


def simhash_buckets(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    memo: bool = True,
) -> DataFrame:
    """Group docs by SimHash fingerprint; rows with dup_count > 1 are
    near-duplicate clusters (identical fingerprints).

    With ``memo`` (default ON) the fingerprint table is materialized
    through the session memo — EAGER at DataFrame-construction time on
    a cold key, like the collapse guard — and shares its TAG with
    simhash_pairs (same pure function of (corpus, n)): on a clean
    corpus, where the pair operator's collapsed base IS the input, the
    two queries reuse one table. Plan-only consumers pass
    ``memo=False`` for the fully lazy un-checkpointed pipeline."""
    if memo:
        f = _memo_checkpoint(
            docs,
            ("simhash_fp", id_col, text_col, n),
            lambda: simhash_fingerprints(
                docs, id_col=id_col, text_col=text_col, n=n
            ),
        )
    else:
        f = simhash_fingerprints(docs, id_col=id_col, text_col=text_col, n=n)
    return f.groupBy("simhash").agg(
        F.min("id").alias("min_id"), F.count(F.lit(1)).alias("dup_count")
    )


def simhash_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    max_hamming: int = 3,
    collapse_exact: bool = True,
    max_band_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs within ``max_hamming`` SimHash bits.

    Candidate generation is EXACT for max_hamming <= 3: the 64-bit
    fingerprint splits into 4 disjoint 16-bit bands, and by pigeonhole
    any pair differing in <= 3 bits leaves at least one band untouched
    — so the banded equi-join on (band_index, band_value) finds every
    qualifying pair with zero recall loss (the Manku/Jarvelin-style
    multi-table probe, done as one explode + one shuffle instead of 4
    separate joins). Candidates are then refined with the exact popcount
    of the XOR. At 100 TB: fingerprints are 8 bytes/doc, the self-join
    key is a short (band, 16-bit chunk) pair, and nothing all-pairs ever
    materializes.

    Hot-bucket guards, same design as :func:`minhash_lsh_pairs`:
    ``collapse_exact`` pre-collapses identical normalized content to
    one representative (see :func:`_exact_groups`) so identical-
    fingerprint mega-buckets of byte-identical boilerplate never enter
    the banded join; intra-group pairs come back at hamming 0 via an
    output-sized equi-join. Unlike MinHash, EVERY group participates —
    unshingleable docs carry fingerprint 0 (including the NULL-text
    group), exactly the uncollapsed semantics. ``max_band_bucket``
    truncates each (band, chunk) bucket to its smallest ids for
    residual templated-boilerplate floods (deterministic; same recall
    trade-off note as minhash_lsh_pairs).

    Returns (id_a, id_b, hamming), id_a < id_b.
    """
    members = None
    base = docs
    if collapse_exact:
        members, base, has_dups = _exact_groups(
            docs, id_col=id_col, text_col=text_col
        )
    # Materialize the tiny (id, simhash) table so the expensive
    # text->shingle->vote pipeline runs once, not once per join side
    # (and, via the session memo, once per corpus across queries).
    fp = _memo_checkpoint(
        base,
        ("simhash_fp", id_col, text_col, n),
        lambda: simhash_fingerprints(
            base, id_col=id_col, text_col=text_col, n=n
        ),
    )
    bands = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * b)
                        .bitwiseAND(F.lit(65535))
                        .alias("chunk"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", "bk.band", "bk.chunk")
    if max_band_bucket is not None:
        from pyspark.sql.window import Window

        bands = (
            bands.withColumn(
                "__rk",
                F.row_number().over(
                    Window.partitionBy("band", "chunk").orderBy("id")
                ),
            )
            .filter(F.col("__rk") <= max_band_bucket)
            .drop("__rk")
        )
    a = bands.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("fp_a"), "band", "chunk"
    )
    b_ = bands.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("fp_b"), "band", "chunk"
    )
    rep_pairs = (
        a.join(b_, on=["band", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
            .cast("bigint")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
    if members is None:
        return rep_pairs
    inter = _expand_rep_pairs(rep_pairs, members, ["hamming"])
    intra = _intra_group_pairs(members).select(
        "id_a", "id_b", F.lit(0).cast("bigint").alias("hamming")
    )
    return inter.unionByName(intra)


def _dup_span_pipeline(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int,
    min_count: int,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared candidate machinery of Lee et al. exact-substring dedup,
    consumed by both :func:`dup_span_stats` (measure) and
    :func:`dup_span_removal` (transform) so the two phases can never
    drift — the kept_tokens == n_tokens - covered_tokens cross-check
    invariant depends on them agreeing exactly.

    Returns ``(ex, dup_starts, covered)``:
      ex          dense-renumbered token stream (id, pos, tok) —
                  positions re-numbered over the empty-filtered split
                  so multi-space runs leave no gaps
      dup_starts  start positions (id, pos) of spans whose text occurs
                  >= min_count times corpus-wide
      covered     DISTINCT token positions (id, pos) covered by >=1
                  duplicated span (sequence-explode of dup_starts)
    """
    from pyspark.sql.window import Window

    t = F.lower(F.trim(F.col(text_col)))
    ex = (
        _spread(docs)
        .select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(t, r"\s+")).alias("p", "tok"),
        )
        .filter(F.col("tok") != "")
    )
    w = Window.partitionBy("id").orderBy("p")
    ex = ex.select("id", (F.row_number().over(w) - 1).alias("pos"), "tok")
    parts = [F.col("tok")] + [
        F.lead("tok", i).over(Window.partitionBy("id").orderBy("pos"))
        for i in range(1, n)
    ]
    spans = (
        ex.select(
            "id",
            "pos",
            F.concat_ws(" ", *parts).alias("s"),
            parts[-1].alias("__last"),
        )
        .filter(F.col("__last").isNotNull())
        .select("id", "pos", "s")
    )
    dup = (
        spans.groupBy("s")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") >= min_count)
        .select("s")
    )
    dup_starts = spans.join(dup, "s").select("id", "pos")
    covered = (
        dup_starts.select(
            "id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + n - 1)
            ).alias("pos"),
        )
        .distinct()
    )
    return ex, dup_starts, covered


def dup_span_stats(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    min_count: int = 2,
) -> DataFrame:
    """Duplicate n-token-span coverage per document — the measurement
    phase of exact substring deduplication (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better": remove
    any span repeated verbatim across the corpus; their 50-token spans
    scale here to ``n`` tokens). Per document:

      n_tokens        whitespace tokens
      n_spans         distinct span start positions (n_tokens - n + 1)
      n_dup_spans     spans whose text occurs >= min_count times
                      corpus-wide (counting every occurrence, including
                      repeats inside one document — Lee et al.'s
                      definition, which also catches self-repetition)
      covered_tokens  token positions covered by >=1 duplicated span
                      (what span-removal would delete)
      dup_frac        covered_tokens / n_tokens

    Docs with fewer than ``n`` tokens emit zero counts (unassessable).

    Scale shape (100 TB): positional shingles via the codegen
    posexplode + lead pipeline (see shingle_rows); the global span
    frequency is ONE map-side-combined aggregate on the span string;
    only spans that beat ``min_count`` flow back — an equi-join on the
    span key against the (typically tiny) duplicated-span set.
    Position coverage is sequence-explode + per-doc distinct: output
    rows are bounded by n * dup_occurrences, never corpus x corpus.
    The per-doc distinct and final joins all hash on doc_id. No
    crossJoin, no UDF, no driver collect.
    """
    ex, dup_starts, covered = _dup_span_pipeline(
        docs, id_col=id_col, text_col=text_col, n=n, min_count=min_count
    )
    per_doc_dup = dup_starts.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_spans")
    )
    covered = covered.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("covered_tokens")
    )
    totals = ex.groupBy("id").agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"))
    base = _spread(docs).select(F.col(id_col).alias("id"))
    nz = lambda c: F.coalesce(c, F.lit(0)).cast("bigint")  # noqa: E731
    return (
        base.join(totals, "id", "left")
        .join(per_doc_dup, "id", "left")
        .join(covered, "id", "left")
        .select(
            F.col("id").alias(id_col),
            nz(F.col("n_tokens")).alias("n_tokens"),
            F.greatest(
                nz(F.col("n_tokens")) - F.lit(n - 1), F.lit(0)
            ).cast("bigint").alias("n_spans"),
            nz(F.col("n_dup_spans")).alias("n_dup_spans"),
            nz(F.col("covered_tokens")).alias("covered_tokens"),
            F.when(
                nz(F.col("n_tokens")) > 0,
                nz(F.col("covered_tokens")).cast("double")
                / nz(F.col("n_tokens")).cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
    )


def _byte_form(c: Column) -> Column:
    """Reinterpret a string's UTF-8 bytes as one ISO-8859-1 char per
    byte. levenshtein over this form is BYTE-level edit distance —
    the portable cross-engine definition (DuckDB's levenshtein is
    byte-based, Spark's is char-based; on ASCII they coincide, on
    multibyte text only the byte form agrees). Same byte-faithful
    discipline as the multimodal frame fingerprints."""
    return F.decode(F.encode(c, "UTF-8"), "ISO-8859-1")


def edit_distance_neardup(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    min_est_jaccard: float = 0.3,
    max_rel_dist: float = 0.3,
) -> DataFrame:
    """Fuzzy near-duplicate pairs with EXACT edit-distance verification
    — the candidate-verify pattern fuzzy dedup uses when Jaccard alone
    over-merges (template text with small substitutions) or
    under-merges (heavy reordering): MinHash-LSH proposes, Levenshtein
    decides.

    Per candidate pair (same banded-LSH generation as
    :func:`minhash_lsh_pairs`): byte-level Levenshtein distance of the
    normalized texts, the distance relative to the longer byte length,
    and ``is_dup`` at ``max_rel_dist``. Emits ALL candidates with the
    verdict flag (the audit view); filter ``is_dup`` for the merge set.

    Scale shape (100 TB): the quadratic-cost distance runs ONLY on the
    LSH candidate set (output of equi-joins on band keys — O(collisions),
    never corpus x corpus); text is joined back to the slim pair set by
    id equi-join. With an absolute distance cap, Spark's banded
    ``levenshtein(l, r, threshold)`` drops per-pair cost to
    O(len * threshold); the relative-cap audit form here uses the full
    computation since the cap varies per pair.
    """
    pairs = minhash_lsh_pairs(
        docs, id_col=id_col, text_col=text_col, num_hashes=num_hashes,
        bands=bands, shingle_n=shingle_n, min_jaccard=min_est_jaccard,
    )
    norm = docs.select(
        F.col(id_col).alias("__id"),
        _byte_form(F.lower(F.trim(F.col(text_col)))).alias("__t"),
    )
    a = norm.select(F.col("__id").alias("id_a"), F.col("__t").alias("t_a"))
    b = norm.select(F.col("__id").alias("id_b"), F.col("__t").alias("t_b"))
    dist = F.levenshtein("t_a", "t_b").cast("bigint")
    longer = F.greatest(F.length("t_a"), F.length("t_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            "est_jaccard",
            dist.alias("edit_dist"),
            F.when(
                longer > 0, dist.cast("double") / longer.cast("double")
            ).otherwise(F.lit(0.0)).alias("rel_dist"),
        )
        .withColumn("is_dup", F.col("rel_dist") <= max_rel_dist)
    )


def dup_span_removal(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    min_count: int = 2,
) -> DataFrame:
    """The TRANSFORM phase of Lee et al. 2021 exact-substring dedup:
    delete every token position covered by a corpus-duplicated n-token
    span and re-join the survivors — the step that
    :func:`dup_span_stats` measures. Output per document:

      n_tokens      original whitespace tokens
      kept_tokens   tokens surviving removal
      cleaned_text  surviving tokens joined by single spaces, in
                    original order (empty string when everything or
                    nothing was there to keep)

    Same candidate machinery as dup_span_stats (the shared
    :func:`_dup_span_pipeline`: one global span aggregate, equi-joins
    on the span key, coverage by sequence-explode) plus an anti-join
    of token positions against covered positions and one per-doc
    ordered reassembly (sort_array of (pos, tok) structs —
    deterministic, unlike a bare collect_list). The reassembly groups
    on doc_id: rows per group = surviving tokens of ONE document, so
    the aggregate state is document-sized, never corpus-sized.
    """
    ex, _, covered = _dup_span_pipeline(
        docs, id_col=id_col, text_col=text_col, n=n, min_count=min_count
    )
    kept = ex.join(covered, ["id", "pos"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("kept_tokens"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("tok")))
                ),
                lambda s: s["tok"],
            ),
        ).alias("cleaned_text"),
    )
    totals = ex.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens")
    )
    base = _spread(docs).select(F.col(id_col).alias("id"))
    return (
        base.join(totals, "id", "left")
        .join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce("kept_tokens", F.lit(0))
            .cast("bigint")
            .alias("kept_tokens"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )
