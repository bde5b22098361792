"""Persistent MinHash-LSH signature index — incremental dedup.

The third member of the persisted-index family (vector_index.py IVF,
text_index.py BM25): at production scale a corpus is deduplicated
ONCE, and every subsequent ingest batch must be checked against the
existing corpus WITHOUT recomputing corpus signatures — the streaming-
ingest dedup path. The reference has no dedup at all (it delegates
storage to ChromaDB/Pinecone, /root/reference/src/chroma.py:48-76);
this is north-star extension surface.

Layout on disk:

  {path}/bands/bucket=<b>/...  (band_key, id, sig) rows, one per
                               (REPRESENTATIVE doc, band), partitioned
                               by a stable hash bucket of the BAND KEY
  {path}/members               (id, rep_id) rows for docs in exact-
                               duplicate groups only (empty when the
                               corpus has none)
  {path}/META                  num_hashes / bands / shingle_n / n_buckets
  {path}/FINGERPRINT           corpus identity + build params (v2)

Hot-bucket guard (r06): the index stores signatures for exact-dup
GROUP REPRESENTATIVES only — the same `_exact_groups` collapse the
in-batch pair operators use. A mega-group of m byte-identical
boilerplate docs occupies ONE row per band bucket on disk instead of
m (a flooded stored bucket would otherwise multiply EVERY future
probe against it, forever); probes expand rep matches back to all
group members through the tiny members sidecar — output-sized, and
provably the same result set as the uncollapsed index.

Serving (probe_dedup_index) computes the NEW batch's signatures and
band keys — O(batch), not O(corpus) — derives the probe bucket set
driver-side from the batch's band keys, applies it as a PARTITION
filter on the bands scan (the dedup analog of IVF cell pruning /
BM25 term-bucket pruning: the index scan touches
|probe buckets| / n_buckets of the directories), then equi-joins on
band_key and refines candidates with the exact signature-equality
Jaccard estimate. The corpus-side signatures come straight off disk;
raw corpus text is never touched again.

The bucket hash is Spark's Murmur3 (stable across sessions for the
same input); it only needs build/serve agreement inside this engine —
the ORACLE for probe results is the plain full-recompute MinHash SQL
twin over the same split.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    lsh_band_keys,
    minhash_est_jaccard,
    minhash_signature_table,
)
from .index_common import (
    build_lock,
    corpus_fingerprint,
    invalidate_fingerprint,
    read_fingerprint,
    write_fingerprint,
)


def dedup_index_exists(path: str) -> bool:
    return (
        os.path.exists(f"{path}/bands/_SUCCESS")
        and os.path.exists(f"{path}/members/_SUCCESS")
        and os.path.exists(f"{path}/META")
    )


def build_dedup_index(
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    n_buckets: int = 64,
) -> None:
    """Collapse exact dups -> rep signatures -> exploded band rows ->
    bucket-partitioned parquet, plus the members sidecar.

    The signature table rides the session memo under the SAME tag the
    pair operators use — so an index build over a corpus whose
    signatures already exist (an in-session minhash_lsh_pairs run, or
    the persisted signature store's read-through prime,
    ensure_signature_tables) skips the whole text->shingle->hash
    pipeline and pays only the band explode + bucketed write. This is
    the warm-start path for the streaming dedup drain's cold start:
    prime the signature store once per corpus version, and every later
    session's ensure_dedup_index build cost drops to the store's reuse
    floor."""
    from ..operators.dedup import _exact_groups, _memo_checkpoint

    members, base, has_dups = _exact_groups(
        docs, id_col=id_col, text_col=text_col
    )
    if not has_dups:
        members = docs.select(
            F.col(id_col).alias("id"), F.col(id_col).alias("rep_id")
        ).limit(0)
    members.write.mode("overwrite").parquet(f"{path}/members")
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
    ).withColumn("bucket", F.pmod(F.hash("band_key"), F.lit(n_buckets)))
    banded.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{path}/bands"
    )
    with open(f"{path}/META", "w", encoding="utf-8") as f:
        json.dump(
            {
                "num_hashes": num_hashes,
                "bands": bands,
                "shingle_n": shingle_n,
                "n_buckets": n_buckets,
            },
            f,
        )


def ensure_dedup_index(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    n_buckets: int = 64,
) -> None:
    """S9 create-if-absent with content-addressed invalidation: reuse
    only a complete index whose stored fingerprint matches BOTH the
    live corpus and the requested build parameters — a parameter
    change (bands, hashes, shingle size, buckets) rebuilds even over
    an unchanged corpus, since a stale-parameter index would silently
    serve a different band rule than the caller (and the oracle)
    expects."""
    fp = corpus_fingerprint(
        docs,
        [id_col, text_col],
        {
            "num_hashes": num_hashes,
            "bands": bands,
            "shingle_n": shingle_n,
            "n_buckets": n_buckets,
            # layout version: v2 = rep-collapsed bands + members
            # sidecar; bumping it invalidates every v1 index on disk
            # (a v1 probe against a v2 layout, or vice versa, would
            # silently mis-serve).
            "v": 2,
        },
    )
    if dedup_index_exists(path) and read_fingerprint(path) == fp:
        return
    with build_lock(path):
        # Re-check under the lock: a concurrent builder we blocked on
        # may have committed exactly this fingerprint.
        if dedup_index_exists(path) and read_fingerprint(path) == fp:
            return
        invalidate_fingerprint(path)  # crash mid-rebuild => no marker
        build_dedup_index(
            docs, path, id_col=id_col, text_col=text_col,
            num_hashes=num_hashes, bands=bands,
            shingle_n=shingle_n, n_buckets=n_buckets,
        )
        write_fingerprint(path, fp)


def ensure_dedup_groups(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """S9 create-if-absent PERSISTED exact-dup group table: one
    ``(id, rep_id)`` row per document in a duplicate group (group =
    identical whitespace/case-normalized content, rep = min id;
    NULL-text docs form one sentinel group — exactly
    ``operators.dedup._exact_groups`` semantics, which this shares).

    This is the cross-SESSION form of the in-session collapse-guard
    memo: a curation deployment computes the group table once per
    corpus version and every job (batch pair operators, composites,
    index builds, ad-hoc notebooks) reads it from storage instead of
    re-running the corpus-sized fingerprint aggregate. Same
    content-addressed invalidation as every persisted index: corpus
    (id, text) hash + layout version.
    """
    from ..operators.dedup import _exact_groups

    fp = corpus_fingerprint(
        docs, [id_col, text_col], {"kind": "exact_groups", "v": 1}
    )
    if (
        os.path.exists(f"{path}/groups/_SUCCESS")
        and read_fingerprint(path) == fp
    ):
        return spark.read.parquet(f"{path}/groups")
    with build_lock(path):
        if not (
            os.path.exists(f"{path}/groups/_SUCCESS")
            and read_fingerprint(path) == fp
        ):
            invalidate_fingerprint(path)  # crash mid-rebuild => no marker
            members, _base, has_dups = _exact_groups(
                docs, id_col=id_col, text_col=text_col
            )
            if not has_dups:
                members = docs.select(
                    F.col(id_col).alias("id"),
                    F.col(id_col).alias("rep_id"),
                ).limit(0)
            members.write.mode("overwrite").parquet(f"{path}/groups")
            write_fingerprint(path, fp)
    return spark.read.parquet(f"{path}/groups")


def ensure_signature_tables(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
    ngram_n: int = 3,
    simhash_n: int = 2,
) -> dict:
    """S9 create-if-absent PERSISTED derivative-table store — the
    cross-session form of the dedup family's session memo
    (operators/dedup._memo_checkpoint): the expensive text-pipeline
    products are computed once per corpus version and written down,
    and every later session READS them instead of rebuilding.

    Layout (all derived from the exact-dup-collapsed base corpus,
    exactly as the pair operators compute them in-session):

      {path}/groups    (id, rep_id) rows for docs in exact-duplicate
                       groups — empty parquet when the corpus is clean
      {path}/minhash   (id, sig array<bigint>) MinHash signatures for
                       (num_hashes, shingle_n)
      {path}/shingles  (id, s, n_sh) distinct word-``ngram_n``-gram
                       rows with the per-doc shingle count — the
                       ngram_jaccard inverted-index input
      {path}/simhash   (id, simhash) 64-bit fingerprints for
                       word-``simhash_n``-grams
      {path}/FINGERPRINT  commit marker, written LAST and atomically
                       (index_common protocol): corpus (id, text)
                       content hash + ALL pipeline params + layout v

    READ-THROUGH: on both the build and reuse paths this function
    primes the session memo (prime_group_memo / prime_table_memo with
    the operators' exact tags), so a subsequent ``minhash_lsh_pairs``
    / ``ngram_jaccard_pairs`` / ``simhash_pairs`` construction over
    the same ``docs`` plan serves the stored tables and skips the
    whole text→shingle→hash pipeline — the measured-cold first-query
    cost drops to the warm floor.

    At cluster scale these writes are the "persisted signature table"
    SCALING.md names: one linear pass over the corpus per version,
    amortized across every downstream job; bucket the tables by id
    for co-located joins when the corpus outgrows broadcast sizes.
    Single-writer-per-path, like every ensure_* (see index_common).

    COST HONESTY: every call — reuse included — pays the content-
    addressed corpus fingerprint, a full columnar (id, text) scan
    into a count+hash aggregate. The store eliminates the expensive
    stages (shingle explosion, per-shingle hashing, vote aggregation,
    their shuffles), not the identity check; swap the scan for a
    table-snapshot version at cluster scale to make reuse
    metadata-only.
    """
    from pyspark.sql.window import Window

    from ..operators.dedup import (
        _exact_groups,
        _memo_checkpoint,
        peek_group_memo,
        prime_group_memo,
        prime_table_memo,
        shingle_rows,
        simhash_fingerprints,
    )

    tags = {
        "minhash": ("minhash_sig", id_col, text_col, num_hashes, shingle_n),
        "shingles": ("shingle_ex", id_col, text_col, ngram_n),
        "simhash": ("simhash_fp", id_col, text_col, simhash_n),
    }
    fp = corpus_fingerprint(
        docs,
        [id_col, text_col],
        {
            "kind": "signature_tables",
            "num_hashes": num_hashes,
            "shingle_n": shingle_n,
            "ngram_n": ngram_n,
            "simhash_n": simhash_n,
            "v": 1,
        },
    )
    parts = ("groups", "minhash", "shingles", "simhash")

    def _complete() -> bool:
        return all(
            os.path.exists(f"{path}/{p}/_SUCCESS") for p in parts
        ) and read_fingerprint(path) == fp

    def _reuse() -> dict:
        # Reuse: reconstruct the collapsed base EXACTLY as
        # _exact_groups builds it (anti-join of docs against the
        # non-representative ids) so downstream plans are identical,
        # then prime both memos from storage. Every frame that enters
        # the memo is localCheckpoint'd EAGERLY first — never a lazy
        # read of the store files — so the memo entries are DECOUPLED
        # from the store directory: a later same-session rebuild of
        # the store (param change, another writer) can overwrite the
        # parquet underneath without breaking or silently changing a
        # primed entry, and the build path can overwrite-write a
        # table that came back off a memo hit (a lazy store read
        # there would throw 'cannot overwrite a path that is also
        # being read from'). Beyond the corpus fingerprint aggregate
        # this function already paid (one columnar (id, text) scan —
        # see the docstring cost model), the reuse path costs the
        # checkpoint materialization of the stored tables — the same
        # blocks an in-session build would have checkpointed, minus
        # the whole text pipeline that produced them.
        groups_df = spark.read.parquet(f"{path}/groups").localCheckpoint(
            eager=True
        )
        has_dups = bool(groups_df.take(1))
        if has_dups:
            members = groups_df
            non_reps = members.filter(
                F.col("id") != F.col("rep_id")
            ).select(F.col("id").alias("__nr_id"))
            base = docs.join(
                non_reps, F.col(id_col) == F.col("__nr_id"), "left_anti"
            )
        else:
            members, base = None, docs
        if not prime_group_memo(
            docs, id_col=id_col, text_col=text_col,
            members=members, base=base, has_dups=has_dups,
        ):
            # The session already holds a group entry for this corpus
            # (an operator ran first, or the corpus is unkeyable).
            # Operators resolve THAT entry's base, so table primes
            # must key off it — priming the reconstructed base would
            # insert dead FIFO entries that evict live tables.
            existing = peek_group_memo(
                docs, id_col=id_col, text_col=text_col
            )
            if existing is None:
                return {
                    "groups": groups_df,
                    **{
                        n: spark.read.parquet(f"{path}/{n}")
                        for n in tags
                    },
                }
            base = existing[1]
        out = {"groups": groups_df}
        for name, tag in tags.items():
            df = spark.read.parquet(f"{path}/{name}").localCheckpoint(
                eager=True
            )
            prime_table_memo(base, tag, df)
            out[name] = df
        return out

    if _complete():
        return _reuse()

    with build_lock(path):
        # Re-check under the lock: a concurrent builder we blocked on
        # may have committed exactly this fingerprint — serve its
        # tables through the normal reuse path instead of rebuilding.
        if _complete():
            return _reuse()
        # Build: run the operators' own builders THROUGH the session
        # memo (so the in-session state and the stored tables are one
        # and the same), write each table, commit the fingerprint
        # last. Any previous marker is removed FIRST so a crash
        # mid-rebuild can never leave a committed-looking mix of old
        # and new tables.
        invalidate_fingerprint(path)
        members, base, has_dups = _exact_groups(
            docs, id_col=id_col, text_col=text_col
        )
        groups = members if has_dups else docs.select(
            F.col(id_col).alias("id"), F.col(id_col).alias("rep_id")
        ).limit(0)
        groups.write.mode("overwrite").parquet(f"{path}/groups")

        built = {
            "minhash": _memo_checkpoint(
                base, tags["minhash"],
                lambda: minhash_signature_table(
                    base, id_col=id_col, text_col=text_col,
                    num_hashes=num_hashes, shingle_n=shingle_n,
                ),
            ),
            "shingles": _memo_checkpoint(
                base, tags["shingles"],
                lambda: shingle_rows(
                    base, id_col=id_col, text_col=text_col, n=ngram_n
                ).withColumn(
                    "n_sh",
                    F.count(F.lit(1)).over(Window.partitionBy("id")),
                ),
            ),
            "simhash": _memo_checkpoint(
                base, tags["simhash"],
                lambda: simhash_fingerprints(
                    base, id_col=id_col, text_col=text_col, n=simhash_n
                ),
            ),
        }
        for name, df in built.items():
            df.write.mode("overwrite").parquet(f"{path}/{name}")
        write_fingerprint(path, fp)
        return {"groups": spark.read.parquet(f"{path}/groups"), **built}


def probe_dedup_index(
    spark: SparkSession,
    new_docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard: float = 0.3,
) -> DataFrame:
    """Near-duplicates of ``new_docs`` against the INDEXED corpus.

    Returns (new_id, indexed_id, est_jaccard). Only new-vs-indexed
    pairs are reported (rows whose indexed id equals a new id are
    excluded — a re-ingested identical doc is an upsert, not a dup);
    new-vs-new duplicates are the in-batch ``minhash_lsh_pairs`` job.
    """
    # Layout guard: v2 indexes always carry the members sidecar (an
    # empty parquet on dup-free corpora). A v1 on-disk index probed
    # directly — bypassing ensure_dedup_index, whose fingerprint
    # check would have rebuilt it — must fail legibly here, not with
    # an opaque parquet path-not-found from the members read below.
    if not os.path.exists(f"{path}/members/_SUCCESS"):
        raise ValueError(
            f"dedup index at {path} has no members sidecar — this is "
            "a pre-v2 layout (or an incomplete build); rebuild via "
            "ensure_dedup_index before probing"
        )
    with open(f"{path}/META", "r", encoding="utf-8") as f:
        meta = json.load(f)
    num_hashes = int(meta["num_hashes"])
    bands = int(meta["bands"])
    shingle_n = int(meta["shingle_n"])
    n_buckets = int(meta["n_buckets"])

    sig = minhash_signature_table(
        new_docs, id_col=id_col, text_col=text_col,
        num_hashes=num_hashes, shingle_n=shingle_n,
    )
    probe = sig.select(
        F.col("id").alias("new_id"),
        F.col("sig").alias("sig_new"),
        F.explode(
            lsh_band_keys("sig", num_hashes=num_hashes, bands=bands)
        ).alias("band_key"),
    ).withColumn("bucket", F.pmod(F.hash("band_key"), F.lit(n_buckets)))
    # The probe side is one ingest batch — tiny next to the index.
    # Materialize it once (the signature pipeline is the expensive
    # part), derive the bucket set driver-side, and broadcast it into
    # the index join.
    probe = probe.localCheckpoint(eager=True)
    buckets = sorted(
        r["bucket"] for r in probe.select("bucket").distinct().collect()
    )

    idx = spark.read.parquet(f"{path}/bands").filter(
        F.col("bucket").isin(buckets)
    )
    # Rep-level candidates. NO new_id != id filter here: the stored id
    # is a group REPRESENTATIVE — if a re-ingested doc IS the rep of a
    # group, its pair with the rep must be dropped but its pairs with
    # the other group members must survive, so self-exclusion happens
    # AFTER expansion.
    cand = (
        idx.join(F.broadcast(probe), on=["bucket", "band_key"])
        .select(
            "new_id",
            F.col("id").alias("rep_id"),
            "sig_new",
            F.col("sig").alias("sig_idx"),
        )
        .dropDuplicates(["new_id", "rep_id"])
    )
    est = cand.select(
        "new_id",
        "rep_id",
        minhash_est_jaccard(
            "sig_new", "sig_idx", num_hashes=num_hashes
        ).alias("est_jaccard"),
    ).filter(F.col("est_jaccard") >= min_jaccard)
    # Expand rep matches to every exact-dup group member (identical
    # signatures -> the estimate is exact for all of them). members is
    # dup-groups-only and tiny — a broadcast left join; singleton reps
    # fall through the coalesce.
    mem = spark.read.parquet(f"{path}/members").select(
        "rep_id", F.col("id").alias("__member")
    )
    return (
        est.join(F.broadcast(mem), "rep_id", "left")
        .select(
            "new_id",
            F.coalesce("__member", "rep_id").alias("indexed_id"),
            "est_jaccard",
        )
        .filter(F.col("indexed_id") != F.col("new_id"))
    )
