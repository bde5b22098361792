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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint
from ..functions.vector import ColumnOrName, _col


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


def word_shingles(text: ColumnOrName, n: int = 3) -> Column:
    """Distinct n-word shingles of lowercased text, as strings."""
    t = F.lower(F.trim(_col(text)))
    toks = F.filter(F.split(t, r"\s+"), lambda x: x != "")
    # shingle i = tokens[i..i+n-1] joined by space, for i in 0..len-n
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return F.array_distinct(sh)


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs via shingle inverted index.

    Plan shape: explode(shingles) → self equi-join on shingle →
    groupBy(pair) count intersection → Jaccard from |A|+|B|-|∩|.
    The equi-join on shingle is a plain hash join — no all-pairs blowup;
    hot shingles (stop-phrases) are the skew risk, handled by AQE skew
    split. Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    sh = docs.select(
        F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh")
    )
    sizes = sh.select("id", F.size("sh").alias("n_sh"))
    ex = sh.select("id", F.explode("sh").alias("s"))
    a = ex.select(F.col("id").alias("id_a"), "s")
    b = ex.select(F.col("id").alias("id_b"), "s")
    inter = (
        a.join(b, on="s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(
            F.broadcast(sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))),
            on="id_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))),
            on="id_b",
        )
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= min_jaccard)


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
    md5-hash64(salt_i || shingle). Array<bigint> of length num_hashes."""
    sh = word_shingles(text, n)
    mins = [
        F.array_min(F.transform(sh, lambda s, i=i: _md5_hash64(s, i)))
        for i in range(num_hashes)
    ]
    return F.array(*mins)


def minhash_lsh_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    min_jaccard: float | None = 0.5,
) -> DataFrame:
    """MinHash + LSH banding near-duplicate candidate pairs.

    num_hashes/bands rows per band; docs sharing ANY full band collide.
    Candidates then get an exact MinHash-estimate filter (fraction of
    equal signature positions ≈ Jaccard). At 100 TB the only shuffles
    are groupBy(band_key) — keys are short hashes, heavily combinable.
    Returns (id_a, id_b, est_jaccard).
    """
    rows_per_band = num_hashes // bands
    sig = docs.select(
        F.col(id_col).alias("id"),
        minhash_signature(text_col, num_hashes, shingle_n).alias("sig"),
    ).filter(F.size("sig") > 0)

    band_cols = [
        F.md5(
            F.concat_ws(
                ",",
                F.lit(str(b)),
                *[
                    F.col("sig")[i].cast("string")
                    for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                ],
            )
        ).alias("band_key")
        for b in range(bands)
    ]
    banded = sig.select(
        "id", "sig", F.explode(F.array(*band_cols)).alias("band_key")
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
        (
            F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                    lambda eq: eq,
                )
            ).cast("double")
            / F.lit(float(num_hashes))
        ).alias("est_jaccard"),
    )
    if min_jaccard is not None:
        est = est.filter(F.col("est_jaccard") >= min_jaccard)
    return est


def simhash64(text: ColumnOrName, n: int = 2) -> Column:
    """64-bit SimHash over word n-grams, built from md5 bits (portable).

    For each of 64 bit positions, sum +1/-1 over shingles by that bit of
    the shingle hash; fingerprint bit = sign. Implemented as array ops —
    JVM-side, no UDF. Returns bigint (may be negative: bit 63 is the
    sign bit)."""
    sh = word_shingles(text, n)
    # 64-bit hash from md5: conv of 15 hex chars gives 60 bits; combine
    # two 60-bit halves to cover 64.
    h1 = lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")  # noqa: E731
    h2 = lambda s: F.conv(F.substring(F.md5(s), 16, 15), 16, 10).cast("bigint")  # noqa: E731
    bit = lambda h, i: F.shiftrightunsigned(h, i % 60) % 2  # noqa: E731
    acc = F.lit(0).cast("bigint")
    for i in range(64):
        hf = h1 if i < 60 else h2
        votes = F.aggregate(
            sh,
            F.lit(0).cast("bigint"),
            lambda a, s, i=i, hf=hf: a + F.when(bit(hf(s), i) == 1, 1).otherwise(-1),
        )
        acc = acc + F.when(votes > 0, F.lit(2 ** i if i < 63 else -(2 ** 63)).cast("bigint")).otherwise(0)
    return acc


def simhash_buckets(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """Group docs by SimHash fingerprint; rows with dup_count > 1 are
    near-duplicate clusters (identical fingerprints)."""
    f = docs.select(F.col(id_col).alias("id"), simhash64(text_col, n).alias("simhash"))
    return f.groupBy("simhash").agg(
        F.min("id").alias("min_id"), F.count(F.lit(1)).alias("dup_count")
    )
