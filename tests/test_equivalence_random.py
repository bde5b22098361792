"""Seeded-random equivalence tests: each operator vs an independent
naive reference over adversarial random inputs (short docs, weird
whitespace, timestamp ties, boundary diffs). One Spark round trip per
test — the randomized coverage of property testing without paying a
Spark job per example.
"""

import datetime as dt
import random

from pyspark.sql import functions as F

from cs6300_vectordbs_spark.operators.asof import asof_join
from cs6300_vectordbs_spark.operators.dedup import (
    shingle_rows,
    word_shingles,
)
from cs6300_vectordbs_spark.operators.interval import range_join_bucketed

WORDS = ["the", "cat", "sat", "on", "a", "mat", "dog", "ran", "x", "zz"]
WS = [" ", "  ", "\t", "\n", " \t "]


def _random_text(rng):
    n = rng.randrange(0, 8)
    parts = []
    for _ in range(n):
        parts.append(rng.choice(WORDS) + rng.choice(WS))
    lead = rng.choice(["", " ", "\t"])
    return lead + "".join(parts)


def test_shingle_rows_equals_hof_shingles(spark):
    """The codegen posexplode+lead path must produce exactly the same
    (id, shingle) set as the array-HOF word_shingles for every doc —
    including empty, whitespace-only, and shorter-than-n docs."""
    rng = random.Random(7)
    rows = [(i, _random_text(rng)) for i in range(300)]
    rows += [(1000, ""), (1001, "   "), (1002, "\t\n"), (1003, "one"),
             (1004, "one two"), (1005, "one two three")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for n in (2, 3):
        fast = {
            (r.id, r.s)
            for r in shingle_rows(docs, n=n).collect()
        }
        ref = {
            (r.doc_id, s)
            for r in docs.select(
                "doc_id", word_shingles("text", n).alias("sh")
            ).collect()
            for s in r.sh
        }
        assert fast == ref, f"n={n}"


def _naive_asof(left_rows, right_rows):
    out = {}
    for k, lt, lid in left_rows:
        best = None
        for rk, rt, rid, rv in right_rows:
            if rk == k and rt <= lt and (
                best is None or (rt, rid) > (best[0], best[1])
            ):
                best = (rt, rid, rv)
        out[lid] = (best[1], best[2]) if best else (None, None)
    return out


def test_asof_join_equals_naive(spark):
    rng = random.Random(11)
    t0 = dt.datetime(2024, 1, 1)
    # coarse timestamp grid -> plenty of exact ties across keys
    left_rows = [
        (rng.randrange(4), t0 + dt.timedelta(minutes=rng.randrange(30)), i)
        for i in range(120)
    ]
    right_rows = [
        (rng.randrange(4), t0 + dt.timedelta(minutes=rng.randrange(30)),
         200 + i, float(rng.randrange(100)))
        for i in range(120)
    ]
    left = spark.createDataFrame(left_rows, "k long, ts timestamp, lid long")
    right = spark.createDataFrame(
        right_rows, "k long, ts timestamp, rid long, rv double"
    )
    got = {
        r.lid: (r.rid_matched, r.rv_matched)
        for r in asof_join(
            left, right, on="k", right_cols=["rid", "rv"], tie_cols=["rid"]
        ).collect()
    }
    assert got == _naive_asof(left_rows, right_rows)


def test_range_join_equals_naive(spark):
    rng = random.Random(13)
    t0 = dt.datetime(2024, 1, 1)
    lower_us, upper_us = -90_000_000, 150_000_000
    left_rows = [
        (rng.randrange(3), t0 + dt.timedelta(seconds=rng.randrange(0, 2000, 30)), i)
        for i in range(80)
    ]
    right_rows = [
        (rng.randrange(3), t0 + dt.timedelta(seconds=rng.randrange(0, 2000, 30)),
         500 + i)
        for i in range(80)
    ]
    left = spark.createDataFrame(left_rows, "k long, ts timestamp, lid long")
    right = spark.createDataFrame(right_rows, "k long, ts timestamp, rid long")
    got = {
        (r.lid, r.rid_r)
        for r in range_join_bucketed(
            left, right, on="k", lower_us=lower_us, upper_us=upper_us,
            right_cols=["rid"],
        ).collect()
    }
    want = {
        (lid, rid)
        for k, lt, lid in left_rows
        for rk, rt, rid in right_rows
        if rk == k
        and lower_us <= (lt - rt) / dt.timedelta(microseconds=1) <= upper_us
    }
    assert got == want


def test_text_functions_equal_python_reference(spark):
    """token_count / quality_score / lang_id / doc_fingerprint vs a
    pure-Python reference over adversarial random texts (empty, all
    whitespace, punctuation-heavy, marker-word mixes)."""
    import hashlib
    import re

    from cs6300_vectordbs_spark.functions.text import (
        LANG_MARKERS,
        STOPWORDS,
        doc_fingerprint,
        lang_id,
        quality_score,
        token_count,
    )

    rng = random.Random(77)
    texts = ["", " ", "\t\n", "a", "...!!!", "the the the", "el la de"]
    for _ in range(60):
        n = rng.randrange(0, 12)
        parts = []
        vocab = WORDS + list(STOPWORDS) + [
            w for ws in LANG_MARKERS.values() for w in ws
        ] + ["...", "!?", "x9", "Ab,C"]
        for _ in range(n):
            parts.append(rng.choice(vocab) + rng.choice(WS))
        texts.append(rng.choice(["", " "]) + "".join(parts))

    def py_tokens(t):
        return [x for x in re.split(r"\s+", t.strip().lower()) if x != ""]

    def py_quality(t):
        toks = py_tokens(t)
        ntok = float(len(toks))
        nchar = float(len(t))
        npunct = nchar - float(len(re.sub(r"[^\w\s]", "", t)))
        length_score = min(ntok, 100.0) / 100.0
        stop = sum(1 for x in toks if x in STOPWORDS)
        stop_score = min((stop / ntok) * 5.0, 1.0) if ntok > 0 else 0.0
        punct_ratio = npunct / nchar if nchar > 0 else 0.0
        return 0.4 * length_score + 0.3 * stop_score + 0.3 * (1.0 - punct_ratio)

    def py_lang(t):
        toks = py_tokens(t)
        best, best_n = "und", 0
        for code in sorted(LANG_MARKERS):
            n = sum(1 for x in toks if x in LANG_MARKERS[code])
            if n > best_n:
                best, best_n = code, n
        return best

    def py_fp(t):
        norm = re.sub(r"\s+", " ", t.strip().lower())
        return hashlib.md5(norm.encode()).hexdigest()[:16]

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r["i"]: r
        for r in df.select(
            "i",
            token_count("text").alias("tc"),
            F.round(quality_score("text"), 9).alias("q"),
            lang_id("text").alias("lg"),
            doc_fingerprint("text").alias("fp"),
        ).collect()
    }
    for i, t in enumerate(texts):
        r = got[i]
        assert r["tc"] == len(py_tokens(t)), (t, r["tc"])
        assert abs(r["q"] - round(py_quality(t), 9)) < 1e-9, (t, r["q"])
        assert r["lg"] == py_lang(t), (t, r["lg"])
        assert r["fp"] == py_fp(t), (t, r["fp"])


def test_exact_ntile_equals_global_window(spark):
    """exact_ntile (range exchange + prefix-sum) must be bit-identical
    to the single-partition ntile window over random data with heavy
    ties."""
    from pyspark.sql.window import Window

    from cs6300_vectordbs_spark.operators.quality import exact_ntile

    rng = random.Random(3)
    rows = [(i, rng.randrange(0, 7)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        (r["id"],): r["tile"]
        for r in exact_ntile(df, ["v", "id"], 7, out_col="tile").collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        (r["id"],): r["tile"]
        for r in df.withColumn("tile", F.ntile(7).over(w)).collect()
    }
    assert got == want


def test_minhash_signatures_equal_python_reference(spark):
    """The groupBy-min signature pipeline vs a pure-Python MinHash over
    the same md5 permutations — catches shingle-set or salt drift."""
    import hashlib

    from cs6300_vectordbs_spark.operators.dedup import (
        minhash_signature_table,
    )

    rng = random.Random(9)
    texts = []
    for _ in range(25):
        n = rng.randrange(0, 10)
        texts.append(
            " ".join(rng.choice(WORDS) for _ in range(n))
        )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["id"]: list(r["sig"])
        for r in minhash_signature_table(
            df, num_hashes=8, shingle_n=3
        ).collect()
    }

    def py_h64(s, salt):
        h = hashlib.md5(f"s{salt}|{s}".encode()).hexdigest()
        return int(h[:15], 16)

    for i, t in enumerate(texts):
        toks = [x for x in t.strip().lower().split() if x]
        sh = {
            " ".join(toks[j:j + 3]) for j in range(len(toks) - 2)
        } if len(toks) >= 3 else set()
        if not sh:
            assert i not in got  # shingle-less docs emit no signature
            continue
        want = [min(py_h64(s, k) for s in sh) for k in range(8)]
        assert got[i] == want, (t, got[i], want)


def test_simhash_fingerprints_equal_python_reference(spark):
    """The 4x16-bit-chunk decode must produce the EXACT fingerprints
    of the original per-hex-char definition: bit p of the 64-bit
    simhash = (md5_hex_char[p//4] >> (p%4)) & 1 voted over shingles,
    signed via _BIT_WEIGHTS. Locks the bit order against future decode
    optimizations."""
    import hashlib

    from cs6300_vectordbs_spark.operators.dedup import (
        _BIT_WEIGHTS,
        simhash_fingerprints,
    )

    rng = random.Random(21)
    texts = []
    for _ in range(20):
        n = rng.randrange(0, 9)
        texts.append(" ".join(rng.choice(WORDS) for _ in range(n)))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["id"]: r["simhash"]
        for r in simhash_fingerprints(df, n=2).collect()
    }

    def py_simhash(t):
        toks = [x for x in t.strip().lower().split() if x]
        sh = {
            " ".join(toks[j:j + 2]) for j in range(len(toks) - 1)
        } if len(toks) >= 2 else set()
        if not sh:
            return 0
        votes = [0] * 64
        for s in sh:
            hx = hashlib.md5(s.encode()).hexdigest()[:16]
            for p in range(64):
                bit = (int(hx[p // 4], 16) >> (p % 4)) & 1
                votes[p] += 2 * bit - 1
        return sum(
            _BIT_WEIGHTS[p] for p in range(64) if votes[p] > 0
        )

    for i, t in enumerate(texts):
        assert got[i] == py_simhash(t), (t, got[i], py_simhash(t))


def test_brp_bucket_keys_equal_python_reference(spark):
    """The deterministic BRP bucket rule — floor(seq-fold dot /
    (seq-fold norm * L)) per table over the seeded Gaussian
    projections — recomputed in pure Python must match the Spark
    column bit-for-bit. The SQL oracle locks Spark vs DuckDB; this
    locks the RULE itself, so a refactor cannot silently change both
    engines in step."""
    import math

    from pyspark.sql import functions as F

    from cs6300_vectordbs_spark.operators.ann import (
        _hyperplanes,
        brp_bucket_keys,
    )

    rng = random.Random(11)
    dim, n_tables, L, seed = 16, 4, 0.5, 42
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    got = {
        r.id: list(r.keys)
        for r in df.select(
            "id",
            brp_bucket_keys(
                "v", dim, n_tables=n_tables, bucket_length=L, seed=seed
            ).alias("keys"),
        ).collect()
    }
    planes = _hyperplanes(dim, n_tables, seed)
    for i, v in rows:
        acc = 0.0
        for x in v:
            acc += x * x
        nrm = math.sqrt(acc)
        expect = []
        for t, p in enumerate(planes):
            d = 0.0
            for x, w in zip(v, p):
                d += x * w
            expect.append(f"{t},{math.floor(d / (nrm * L))}")
        assert got[i] == expect, (i, got[i], expect)


def test_brp_bucket_keys_zero_vector_sentinel(spark):
    """A zero vector must land in the explicit 'z' sentinel bucket in
    every table — not a NULL-collapsed key (Spark 0/0 -> NULL) or an
    inf floor (SQL double division) that the two engines would
    disagree on."""
    from cs6300_vectordbs_spark.operators.ann import brp_bucket_keys

    df = spark.createDataFrame(
        [(0, [0.0] * 8), (1, [1.0] + [0.0] * 7)], "id long, v array<double>"
    )
    got = {
        r.id: list(r.keys)
        for r in df.select(
            "id", brp_bucket_keys("v", 8, n_tables=2).alias("keys")
        ).collect()
    }
    assert got[0] == ["0,z", "1,z"]
    assert all("," in k and not k.endswith("z") for k in got[1])


def test_det_kmeans_centroids_equal_python_reference(spark):
    """kmeans_centroids_det's whole training loop — lowest-id init,
    argmax-cosine assignment with lowest-cid ties, per-cell means as
    the ORDER-INDEPENDENT quantize(1e12)-int-sum-divide chain rounded
    HALF_UP to 9 dp, empty cells keeping their previous centroid —
    recomputed in pure Python must match exactly."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from cs6300_vectordbs_spark.operators.ann import kmeans_centroids_det

    rng = random.Random(23)
    dim, k, iters = 8, 3, 2
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["__cid"]: [float(x) for x in r["__cvec"]]
        for r in kmeans_centroids_det(
            df, dim=dim, n_cells=k, n_iters=iters, train_n=None
        ).collect()
    }

    def seq_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def cos(a, b):
        return seq_dot(a, b) / (math.sqrt(seq_dot(a, a)) * math.sqrt(seq_dot(b, b)))

    def half_up(x, exp):
        # Spark F.round = BigDecimal HALF_UP on the double's shortest
        # decimal repr — Decimal(repr(x)) reproduces it.
        return Decimal(repr(x)).quantize(Decimal(exp), rounding=ROUND_HALF_UP)

    def q12(x):
        # round(x * 1e12)::bigint — the elementwise quantization.
        return int(half_up(x * 1e12, "1"))

    cents = [list(v) for _, v in sorted(rows)[:k]]
    for _ in range(iters):
        members = {c: [] for c in range(k)}
        for _, v in rows:
            sims = [cos(v, c) for c in cents]
            best = max(range(k), key=lambda c: (sims[c], -c))
            members[best].append(v)
        for c in range(k):
            if members[c]:
                n = len(members[c])
                cents[c] = [
                    # exact int sum (order-free), double divide by n,
                    # then /1e12, then round 9 — the engine chain.
                    float(half_up(
                        float(sum(q12(v[d]) for v in members[c])) / n / 1e12,
                        "1E-9",
                    ))
                    for d in range(dim)
                ]
    for c in range(k):
        assert got[c] == cents[c], (c, got[c], cents[c])
