"""Build a hostile variant of the sf0.001 testdata: the same schema,
plus injected edge rows chosen to hit every guard in the engine —
zero-norm embeddings (BRP/cosine zero guards), empty / whitespace /
punctuation-only / markup / CSV-hostile (commas, quotes, newlines)
documents, exact-duplicate texts and vectors, boundary-exact
timestamps (hour/day window edges), single-event users, and
zero-value events.

The oracle differential doesn't care WHAT the answers are — only that
Spark and DuckDB agree — so enriching the data never invalidates a
query; it only exposes operators whose two implementations diverge on
inputs the generated testdata happens not to contain. The r04
`cumulative_users` red and the BRP zero-norm divergence (ADVICE r04)
were both of this class.

With ``--nulls``, additionally injects SQL-NULL cells (NULL text /
lang / source documents, NULL value / props / event_type events, a
NULL embedding and NULL label vector) — every testdata column is
nullable in the parquet schema, so a 100-TB corpus WILL contain them.
The engine's documented contract for NULL *required* cells is
quarantine-at-ingest (``corpus_null_audit`` reports them); this tier
verifies the queries that must tolerate NULLs in optional cells agree
with the oracle anyway.

With ``--skew``, additionally builds a POWER-LAW events table: one
hot user is given 9x the whole original table (cloned rows, fresh
event_ids, original timestamps/types/values), ending up owning ~90%
of all events — the hot-key shape that breaks per-user shuffles at
100 TB. Every user-keyed query (sessionization, funnels, retention,
cumulative/salted aggregates, snapshot diff) must STILL value-hash
match DuckDB: skew may slow a plan, never change an answer. Duplicate
(user_id, ts) pairs are intentional — per-user orderings must break
ties on (ts, event_id), and this tier catches any that don't.

With ``--templated``, additionally floods the documents table with a
TEMPLATED near-duplicate corpus: 5 boilerplate templates x 25 serial
numbers each — every instance byte-DISTINCT (the serial defeats the
exact-dup collapse, so no fingerprint group forms) but shingle-near-
identical (the serial touches ~3 of ~40 shingles, Jaccard ~0.9), so
all instances of a template land in the SAME LSH band buckets. This is
the 100-TB norm (web boilerplate: cookie banners, license stubs,
error pages differing only in a timestamp/id) and precisely the shape
the per-band-bucket cap (max_band_bucket) exists for. The UNCAPPED
family operators must still value-hash match DuckDB on it (both
engines materialize the same O(m^2) within-template pairs — fine at
this scale, the cap is the production defense); the capped query
(`lsh_capped_pairs`) must stay green while genuinely truncating.

Usage: python tools/make_hostile_testdata.py [outdir] [--nulls] [--skew] [--templated]
Then:  SPARK_GRAFT_VERIFY_SF=<outdir> python tools/verify_local.py
"""

from __future__ import annotations

import datetime as dt
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
WITH_NULLS = "--nulls" in sys.argv[1:]
WITH_SKEW = "--skew" in sys.argv[1:]
WITH_TEMPLATED = "--templated" in sys.argv[1:]
OUT = ARGS[0] if ARGS else (
    "/tmp/sf_templated" if WITH_TEMPLATED
    else "/tmp/sf_skew" if WITH_SKEW
    else ("/tmp/sf_nulls" if WITH_NULLS else "/tmp/sf_hostile")
)

# Five realistic boilerplate templates; {SER} is replaced by a serial
# token mid-text so the mutation touches interior shingles (the
# hardest placement — edge serials would leave even more shingles
# shared). ~40 words each so shingle overlap stays ~0.9.
TEMPLATES = [
    "this website uses cookies to improve your experience and by "
    "continuing to browse page {SER} of this site you accept our use "
    "of cookies as described in the privacy policy and terms of "
    "service which may change at any time without notice",
    "error code {SER} the requested resource could not be found on "
    "this server please check the address and try again or contact "
    "the site administrator if you believe this message is shown in "
    "error and include the reference number in your report",
    "copyright notice all rights reserved reproduction of article "
    "{SER} in whole or in part without written permission is strictly "
    "prohibited the information provided is for general informational "
    "purposes only and does not constitute professional advice",
    "thank you for your order number {SER} your items will be shipped "
    "within two business days you will receive a confirmation email "
    "with tracking information once your package leaves our warehouse "
    "please allow additional time during holiday periods",
    "welcome to the community forum thread {SER} please read the "
    "posting guidelines before participating be respectful of other "
    "members do not post spam or advertisements moderators may remove "
    "content that violates these rules at their discretion",
]
SERIALS_PER_TEMPLATE = 25


def main() -> None:
    os.makedirs(OUT, exist_ok=True)

    # -- documents: append edge texts with fresh high ids -------------
    t = pq.read_table(f"{SRC}/documents.parquet")
    base = t.to_pylist()
    proto = dict(base[0])
    next_id = max(r["doc_id"] for r in base) + 1
    edge_texts = [
        "",                                    # empty
        "   \t  ",                             # whitespace only
        "!!! ??? ... ;;; :::",                 # punctuation only
        "<p>Hello &amp; <b>world</b></p>",     # markup (clean_markup)
        'a,b,"quoted, with comma"\nsecond line',  # CSV-hostile
        "the the the the the the the the",     # max repetition
        "word",                                # single token
        base[0]["text"],                       # exact duplicate of doc 0
        base[1]["text"],                       # exact duplicate of doc 1
        "x" * 5000,                            # one giant token
        # -- unicode tier: code-point semantics probed r05 (length /
        # substr / lower agree across engines on all of these; the two
        # KNOWN divergences are deliberately absent — Turkish U+0130
        # and Greek word-final sigma, where Java does contextual case
        # mapping and DuckDB does simple mapping; see FIXTURES.md) --
        "café münü straße GROSS",       # latin-1 + sharp s
        "combining vélo é accent",              # NFD combining marks
        "中文分词 emoji \U0001f44d\U0001f600 mixed",  # CJK + astral emoji
        "العربية rtl text",        # Arabic RTL
        "ＦＵＬＬ ｗidth mixed",        # fullwidth latin
        "nbsp inside zwsp​word tokens",           # NBSP/ZWSP non-\s
        "ЯЗЫК Русский",  # Cyrillic
    ]
    for i, txt in enumerate(edge_texts):
        r = dict(proto)
        r["doc_id"] = next_id + i
        r["text"] = txt
        r["n_chars"] = len(txt)
        r["lang"] = proto.get("lang", "en")
        r["source"] = "hostile"
        base.append(r)
    if WITH_NULLS:
        null_docs = [
            {"text": None, "n_chars": 0, "lang": "en", "source": "hostile"},
            {"text": "null lang", "n_chars": 9, "lang": None, "source": "hostile"},
            {"text": "null source", "n_chars": 11, "lang": "en", "source": None},
        ]
        for i, spec in enumerate(null_docs):
            r = dict(proto)
            r["doc_id"] = next_id + len(edge_texts) + i
            r.update(spec)
            base.append(r)
    if WITH_TEMPLATED:
        tnext = max(r["doc_id"] for r in base) + 1
        for ti, tmpl in enumerate(TEMPLATES):
            for s in range(SERIALS_PER_TEMPLATE):
                txt = tmpl.replace("{SER}", f"ref{ti}x{s:04d}")
                r = dict(proto)
                r["doc_id"] = tnext + ti * SERIALS_PER_TEMPLATE + s
                r["text"] = txt
                r["n_chars"] = len(txt)
                r["lang"] = proto.get("lang", "en")
                r["source"] = f"template{ti}"
                base.append(r)
    pq.write_table(
        pa.Table.from_pylist(base, schema=t.schema),
        f"{OUT}/documents.parquet",
    )

    # -- embeddings: zero vector, duplicate vector, tiny-norm vector --
    e = pq.read_table(f"{SRC}/embeddings.parquet")
    erows = e.to_pylist()
    eproto = dict(erows[0])
    dim = len(eproto["embedding"])
    enext = max(r["vec_id"] for r in erows) + 1
    specials = [
        [0.0] * dim,                            # zero norm
        list(erows[0]["embedding"]),            # exact duplicate of vec 0
        [1e-30] * dim,                          # denormal-ish tiny norm
        [1.0] + [0.0] * (dim - 1),              # axis vector
    ]
    for i, vec in enumerate(specials):
        r = dict(eproto)
        r["vec_id"] = enext + i
        r["embedding"] = vec
        base_label = eproto.get("label")
        if base_label is not None:
            r["label"] = base_label
        erows.append(r)
    if WITH_NULLS:
        # NULL label is in-contract (optional metadata; label_centroids
        # groups it as its own class). A NULL embedding VECTOR is
        # out-of-contract for the differential — DuckDB's own
        # list_inner_product refuses NULL vectors, so no oracle can be
        # written; the engine's contract is quarantine-at-ingest
        # (upsert/index build drop them — tests/test_null_handling.py),
        # measured by corpus_null_audit.
        r = dict(eproto)
        r["vec_id"] = enext + len(specials)
        r["label"] = None
        erows.append(r)
    pq.write_table(
        pa.Table.from_pylist(erows, schema=e.schema),
        f"{OUT}/embeddings.parquet",
    )

    # -- events: boundary timestamps, lone user, zero values ----------
    ev = pq.read_table(f"{SRC}/events.parquet")
    evrows = ev.to_pylist()
    evproto = dict(evrows[0])
    evnext = max(r["event_id"] for r in evrows) + 1
    lone_user = max(r["user_id"] for r in evrows) + 1
    edge_events = [
        # exact midnight — day AND hour boundary (date_trunc edges)
        {"ts": dt.datetime(2024, 1, 5, 0, 0, 0), "user_id": lone_user,
         "event_type": "click", "value": 0.0},
        # exact hour boundary
        {"ts": dt.datetime(2024, 1, 5, 13, 0, 0), "user_id": lone_user + 1,
         "event_type": "view", "value": -1.5},
        # one microsecond before midnight
        {"ts": dt.datetime(2024, 1, 5, 23, 59, 59, 999999),
         "user_id": lone_user + 1, "event_type": "purchase", "value": 0.0},
    ]
    for i, spec in enumerate(edge_events):
        r = dict(evproto)
        r["event_id"] = evnext + i
        r.update(spec)
        evrows.append(r)
    if WITH_NULLS:
        null_events = [
            {"value": None},
            {"props": None},
            {"event_type": None},
        ]
        for i, spec in enumerate(null_events):
            r = dict(evproto)
            r["event_id"] = evnext + len(edge_events) + i
            r["user_id"] = lone_user + 2
            r.update(spec)
            evrows.append(r)
    if WITH_SKEW:
        # Clone the ORIGINAL table 9x onto one hot user: ~90% of all
        # rows share one user_id, with duplicated (user_id, ts) pairs
        # by construction. Deterministic — no RNG, stable event_ids.
        hot_user = min(r["user_id"] for r in evrows)
        originals = [dict(r) for r in evrows[: ev.num_rows]]
        skewnext = max(r["event_id"] for r in evrows) + 1
        for rep in range(9):
            for j, src_row in enumerate(originals):
                r = dict(src_row)
                r["event_id"] = skewnext + rep * len(originals) + j
                r["user_id"] = hot_user
                evrows.append(r)
    pq.write_table(
        pa.Table.from_pylist(evrows, schema=ev.schema),
        f"{OUT}/events.parquet",
    )

    # -- everything else links through unchanged ----------------------
    for f in os.listdir(SRC):
        dst = f"{OUT}/{f}"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{f}", dst)
    print(f"wrote hostile testdata to {OUT}")


if __name__ == "__main__":
    main()
