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

Usage: python tools/make_hostile_testdata.py [outdir]   # default /tmp/sf_hostile
Then:  SPARK_GRAFT_VERIFY_SF=<outdir> python tools/verify_local.py
"""

from __future__ import annotations

import datetime as dt
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_hostile"


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
    ]
    for i, txt in enumerate(edge_texts):
        r = dict(proto)
        r["doc_id"] = next_id + i
        r["text"] = txt
        r["n_chars"] = len(txt)
        r["lang"] = proto.get("lang", "en")
        r["source"] = "hostile"
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
