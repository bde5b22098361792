"""Z-order layout (sources/layout.py): losslessness, key correctness,
and the property the whole feature exists for — every file covers a
small RECTANGLE of the (user, time) plane, so parquet min/max stats
skip on both dimensions at once.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from cs6300_vectordbs_spark.io import read_events
from cs6300_vectordbs_spark.sources.layout import (
    bucketize,
    write_zordered,
    zorder_key,
)

SF_DIR = "/root/testdata/sf0.001"


def test_zorder_key_matches_python_interleave(spark):
    rows = [(a, b) for a in range(0, 64, 7) for b in range(0, 64, 11)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", zorder_key(["a", "b"], bits=6).alias("z")).collect()
    }
    for a, b in rows:
        z = 0
        for i in range(6):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        assert got[(a, b)] == z, (a, b)


def test_bucketize_bounds(spark):
    df = spark.createDataFrame([(0.0,), (5.0,), (10.0,)], "x double")
    got = [
        r.b
        for r in df.select(bucketize(F.col("x"), 0.0, 10.0, 4).alias("b"))
        .orderBy("b")
        .collect()
    ]
    assert got[0] == 0 and got[-1] == 15 and 0 <= got[1] <= 15
    # degenerate domain collapses to 0, never divides by zero
    one = df.select(bucketize(F.col("x"), 5.0, 5.0, 4).alias("b")).collect()
    assert all(r.b == 0 for r in one)


@pytest.fixture(scope="module")
def zpath(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zorder") / "events")
    ev = read_events(spark, SF_DIR).withColumn(
        "__ts_us", F.unix_micros("ts")
    )
    write_zordered(ev, path, ["user_id", "__ts_us"], bits=12, num_files=8)
    return path


def test_zorder_is_lossless(spark, zpath):
    src = read_events(spark, SF_DIR)
    back = spark.read.parquet(zpath).drop("__ts_us")
    assert back.count() == src.count()
    assert (
        back.select("event_id", "user_id", "value")
        .exceptAll(src.select("event_id", "user_id", "value"))
        .count()
        == 0
    )


def test_zorder_files_cover_small_rectangles(spark, zpath):
    """The point of the layout: per-file (min, max) spans must be
    narrow on BOTH dimensions. A single-column sort gives span ~1.0 on
    the other dimension for every file; the Morton layout keeps the
    MEAN span well below that on both axes simultaneously."""
    files = [
        os.path.join(zpath, f)
        for f in os.listdir(zpath)
        if f.endswith(".parquet")
    ]
    assert len(files) >= 4
    dom_u = [None, None]
    dom_t = [None, None]
    spans = []
    per_file = []
    for f in files:
        md = pq.read_metadata(f)
        u_mn = t_mn = None
        u_mx = t_mx = None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None:
                    continue
                if name == "user_id":
                    u_mn = st.min if u_mn is None else min(u_mn, st.min)
                    u_mx = st.max if u_mx is None else max(u_mx, st.max)
                if name == "__ts_us":
                    t_mn = st.min if t_mn is None else min(t_mn, st.min)
                    t_mx = st.max if t_mx is None else max(t_mx, st.max)
        assert None not in (u_mn, u_mx, t_mn, t_mx), f
        per_file.append((u_mn, u_mx, t_mn, t_mx))
        dom_u = [
            u_mn if dom_u[0] is None else min(dom_u[0], u_mn),
            u_mx if dom_u[1] is None else max(dom_u[1], u_mx),
        ]
        dom_t = [
            t_mn if dom_t[0] is None else min(dom_t[0], t_mn),
            t_mx if dom_t[1] is None else max(dom_t[1], t_mx),
        ]
    du = dom_u[1] - dom_u[0]
    dt = dom_t[1] - dom_t[0]
    for u_mn, u_mx, t_mn, t_mx in per_file:
        spans.append(((u_mx - u_mn) / du, (t_mx - t_mn) / dt))
    mean_u = sum(s[0] for s in spans) / len(spans)
    mean_t = sum(s[1] for s in spans) / len(spans)
    # Both axes clustered at once — the thing one-column sorting can't
    # do (it would pin one mean near 1.0).
    assert mean_u < 0.7 and mean_t < 0.7, (mean_u, mean_t, spans)
    assert mean_u + mean_t < 1.2, (mean_u, mean_t)
