"""Golden cases for PII redaction order and count semantics."""

from pyspark.sql import functions as F

from cs6300_vectordbs_spark.functions.text import pii_count, redact_pii


def _run(spark, text):
    row = (
        spark.createDataFrame([(text,)], "t string")
        .select(redact_pii("t").alias("c"), pii_count("t").alias("n"))
        .first()
    )
    return row.c, row.n


def test_each_kind_redacts(spark):
    c, n = _run(spark, "mail bob@foo.org see https://x.io/a?b=1 tel 12345678")
    assert c == "mail <EMAIL> see <URL> tel <NUM>"
    assert n == 3


def test_url_swallows_embedded_pii_and_counts_once(spark):
    # digits and an @-form inside the URL must NOT count again
    c, n = _run(spark, "go http://h.com/u/99999999?e=a@b.co now")
    assert c == "go <URL> now"
    assert n == 1


def test_short_digit_runs_untouched(spark):
    c, n = _run(spark, "year 2024 zip 123456")
    assert c == "year 2024 zip 123456"
    assert n == 0


def test_clean_text_is_identity(spark):
    c, n = _run(spark, "plain words only here")
    assert c == "plain words only here"
    assert n == 0


def test_bpe_token_count_golden(spark):
    from cs6300_vectordbs_spark.functions.text import bpe_token_count

    df = spark.createDataFrame(
        [("it's a big2 test!",), ("",)], "t string"
    )
    got = [r[0] for r in df.select(bpe_token_count("t")).collect()]
    # it | 's | " a" | " big" | 2 | " test" | ! -> 7
    assert got == [7, 0]


def test_strip_markup_golden(spark):
    """Tags drop (replaced by spaces so boundaries never glue words),
    entities decode AFTER tag removal ('&lt;b&gt;' survives as literal
    text), '&amp;' decodes last, whitespace collapses."""
    from cs6300_vectordbs_spark.functions.text import strip_markup

    df = spark.createDataFrame(
        [
            ('<p>a</p><p>b</p>',),
            ('x &amp;lt; y',),
            ('<div   class="z">hi &nbsp; there</div>',),
            ('keep &lt;b&gt;this&lt;/b&gt; literal',),
        ],
        ["t"],
    )
    got = [r.c for r in df.select(strip_markup("t").alias("c")).collect()]
    assert got == [
        "a b",
        "x &lt; y",          # &amp; decodes last: '&amp;lt;' -> '&lt;'
        "hi there",
        "keep <b>this</b> literal",
    ]
