"""Query generation — deterministic stand-in for the reference's
LLM-generated queries (U1), plus the query-line cleanup rules (F5).

Reference U1 (/root/reference/src/queries.py:402-486): sample 500 docs,
POST each to Ollama with a "write one natural-language search query for
this plot" prompt, parse the first clean line, cache to a text file.
The verified stand-in composes the query from document fields with pure
expressions (the template mirrors the prompt's intent: a short query
about the document's content), so it is reproducible in any engine.

Reference F5 (/root/reference/src/queries.py:471-481): strip leading
"N." numbering, drop '#' comment lines and empties, take the first
valid line.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens
from .vector import ColumnOrName, _col


def template_query(
    text: ColumnOrName, n_words: int = 5, prefix: str = "find documents about "
) -> Column:
    """Deterministic query text: ``prefix`` + first ``n_words`` tokens.

    DuckDB twin: prefix || coalesce(array_to_string(toks[1:n], ' '), '')
    over regexp_split_to_array(lower(trim(text)), '\\s+'). Both sides
    coalesce so a NULL-text or token-less document yields the bare
    prefix rather than NULL-propagating (Spark's array_join of a NULL
    array is NULL; DuckDB's array_to_string of an EMPTY list is NULL —
    opposite corners of the same hazard).
    """
    head = F.slice(tokens(text), 1, n_words)
    return F.concat(
        F.lit(prefix), F.coalesce(F.array_join(head, " "), F.lit(""))
    )


def generate_queries(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_words: int = 5,
) -> DataFrame:
    """U1 batch shape: documents in → (query_id, query) out."""
    return docs.select(
        F.col(id_col).alias("query_id"),
        template_query(text_col, n_words).alias("query"),
    )


def clean_query_line(line: ColumnOrName) -> Column:
    """F5 normalization of one generated line: trim, strip leading
    'N.' / 'N)' numbering."""
    t = F.trim(_col(line))
    return F.regexp_replace(t, r"^\d+[.)]\s*", "")


def clean_query_lines(
    lines: DataFrame, line_col: str = "value", out_col: str = "query"
) -> DataFrame:
    """F5 set shape: keep non-empty, non-comment lines, cleaned.

    Input column defaults to ``value`` (the ``spark.read.text`` schema —
    the reference's query cache is one query per line).
    """
    cleaned = clean_query_line(line_col)
    return (
        lines.select(cleaned.alias(out_col))
        .filter((F.col(out_col) != "") & (~F.col(out_col).startswith("#")))
    )
