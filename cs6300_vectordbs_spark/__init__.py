"""cs6300_vectordbs_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of the reference vector-database
benchmarking harness (jgfife/cs6300-vectordbs), re-expressed Spark-first.

Capability surface (see SURVEY.md §2):
  corpus ingestion → embedding → vector index build → batched top-k
  similarity search → relevance labeling → IR/latency metric aggregation,
plus large-scale training-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal plumbing, streaming ingest).

Everything is expressed as DataFrame -> DataFrame library functions so
Catalyst owns planning (predicate pushdown, broadcast selection, AQE);
there is no custom IR.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
from .io import read_table, TABLES  # noqa: F401
