from .ingest import (  # noqa: F401
    load_corpus_csv,
    MOVIE_COLUMN_MAP,
    write_table,
    table_exists,
    create_table_if_absent,
    read_query_cache,
    append_query_cache,
)
