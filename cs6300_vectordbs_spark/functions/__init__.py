from .vector import (  # noqa: F401
    as_double,
    dot,
    l2_norm,
    l2_normalize,
    cosine_sim,
    cosine_dist,
)
from .text import (  # noqa: F401
    token_count,
    tokens,
    quality_score,
    lang_id,
    doc_fingerprint,
    truncate,
)
from .ids import sequential_id, format_doc_id  # noqa: F401
from .embed import embed_text, embed_documents, embed_text_model  # noqa: F401
from .querygen import (  # noqa: F401
    template_query,
    generate_queries,
    clean_query_line,
    clean_query_lines,
)
