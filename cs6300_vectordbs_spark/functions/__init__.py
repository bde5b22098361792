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
