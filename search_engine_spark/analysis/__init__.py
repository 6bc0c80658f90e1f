from .text import (  # noqa: F401
    QUERY_STOPWORDS,
    edit_distance_leq,
    extract_text,
    extract_text_series,
    preprocess_query,
    tokenize,
    tokenize_series,
)
