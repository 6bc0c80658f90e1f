from .webtext import (  # noqa: F401
    QUERY_TERM_RANKS,
    generate_webtext,
    vocabulary,
    write_webtext_parquet,
)
