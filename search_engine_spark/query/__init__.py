from .engine import SearchEngine, SearchResult  # noqa: F401
