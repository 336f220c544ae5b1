from . import dedup, keywords, similarity, sink, text_analysis  # noqa: F401
