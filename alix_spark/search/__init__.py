"""Query engine: parser, boolean retrieval, BM25 ranking, WAND fast path."""
