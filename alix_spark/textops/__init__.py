"""Training-data pipeline operators: deduplication, similarity search,
text quality analysis, multimodal plumbing. These extend the reference's
corpus-analytics surface with the operations a 100 TB data-curation
pipeline needs (dedup families, ANN, language-ID, quality scoring)."""
