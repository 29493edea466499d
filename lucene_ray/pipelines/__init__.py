"""Training-data pipeline operators: text analysis, dedup, similarity
search, multimodal plumbing — all Ray Data streaming transforms."""
