"""Large-scale training-data pipeline operators (beyond the reference):
deduplication, similarity search, text analysis, multimodal plumbing."""
