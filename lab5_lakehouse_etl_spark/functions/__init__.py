"""LLM-data-pipeline operator library: text analysis, dedup family,
similarity search, multimodal column plumbing (SURVEY §2.10)."""
