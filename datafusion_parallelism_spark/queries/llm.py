"""LLM-pipeline corpus: dedup, similarity, text, multimodal (filled in incrementally)."""
