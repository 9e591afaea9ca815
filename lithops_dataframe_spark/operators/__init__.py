"""Custom operators: as-of/range joins, dedup, similarity, text, multimodal."""
