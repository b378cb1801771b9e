"""Tier C operators: dedup, similarity search, text analysis, multimodal."""
