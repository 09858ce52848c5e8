"""Transforms and analysis operators (SURVEY.md §2.2, §2.5, plus the
training-data-pipeline operator family: dedup, similarity search, text
analysis, multimodal plumbing)."""
