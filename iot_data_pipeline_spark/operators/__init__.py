"""Relational + LLM-data operators, each a pure (spark, sf_dir) -> DataFrame."""
