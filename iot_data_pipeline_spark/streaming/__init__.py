"""Structured Streaming operators (file-source replay of the events table)."""
