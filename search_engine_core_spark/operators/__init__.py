"""Distributed operators: stats, postings build, top-k, dedup, similarity."""
