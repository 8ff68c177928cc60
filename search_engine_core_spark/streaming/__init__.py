"""Streaming & stateful dataflow: incremental indexing, frontier BFS,
retry/backoff policy (reference T1-T9 analogues)."""
