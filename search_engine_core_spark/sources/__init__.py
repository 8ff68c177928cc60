"""Sources/sinks: index build + read with checkpointed, resumable stages."""
