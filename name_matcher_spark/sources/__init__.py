"""Sources/sinks: stage checkpointing with lineage manifests."""
