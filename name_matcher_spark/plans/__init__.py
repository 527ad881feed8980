"""End-to-end pipeline orchestration with stage checkpoints."""
