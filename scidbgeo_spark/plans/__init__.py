"""Plan-level machinery: skew handling, lineage/checkpointing."""
