"""Physical-plan helpers: skew salting, adaptive partitioning, lineage
metrics, checkpoint-resumable writes."""
