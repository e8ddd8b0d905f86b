"""Structured Streaming surface: incremental crawl ingestion."""
