"""Batch and streaming sources (parquet, JSON, Kafka/Avro gated)."""
