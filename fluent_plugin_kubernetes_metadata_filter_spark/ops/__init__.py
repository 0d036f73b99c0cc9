"""Large-scale training-data operators: dedup, similarity search, text
analysis, multimodal plumbing. All Spark-first: JVM expressions where
possible, Arrow-batched pandas UDFs where not, never per-row Python."""
