"""Training-data pipeline extras beyond the reference's own operators:
exact dedup, SimHash, n-gram Jaccard similarity join, embedding ANN,
text analysis, multimodal column plumbing. All Spark-first (Catalyst
expressions; pandas UDFs only where numerics demand it)."""
