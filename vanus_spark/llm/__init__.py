"""Large-scale training-data pipeline operators.

Beyond the reference's event surface, these are the operators a
100 TB corpus pipeline needs: deduplication (exact + 4 near-dup
families), similarity search over embeddings, text analysis, and
multimodal column plumbing. All are partition-parallel DataFrame
compositions — no driver-side loops, no collect().
"""
