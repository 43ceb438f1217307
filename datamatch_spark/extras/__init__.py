"""Large-scale training-data pipeline operators built on the same
engine primitives: deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding-cosine), similarity search, text analysis,
and multimodal column plumbing."""
