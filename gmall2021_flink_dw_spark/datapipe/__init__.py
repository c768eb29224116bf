"""LLM training-data pipeline operators (the north-star extensions).

Beyond the reference's own surface: deduplication (exact, n-gram
Jaccard, MinHash+LSH, SimHash), similarity search (brute-force and
bucketed ANN), text analysis (language-ID, quality scoring, token
counting, fingerprinting), and multimodal binary-column plumbing —
each designed as DataFrame -> DataFrame operators that scale to 100 TB
(inverted-index joins instead of all-pairs, banded LSH instead of
exhaustive comparison, broadcast query sets).
"""
