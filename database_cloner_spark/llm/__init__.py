"""LLM-data-pipeline operator library ([X] tier, SURVEY.md §2.11).

Dedup (exact / shingle-Jaccard / MinHash-LSH / SimHash / embedding),
similarity search (brute-force cosine + IVF), text analysis (tokens,
quality, language-ID, fingerprinting), and multimodal column plumbing.
"""
