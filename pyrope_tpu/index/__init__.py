"""Index families: Flat, IVF-Flat, IVF-PQ, HNSW, Delta."""
