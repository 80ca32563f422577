"""Search — SURVEY §2.10: BM25 fulltext, vector similarity, hybrid RRF.

bm25    — tokenizer + posting-list pipeline + BM25 scoring
vector  — exact cosine/euclidean top-k, kNN join, KMeans-pruned + LSH ANN
hybrid  — Reciprocal Rank Fusion of ranked result lists
"""
