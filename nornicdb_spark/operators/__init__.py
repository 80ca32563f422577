"""Graph pattern + data-pipeline operators.

expand      — 1-hop / chained / undirected expands, OPTIONAL MATCH
paths       — variable-length paths, shortestPath/allShortestPaths BFS
algorithms  — pageRank, WCC, label propagation, link prediction, k-hop
dedup       — exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup
textops     — language-ID, quality scoring, token counts, fingerprints
simsearch   — brute-force + pruned nearest-neighbor search
multimodal  — binary-column (image/audio/video) plumbing with stub decoders
"""
