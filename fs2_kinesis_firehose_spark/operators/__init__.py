"""Tier C operators: dedup (exact/MinHash-LSH/SimHash/n-gram/embedding-GEMM),
similarity search + ANN index, text analysis + Gopher quality filters,
multimodal, curation (split incl. leakage-safe, mix, PII, packing,
stratified/weighted sampling, quantile buckets), temporal (interval join,
time-bucket rollup, sessionization), graph (PageRank, triangle counting,
label propagation), k-means, Misra–Gries heavy hitters, winnowing
fingerprints, BM25 + RRF retrieval, snapshot upsert (MERGE), skew salting,
UDTFs."""
