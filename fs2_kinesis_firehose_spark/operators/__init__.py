"""Tier C operators: dedup (exact/MinHash-LSH/SimHash/n-gram/embedding-GEMM),
similarity search + ANN index, text analysis + Gopher quality filters,
multimodal, curation (split/mix/PII/packing/stratified sample), temporal
(interval join, time-bucket rollup, sessionization), skew salting, UDTFs."""
