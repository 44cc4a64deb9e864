"""Physical operators: postings build/codec/merge, top-k scoring, aggs, dedup, ANN."""
