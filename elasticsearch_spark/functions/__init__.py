"""Scalar-function layer: analysis chain, norms, BM25 math, text stats."""
