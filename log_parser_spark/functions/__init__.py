"""Scalar/vectorized function library: detokenize kernel, grok patterns,
user-agent classifier, bucketing and unit-normalization expressions."""
