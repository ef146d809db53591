"""Quantization: k-means, product quantization, IVF+PQ, quantized graph."""
