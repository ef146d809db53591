"""Batched TPU compute primitives: distance kernels, top-k, brute force."""
