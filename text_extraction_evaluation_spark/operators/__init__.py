"""Distributed operators: extraction/scoring Arrow kernels + relational ops."""
