"""Structured Streaming façade over the batch operators."""
