"""Shared utilities: tokenization, profiling, checkpoint I/O."""
