"""Benchmarking and logging utilities."""
