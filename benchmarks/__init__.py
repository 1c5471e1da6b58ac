"""Benchmark harness package."""
