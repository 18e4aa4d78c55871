"""Test/fixture helpers (deterministic Delta tables derived from testdata)."""
