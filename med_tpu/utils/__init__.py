"""Shared utilities: native-library loading, PRNG plumbing, prefetching."""
