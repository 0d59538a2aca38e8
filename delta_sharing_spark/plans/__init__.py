"""Metadata plane: commit log, file statistics, predicate translation."""
