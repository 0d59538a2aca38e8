"""Scalar/array function helpers shared by operators and workloads."""
