"""Streaming utilities: schema compatibility gate, admission limits."""
