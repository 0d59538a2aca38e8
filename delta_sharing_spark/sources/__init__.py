"""Spark DataSource integrations for shared tables."""
