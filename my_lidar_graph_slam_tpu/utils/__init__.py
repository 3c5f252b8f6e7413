"""Core math, configuration, and observability utilities."""
