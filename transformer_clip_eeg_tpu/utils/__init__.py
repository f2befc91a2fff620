"""Logging, configuration, and torch-checkpoint import/export utilities."""
