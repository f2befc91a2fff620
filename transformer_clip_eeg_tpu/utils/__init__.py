"""Logging, configuration, and torch-checkpoint import utilities."""
