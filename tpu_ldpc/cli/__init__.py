"""Command-line entry points (L5)."""
