"""Reporting: waterfall tables, CSV artifacts, confidence intervals (L5)."""
