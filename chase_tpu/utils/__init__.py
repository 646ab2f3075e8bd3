"""Misc utilities."""
