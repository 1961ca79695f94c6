"""Minimal Bio stand-in (MAF parsing only) for running the reference."""
