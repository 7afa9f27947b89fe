"""Deterministic synthetic data generators (no external data, seeded)."""
