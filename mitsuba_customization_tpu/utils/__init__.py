"""Utilities: chi^2 test harness, image IO, logging, checkpointing."""
