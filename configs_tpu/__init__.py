"""Experiment configs (the reference's configs/deepsvg/* equivalents)."""
