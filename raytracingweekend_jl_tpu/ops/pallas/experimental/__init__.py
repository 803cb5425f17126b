"""Measured-negative prototypes kept as decision records (docs/SPATIAL.md).

Nothing here is on any production path; see the module docstrings for the
measurement that retired each experiment.
"""
