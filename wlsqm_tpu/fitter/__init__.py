"""Fitter subpackage: DOF definitions, batched engine, and user-facing APIs."""
