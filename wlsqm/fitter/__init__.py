"""Fitter namespace of the wlsqm compatibility package."""
