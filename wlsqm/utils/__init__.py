"""Utils namespace of the wlsqm compatibility package."""
