"""Multi-chip data-parallel sharding of the case axis."""
