"""Multi-chip / multi-host sharding of the alignment batch."""
