"""Host-side utilities: shape bucketing, datasets, latency stats, snapshots."""
