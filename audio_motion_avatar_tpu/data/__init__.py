"""Host-side data pipelines and batch containers."""
