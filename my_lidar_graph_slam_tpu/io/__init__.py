"""I/O: CARMEN log ingestion, map/pose-graph export, visualization."""
