"""Host utilities: observability, colormaps, point-cloud export."""
