"""Host utilities: weight import, logging, visualization."""
