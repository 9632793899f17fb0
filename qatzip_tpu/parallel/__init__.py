"""Device-mesh dispatch: chunk data-parallel compression over TPU chips."""
