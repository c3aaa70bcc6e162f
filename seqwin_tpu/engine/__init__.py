"""Device (XLA/TPU) compute engine for the minimizer pan-genome graph."""
