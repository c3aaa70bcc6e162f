"""Multi-chip scale-out: device meshes, sharded build, collective merge."""
