"""Multi-chip sharding layer: device meshes, halo exchange, sharded level ops."""
