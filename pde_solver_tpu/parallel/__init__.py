"""Multi-chip execution: domain decomposition over jax.sharding meshes."""
