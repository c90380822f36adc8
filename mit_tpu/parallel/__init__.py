"""Device-mesh parallelism: sharding rules and sharded train/decode steps."""
