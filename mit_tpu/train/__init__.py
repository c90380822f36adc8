"""Training subsystem: jitted steps, loop, checkpointing, logging."""
