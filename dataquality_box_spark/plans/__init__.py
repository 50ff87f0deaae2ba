"""Pipeline plans: stage composition, checkpointing, resume."""
