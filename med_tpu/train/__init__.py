"""Training engine: losses, optimizer, jitted train/eval steps, epoch loops,
and checkpointing (reference ``MED/modeling/modeling_utils.py``)."""
