"""Pipeline driver, checkpoint/lineage table, resume logic."""
