"""Plan builders: whole-pipeline DataFrame plans (logical plans only —
Catalyst picks the physical strategy)."""
