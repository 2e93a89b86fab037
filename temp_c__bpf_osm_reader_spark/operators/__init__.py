"""DataFrame operators — the engine's query layer (SURVEY §2 inventory)."""
