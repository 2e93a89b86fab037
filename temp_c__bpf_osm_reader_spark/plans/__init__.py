"""Execution plans: snapshot commits, lineage metrics, checkpoint resume."""
