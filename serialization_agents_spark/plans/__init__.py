"""End-to-end pipeline plans: staged runner, lineage, checkpoint/resume."""
