"""Query plans: the end-to-end daily pipeline and report assembly."""
