"""Utilities: checkpoint IO, memory probes, timing/profiling."""
