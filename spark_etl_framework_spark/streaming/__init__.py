"""Structured Streaming actors: stream readers/writers + stateful transform."""
