"""Sink actors (batch + streaming writers)."""
