"""Source actors (batch + streaming readers)."""
