"""Placeholder — filled in later this round."""
