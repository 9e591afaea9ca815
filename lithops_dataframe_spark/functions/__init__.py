"""Scalar function helpers shared by operators and plans."""
