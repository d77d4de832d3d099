"""Scalar/metric function surface: football metric formulas, text analysis,
vector math."""
