"""Operator modules. Each registers its queries into plans.registry on import."""
