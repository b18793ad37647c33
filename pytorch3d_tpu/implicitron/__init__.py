"""Implicitron: configurable neural-rendering framework (reference pytorch3d/implicitron)."""
