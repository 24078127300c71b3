from . import inverse, logistic_kde, manifold, matrix, rotations, special, splines

__all__ = ["inverse", "logistic_kde", "manifold", "matrix", "rotations",
           "special", "splines"]
