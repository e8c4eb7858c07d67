from .integrate import simpson_nonuniform, simpson_weights
from .interp import bilinear_interp

__all__ = ["simpson_nonuniform", "simpson_weights", "bilinear_interp"]
