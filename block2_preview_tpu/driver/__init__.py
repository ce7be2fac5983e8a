from .core import DMRGDriver, ExprBuilder, SymmetryTypes
