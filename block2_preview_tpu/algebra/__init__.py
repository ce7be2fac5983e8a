"""Pure-Python/NumPy block-sparse MPS/MPO algebra (reference
pyblock2/algebra/core.py) — explicit quantum-labeled tensors for interop,
cross-checking, and pedagogy, independent of the production sweep engine.
"""

from .core import MPO, MPS, SubTensor, Tensor  # noqa: F401
