from .symmetry import SymmetryGroup, SZ_GROUP, SGF_GROUP, NOPG_SZ_GROUP
from .state_info import StateInfo
from .blocks import BlockMatrix, MPSTensor, FusedBasis
from .fcidump import FCIDUMP
