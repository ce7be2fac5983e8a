from .hubbard import hubbard_fcidump
from .qc import qc_fcidump
