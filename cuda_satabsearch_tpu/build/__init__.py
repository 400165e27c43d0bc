from .builder import build_entry, build_from_file, extract_sses  # noqa: F401
from .pdbfile import read_pdb  # noqa: F401
