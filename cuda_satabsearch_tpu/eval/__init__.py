from .gumbelfit import fit_from_slrtab, fit_gumbel  # noqa: F401
from .results import (iter_multiquery, parse_searchresult,  # noqa: F401
                      write_slrtab)
from .roc import auc, compute_auc, roc_curve, roc_n  # noqa: F401
