from .ssemap import (SSEMapHit, iter_ssemap_output,  # noqa: F401
                     parse_ssemap_output, remap_permutation, remap_subset,
                     write_html, write_pml)
