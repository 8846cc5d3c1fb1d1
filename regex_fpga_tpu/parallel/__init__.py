from .dist_scan import dfa_scan_fast_dist, nfa_scan_dist
from .mesh import DATA_AXIS, SEQ_AXIS, make_mesh

__all__ = [
    "DATA_AXIS",
    "SEQ_AXIS",
    "dfa_scan_fast_dist",
    "make_mesh",
    "nfa_scan_dist",
]
