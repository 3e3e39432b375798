from . import gtcrn
from .gtcrn import GtcrnConfig, gtcrn_forward, init_gtcrn, make_gtcrn

__all__ = ["gtcrn", "GtcrnConfig", "gtcrn_forward", "init_gtcrn", "make_gtcrn"]
