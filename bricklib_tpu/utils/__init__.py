from .bitset import BitSet
from .zmort import ZMort

__all__ = ["BitSet", "ZMort"]
