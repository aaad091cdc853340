from .skin import skin3d_good, skin3d_normal, skin3d_bad, skin_lex, skinlist_by_name
from .decomp import BrickDecomp, Section, Run

__all__ = [
    "skin3d_good",
    "skin3d_normal",
    "skin3d_bad",
    "skin_lex",
    "skinlist_by_name",
    "BrickDecomp",
    "Section",
    "Run",
]
