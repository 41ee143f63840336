from .second import SECOND
from .swin import SwinTransformer

__all__ = ['SECOND', 'SwinTransformer']
