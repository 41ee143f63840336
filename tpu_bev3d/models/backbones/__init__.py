from .second import SECOND

__all__ = ['SECOND']
