from .second_fpn import SECONDFPN

__all__ = ['SECONDFPN']
