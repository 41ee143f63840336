from .second_fpn import SECONDFPN
from .generalized_lss_fpn import GeneralizedLSSFPN

__all__ = ['SECONDFPN', 'GeneralizedLSSFPN']
