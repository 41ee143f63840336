from .second_fpn import SECONDFPN
from .generalized_lss_fpn import GeneralizedLSSFPN
from .fpn import FPN, CPFPN

__all__ = ['SECONDFPN', 'GeneralizedLSSFPN', 'FPN', 'CPFPN']
