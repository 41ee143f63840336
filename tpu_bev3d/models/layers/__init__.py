from .common import ConvBNAct, DeconvBNAct, MaskedBatchNorm, MLP

__all__ = ['ConvBNAct', 'DeconvBNAct', 'MaskedBatchNorm', 'MLP']
