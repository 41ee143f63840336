from .minkunet import MinkUNet, MinkUNetBackbone

__all__ = ['MinkUNet', 'MinkUNetBackbone']
