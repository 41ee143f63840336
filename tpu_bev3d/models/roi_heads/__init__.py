from .bev_roi_head import BEVGridRoIHead

__all__ = ['BEVGridRoIHead']
