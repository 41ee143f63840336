from .depth_lss import LSSTransform, DepthLSSTransform

__all__ = ['LSSTransform', 'DepthLSSTransform']
