from .visualizer import Det3DVisualizer

__all__ = ['Det3DVisualizer']
