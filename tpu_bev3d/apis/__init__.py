from .inference import init_model, inference_detector

__all__ = ['init_model', 'inference_detector']
