from .inference import init_model, inference_detector
from .inferencers import Base3DInferencer, LidarDet3DInferencer

__all__ = ['init_model', 'inference_detector', 'Base3DInferencer',
           'LidarDet3DInferencer']
