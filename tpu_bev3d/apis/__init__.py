from .inference import (camera_param_stack, init_model,
                        inference_detector,
                        inference_mono_3d_detector,
                        inference_multi_modality_detector,
                        inference_segmentor)
from .inferencers import (Base3DInferencer, LidarDet3DInferencer,
                          MonoDet3DInferencer,
                          MultiModalityDet3DInferencer,
                          LidarSeg3DInferencer)

__all__ = ['camera_param_stack', 'init_model',
           'inference_detector',
           'inference_mono_3d_detector',
           'inference_multi_modality_detector', 'inference_segmentor',
           'Base3DInferencer', 'LidarDet3DInferencer',
           'MonoDet3DInferencer', 'MultiModalityDet3DInferencer',
           'LidarSeg3DInferencer']
