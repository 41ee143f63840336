from .model_utils import (create_detector_inputs, create_multimodal_inputs,
                          build_detector_from_cfg)

__all__ = ['create_detector_inputs', 'create_multimodal_inputs',
           'build_detector_from_cfg']
