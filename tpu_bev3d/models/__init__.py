"""Model zoo: importing this package registers all components in MODELS.

Layout mirrors the reference (ref: mmdet3d/models/) — voxel_encoders,
middle_encoders, backbones, necks, dense_heads, detectors, losses,
task_modules.
"""
from . import losses          # noqa: F401
from . import task_modules    # noqa: F401
from . import voxel_encoders  # noqa: F401
from . import middle_encoders # noqa: F401
from . import backbones       # noqa: F401
from . import necks           # noqa: F401
from . import dense_heads     # noqa: F401
from . import view_transforms # noqa: F401
from . import detectors       # noqa: F401
from . import segmentors      # noqa: F401
from . import roi_heads       # noqa: F401
from . import test_time_augs  # noqa: F401
