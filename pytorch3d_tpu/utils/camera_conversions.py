"""OpenCV camera conversions module (reference utils/camera_conversions.py).

The functions live in renderer/camera_conversions.py in this package;
this module mirrors the reference file layout.
"""

from ..renderer.camera_conversions import (  # noqa: F401
    cameras_from_opencv_projection,
    opencv_from_cameras_projection,
    pulsar_from_cameras_projection,
    pulsar_from_opencv_projection,
)
