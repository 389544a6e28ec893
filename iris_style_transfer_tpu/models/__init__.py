"""Pure-functional model zoo with explicit parameter pytrees.

Public API parity with the reference's ``models/__init__.py:1-6``:
VGG19, RITnet, ResNet50, EfficientNet, Classifier1, Classifier2,
GazeEstimator1, GazeEstimator2, GazeEstimator1_complicated,
extract_eye_landmarks.

Each model is an (init, apply) pair over an explicit param pytree — no
module state, everything jit/vmap/pjit-able.  ``port.py`` converts torch
state dicts (torchvision / smp / the bundled RITnet pkl) to these pytrees.
"""

from .vgg import VGG19
from .ritnet import RITnet
from .resnet import ResNet50
from .efficientnet import EfficientNet
from .classifiers import Classifier1, Classifier2
from .gaze import (
    GazeEstimator1,
    GazeEstimator2,
    GazeEstimator1Complicated,
    find_ellipse_features,
    find_eye_corners,
)
from ..ops.ellipse import extract_eye_landmarks
from .pretrained import load_pretrained, pretrained_path

# reference spelling alias (models/__init__.py:6)
GazeEstimator1_complicated = GazeEstimator1Complicated

name = "models"
