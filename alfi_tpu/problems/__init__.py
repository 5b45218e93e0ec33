from .ldc import (
    ThreeDimLidDrivenCavityProblem,
    TwoDimLidDrivenCavityProblem,
)
from .mms import TwoDimLidDrivenCavityMMSProblem
