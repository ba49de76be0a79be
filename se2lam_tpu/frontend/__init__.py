from .orb import OrbConfig, OrbFeatures, make_extractor  # noqa: F401
from .matcher import (  # noqa: F401
    TH_HIGH,
    TH_LOW,
    hamming_matrix,
    match_by_projection,
    match_by_window,
    mutual_match,
)
