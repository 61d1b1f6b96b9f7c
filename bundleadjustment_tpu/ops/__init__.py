from bundleadjustment_tpu.ops.matching import (
    hamming_distance_matrix,
    l2_distance_matrix,
    match_descriptors,
)

__all__ = [
    "hamming_distance_matrix",
    "l2_distance_matrix",
    "match_descriptors",
]
