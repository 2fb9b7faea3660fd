from .fld import (  # noqa: F401
    EmpiricalDistribution,
    correction_factors_from_counts,
    effective_lengths_from_fld,
    normal_fragment_length_counts,
    normal_fragment_length_dist,
    smoothed_effective_lengths,
    unsmoothed_effective_lengths,
)
