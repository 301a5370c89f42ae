from .ncc import (CostContext, build_cost_context, ncc_cost, ncc_cost_batch,
                  bilinear_sample, warp_field)
from .geom import GeomContext, build_geom_context, geom_consistency_cost

__all__ = [
    "CostContext", "build_cost_context", "ncc_cost", "ncc_cost_batch",
    "bilinear_sample", "GeomContext", "build_geom_context",
    "geom_consistency_cost",
]
