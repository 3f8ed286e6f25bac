from geoformer_tpu.losses.criterion import InstSetCriterion
from geoformer_tpu.losses.criterion_fs import FSInstSetCriterion

__all__ = ["InstSetCriterion", "FSInstSetCriterion"]
