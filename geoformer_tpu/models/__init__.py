from geoformer_tpu.models.geoformer import GeoFormer
from geoformer_tpu.models.geoformer_fs import GeoFormerFS

__all__ = ["GeoFormer", "GeoFormerFS"]
