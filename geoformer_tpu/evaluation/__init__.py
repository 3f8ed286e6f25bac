from geoformer_tpu.evaluation.scannet_eval import ScanNetEval

__all__ = ["ScanNetEval"]
