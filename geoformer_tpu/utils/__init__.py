from geoformer_tpu.utils.config import Config, config_from_args, load_config
from geoformer_tpu.utils.logger import create_logger
from geoformer_tpu.utils.meters import AverageMeter

__all__ = ["Config", "config_from_args", "load_config", "create_logger", "AverageMeter"]
