from mvdetr_tpu.utils.cache import enable_compilation_cache
from mvdetr_tpu.utils.logger import AverageMeter, Logger

__all__ = ["AverageMeter", "Logger", "enable_compilation_cache"]
