from gcc_tpu.utils.meters import AverageMeter

__all__ = ["AverageMeter"]
