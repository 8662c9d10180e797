from vietasr_tpu.models.quartznet import (
    QuartzNet,
    init_quartznet,
    quartznet_apply,
    fold_batchnorm,
)

__all__ = ["QuartzNet", "init_quartznet", "quartznet_apply", "fold_batchnorm"]
