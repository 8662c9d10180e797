from vietasr_tpu.models.quartznet import (
    QuartzNet,
    init_quartznet,
    quartznet_apply,
    fold_batchnorm,
)
from vietasr_tpu.models.conformer import init_conformer, conformer_apply


def model_init(rng, cfg):
    """Architecture dispatch over a ModelConfig."""
    if cfg.architecture == "conformer":
        return init_conformer(rng, cfg.conformer,
                              cfg.featurizer.features * cfg.featurizer.frame_splicing,
                              cfg.num_classes)
    return init_quartznet(rng, cfg.encoder, cfg.num_classes)


def model_apply(variables, feats, feat_lens, *, cfg, **kwargs):
    if cfg.architecture == "conformer":
        return conformer_apply(variables, feats, feat_lens,
                               cfg=cfg.conformer, **kwargs)
    return quartznet_apply(variables, feats, feat_lens, cfg=cfg.encoder,
                           **kwargs)


__all__ = [
    "QuartzNet",
    "init_quartznet",
    "quartznet_apply",
    "fold_batchnorm",
    "init_conformer",
    "conformer_apply",
    "model_init",
    "model_apply",
]
