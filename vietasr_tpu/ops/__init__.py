from vietasr_tpu.ops.ctc_loss import ctc_loss
from vietasr_tpu.ops.greedy import greedy_decode, ctc_collapse, collapse_batch
from vietasr_tpu.ops.specaug import spec_augment, spec_cutout, apply_spec_augment

__all__ = [
    "ctc_loss",
    "greedy_decode",
    "ctc_collapse",
    "collapse_batch",
    "spec_augment",
    "spec_cutout",
    "apply_spec_augment",
]
