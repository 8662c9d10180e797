"""vietasr_tpu — a TPU-native Vietnamese ASR framework (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of dangvansam/viet-asr
(QuartzNet CTC acoustic model + n-gram LM beam search), designed TPU-first:

- log-mel frontend as a pure jitted JAX function (reference semantics:
  nemo/collections/asr/parts/features.py:245-301)
- QuartzNet encoder as functional pytree modules in NWC layout — depthwise
  convs + MXU-friendly pointwise matmuls (reference:
  nemo/collections/asr/parts/jasper.py:172-448)
- CTC loss as a log-semiring lax.scan alpha recursion (reference wraps cuDNN:
  nemo/collections/asr/losses.py:10-61)
- data parallelism via jax.sharding.Mesh + NamedSharding instead of DDP/NCCL
  (reference: nemo/backends/pytorch/actions.py:1188-1272)

There is deliberately no lazy NmTensor graph layer: jit tracing plays that
role (see SURVEY.md §1 "Key architectural idea").
"""

from vietasr_tpu.version import __version__

__all__ = ["__version__"]
