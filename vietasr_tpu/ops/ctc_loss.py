"""CTC loss as a log-semiring alpha recursion on device.

The reference wraps cuDNN's nn.CTCLoss(blank=num_classes, reduction='none')
and then takes a plain batch mean WITHOUT normalizing by target length
(/root/reference/nemo/collections/asr/losses.py:46-58). We reproduce those
semantics exactly with a vectorized lax.scan over time — a fully on-device,
differentiable (via autodiff through the scan) implementation with static
shapes, no host round-trips, batched over B on the VPU.

Layout: the (B, 2L+1) alpha lattice rows live on VPU lanes; the per-step
gather of label log-probs is a take_along_axis on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _extend_targets(targets: jnp.ndarray, blank: int) -> jnp.ndarray:
    """(B, L) -> (B, 2L+1) interleaved with blanks: [b, y1, b, y2, ..., b]."""
    b, l = targets.shape
    ext = jnp.full((b, 2 * l + 1), blank, dtype=targets.dtype)
    return ext.at[:, 1::2].set(targets)


def ctc_loss(
    log_probs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
    *,
    blank: int,
    reduction: str = "mean_batch",
    impl: str = "scan",
) -> jnp.ndarray:
    """Negative log-likelihood of the CTC alignment marginal.

    Args:
      log_probs: (B, T, V) log-softmax outputs.
      targets: (B, L) int labels (padded arbitrarily beyond target_lengths).
      input_lengths: (B,) valid frames.
      target_lengths: (B,) valid labels.
      blank: blank id (== num_classes in this framework).
      reduction: "none" | "mean_batch" (reference batch mean, losses.py:57)
        | "mean" (normalized by target length then averaged).
      impl: "scan" (lax.scan; partitions under pjit — the multi-chip
        default) | "pallas" (fused single-kernel recursion each way,
        1.3x the unrolled scan at the train shape — ops/pallas_ctc.py)
        | "pallas_interpret" (pallas semantics on CPU, for tests).

    Returns: scalar loss (or (B,) if reduction == "none").
    """
    from vietasr_tpu.utils.typing import assert_labels, assert_log_probs

    assert_log_probs(log_probs, num_classes=blank, port="ctc_loss.log_probs")
    assert_labels(targets, target_lengths, port="ctc_loss.targets")
    bsz, t_max, _ = log_probs.shape
    l_max = targets.shape[1]
    s = 2 * l_max + 1

    ext = _extend_targets(targets.astype(jnp.int32), blank)        # (B, S)
    # can alpha skip from s-2? only if ext[s] != blank and ext[s] != ext[s-2]
    ext_shift2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=-1)[:, :s]
    can_skip = (ext != blank) & (ext != ext_shift2)                # (B, S)

    pos = jnp.arange(s)[None, :]
    valid_s = pos < (2 * target_lengths[:, None] + 1)              # (B, S)

    # hoist the emission lookup OUT of the scan, as a one-hot MXU
    # contraction: T in-scan gathers each lower to a serial windowed loop
    # on TPU (~30-60 us/step — they dominated the CTC time), a single
    # batched gather is little better and its backward is a scatter; the
    # one-hot einsum is one clean matmul each way. HIGHEST precision
    # keeps the looked-up values f32-exact (each output sums exactly one
    # input; bf16 passes would round it).
    v = log_probs.shape[2]
    ext_oh = jax.nn.one_hot(ext, v, dtype=log_probs.dtype)        # (B, S, V)
    lp_ext = jnp.einsum("btv,bsv->bts", log_probs, ext_oh,
                        precision=jax.lax.Precision.HIGHEST)      # (B, T, S)

    if impl in ("pallas", "pallas_interpret"):
        from vietasr_tpu.ops.pallas_ctc import ctc_neg_ll_pallas

        loss = ctc_neg_ll_pallas(
            lp_ext, can_skip, valid_s, input_lengths, target_lengths,
            interpret=(impl == "pallas_interpret"))
        if reduction == "none":
            return loss
        if reduction == "mean_batch":
            return jnp.mean(loss)
        if reduction == "mean":
            return jnp.mean(loss / jnp.maximum(target_lengths, 1))
        raise ValueError(f"unknown reduction {reduction!r}")
    if impl != "scan":
        raise ValueError(f"unknown impl {impl!r}")

    # initial alpha: positions 0 (blank) and 1 (first label, if any)
    alpha0 = jnp.where((pos <= 1) & valid_s, lp_ext[:, 0], NEG_INF)

    def step(alpha, t):
        lp_t = lp_ext[:, t]                                        # (B, S)
        a_prev1 = jnp.pad(alpha, ((0, 0), (1, 0)),
                          constant_values=NEG_INF)[:, :s]
        a_prev2 = jnp.pad(alpha, ((0, 0), (2, 0)),
                          constant_values=NEG_INF)[:, :s]
        a_prev2 = jnp.where(can_skip, a_prev2, NEG_INF)
        stacked = jnp.stack([alpha, a_prev1, a_prev2], axis=0)
        m = jnp.max(stacked, axis=0)
        summed = m + jnp.log(jnp.sum(jnp.exp(stacked - m[None]), axis=0))
        summed = jnp.where(m <= NEG_INF / 2, NEG_INF, summed)
        new_alpha = summed + lp_t
        new_alpha = jnp.where(valid_s, new_alpha, NEG_INF)
        # freeze alpha for samples whose input has ended
        active = (t < input_lengths)[:, None]
        return jnp.where(active, new_alpha, alpha), None

    # unroll: each alpha step is ~10 tiny (B, S) ops, so the loop is
    # issue-bound, not FLOP-bound; unrolling 8 steps per iteration lets
    # XLA fuse across frames (measured 14.2 -> 5.1 ms fwd+bwd at the
    # Conformer train shape, values bit-identical). Only at real encoder
    # lengths: at tiny t_max XLA fully unrolls the loop body instead,
    # and thousands of such bloated CPU-JIT executables (the exhaustive
    # beam-search oracles call this eagerly per candidate sequence)
    # exhaust LLVM code memory and segfault the process.
    unroll = 8 if t_max >= 32 else 1
    alpha, _ = jax.lax.scan(step, alpha0, jnp.arange(1, t_max),
                            unroll=unroll)

    # log-likelihood: alpha at final blank (2L) and final label (2L-1)
    end_blank = jnp.take_along_axis(alpha, (2 * target_lengths)[:, None],
                                    axis=1)[:, 0]
    idx_label = jnp.maximum(2 * target_lengths - 1, 0)
    end_label = jnp.take_along_axis(alpha, idx_label[:, None], axis=1)[:, 0]
    end_label = jnp.where(target_lengths > 0, end_label, NEG_INF)
    m = jnp.maximum(end_blank, end_label)
    ll = m + jnp.log(jnp.exp(end_blank - m) + jnp.exp(end_label - m))
    loss = -ll

    if reduction == "none":
        return loss
    if reduction == "mean_batch":
        return jnp.mean(loss)
    if reduction == "mean":
        return jnp.mean(loss / jnp.maximum(target_lengths, 1))
    raise ValueError(f"unknown reduction {reduction!r}")
