"""CTC loss parity vs torch.nn.CTCLoss (the reference's backend,
losses.py:46-58): values and gradients."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vietasr_tpu.ops import ctc_loss


def make_case(seed, b=3, t=20, v=6, l=7):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, t, v).astype(np.float32)
    log_probs = torch.log_softmax(torch.tensor(logits), dim=-1).numpy()
    targets = rng.randint(0, v - 1, size=(b, l)).astype(np.int32)
    input_lens = rng.randint(t // 2, t + 1, size=(b,)).astype(np.int32)
    target_lens = rng.randint(1, l + 1, size=(b,)).astype(np.int32)
    # keep alignments feasible: T >= 2L+1 not required but T >= L
    target_lens = np.minimum(target_lens, input_lens // 2)
    target_lens = np.maximum(target_lens, 1)
    return log_probs, targets, input_lens, target_lens, v - 1


def torch_ctc(log_probs, targets, input_lens, target_lens, blank,
              reduction="none"):
    lp = torch.tensor(log_probs, requires_grad=True)
    crit = torch.nn.CTCLoss(blank=blank, reduction=reduction)
    loss = crit(lp.transpose(1, 0), torch.tensor(targets.astype(np.int64)),
                torch.tensor(input_lens.astype(np.int64)),
                torch.tensor(target_lens.astype(np.int64)))
    return loss, lp


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_ctc_loss_matches_torch(seed):
    log_probs, targets, il, tl, blank = make_case(seed)
    want, _ = torch_ctc(log_probs, targets, il, tl, blank)
    got = ctc_loss(jnp.asarray(log_probs), jnp.asarray(targets),
                   jnp.asarray(il), jnp.asarray(tl), blank=blank,
                   reduction="none")
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               atol=1e-4, rtol=1e-4)


def test_ctc_loss_mean_batch_matches_reference_semantics():
    """Reference: mean over batch of UN-normalized per-sample losses
    (losses.py:55-58)."""
    log_probs, targets, il, tl, blank = make_case(10)
    want, _ = torch_ctc(log_probs, targets, il, tl, blank)
    want = want.detach().numpy().mean()
    got = ctc_loss(jnp.asarray(log_probs), jnp.asarray(targets),
                   jnp.asarray(il), jnp.asarray(tl), blank=blank)
    assert abs(float(got) - want) < 1e-4


def test_ctc_loss_gradients_match_torch():
    """Compare d loss / d LOGITS through the full log_softmax + CTC chain.

    (torch's CTC backward returns the logits gradient assuming its input came
    from log_softmax, so the raw log_probs gradients are not comparable —
    but the end-to-end chain, which is what training uses, must match.)
    """
    rng = np.random.RandomState(20)
    b, t, v, l = 2, 12, 5, 4
    logits = rng.randn(b, t, v).astype(np.float32)
    targets = rng.randint(0, v - 1, size=(b, l)).astype(np.int32)
    il = np.array([12, 9], np.int32)
    tl = np.array([4, 3], np.int32)
    blank = v - 1

    lt = torch.tensor(logits, requires_grad=True)
    crit = torch.nn.CTCLoss(blank=blank, reduction="sum")
    loss_t = crit(torch.log_softmax(lt, dim=-1).transpose(1, 0),
                  torch.tensor(targets.astype(np.int64)),
                  torch.tensor(il.astype(np.int64)),
                  torch.tensor(tl.astype(np.int64)))
    loss_t.backward()
    want_grad = lt.grad.numpy()

    def loss_fn(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return jnp.sum(ctc_loss(lp, jnp.asarray(targets), jnp.asarray(il),
                                jnp.asarray(tl), blank=blank,
                                reduction="none"))

    got_grad = jax.grad(loss_fn)(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(got_grad), want_grad,
                               atol=1e-3, rtol=1e-3)


def test_ctc_loss_repeated_labels():
    """Repeats force the no-skip path (z_s == z_{s-2})."""
    v, blank = 4, 3
    rng = np.random.RandomState(5)
    logits = rng.randn(1, 15, v).astype(np.float32)
    log_probs = torch.log_softmax(torch.tensor(logits), dim=-1).numpy()
    targets = np.array([[1, 1, 2, 2, 1]], np.int32)
    il = np.array([15], np.int32)
    tl = np.array([5], np.int32)
    want, _ = torch_ctc(log_probs, targets, il, tl, blank)
    got = ctc_loss(jnp.asarray(log_probs), jnp.asarray(targets),
                   jnp.asarray(il), jnp.asarray(tl), blank=blank,
                   reduction="none")
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               atol=1e-4)


def test_ctc_loss_infeasible_is_huge():
    """Target longer than the input can emit -> torch gives inf; we give a
    very large finite loss (keeps grads NaN-free for the NaN guard)."""
    v, blank = 4, 3
    log_probs = np.log(np.full((1, 3, v), 0.25, np.float32))
    targets = np.array([[1, 2, 1, 2]], np.int32)
    got = ctc_loss(jnp.asarray(log_probs), jnp.asarray(targets),
                   jnp.asarray(np.array([3], np.int32)),
                   jnp.asarray(np.array([4], np.int32)), blank=blank,
                   reduction="none")
    assert float(got[0]) > 1e20
