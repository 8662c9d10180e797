"""Train/eval steps and the training driver.

Rebuilds the reference PtActions train loop capabilities
(/root/reference/nemo/backends/pytorch/actions.py:1057-1421) as pure jitted
functions over a TrainState:

- forward = featurize -> SpecAugment -> QuartzNet -> CTC loss, all on device
  in one compiled program (the reference runs module-by-module in Python).
- gradient accumulation as a lax.scan over microbatches (reference uses
  batches_per_step + DDP.no_sync, actions.py:1347-1401).
- NaN/inf guard: non-finite loss skips the update and counts it
  (actions.py:1353-1376), without host sync.
- data parallelism: jit the same step with the batch sharded over a 1-axis
  Mesh — XLA inserts the gradient psum that DDP's allreduce did
  (actions.py:1252-1254). Batch-norm batch stats are computed by global
  mean under jit, i.e. SyncBatchNorm semantics (actions.py:1229-1248) for
  free.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vietasr_tpu.config import ModelConfig
from vietasr_tpu.frontend.features import make_featurizer
from vietasr_tpu.models import model_apply
from vietasr_tpu.ops.ctc_loss import ctc_loss
from vietasr_tpu.ops.greedy import collapse_batch, greedy_decode, ids_to_text
from vietasr_tpu.ops.specaug import apply_spec_augment
from vietasr_tpu.train.metrics import word_error_rate
from vietasr_tpu.train.state import TrainState


def train_rng(seed: int) -> jax.Array:
    """Training RNG key: the 'rbg' implementation (hardware
    RngBitGenerator HLO). Threefry dropout masks cost real step time on
    TPU — measured 120.7 -> 81.1 ms/step (1.49x) on the Conformer train
    config, where the per-element xor chains dominated the matmul
    epilogue fusions. rbg trades splittability guarantees we don't rely
    on (keys are split linearly per step) for that speed."""
    return jax.random.key(seed, impl="rbg")


def batch_to_arrays(batch) -> Dict[str, jnp.ndarray]:
    return {
        "signal": jnp.asarray(batch.signal),
        "signal_lens": jnp.asarray(batch.signal_lens),
        "tokens": jnp.asarray(batch.tokens),
        "token_lens": jnp.asarray(batch.token_lens),
    }


def make_loss_fn(cfg: ModelConfig, *, use_specaug: bool = True,
                 compute_dtype=None, ctc_impl: str = "scan"):
    """compute_dtype=bfloat16 runs the encoder matmuls/convs in bf16 with
    fp32 params and accumulation — the TPU replacement for the reference's
    Apex AMP O1/O2 (actions.py:352-378); no loss scaling is needed.

    ctc_impl="pallas" swaps the lax.scan CTC recursion for the fused
    single-kernel alpha/beta pair (ops/pallas_ctc.py) — faster on one
    chip; keep "scan" for pjit-sharded multi-chip steps."""
    featurize = make_featurizer(cfg.featurizer)
    blank = cfg.num_classes

    def loss_fn(params, batch_stats, batch, rng, training: bool,
                sched=None):
        from vietasr_tpu.utils.typing import assert_audio_batch, assert_labels

        assert_audio_batch(batch["signal"], batch["signal_lens"])
        assert_labels(batch["tokens"], batch["token_lens"])
        variables = {"params": params, "batch_stats": batch_stats}
        r_dither, r_aug, r_drop = jax.random.split(rng, 3)
        feats, flens = featurize(batch["signal"], batch["signal_lens"],
                                 rng=r_dither, training=training)
        if training and use_specaug:
            sched = sched or {}
            feats = apply_spec_augment(
                r_aug, feats, cfg.spec_augment,
                active_freq=sched.get("specaug_freq_masks"),
                active_time=sched.get("specaug_time_masks"))
        log_probs, enc_lens, new_stats = model_apply(
            variables, feats, flens, cfg=cfg, training=training,
            rng=r_drop, compute_dtype=compute_dtype)
        per_sample = ctc_loss(log_probs, batch["tokens"], enc_lens,
                              batch["token_lens"], blank=blank,
                              reduction="none", impl=ctc_impl)
        # padded rows (signal_lens == 0) carry no loss; CTC-INFEASIBLE
        # rows (enc_lens too short for the label string — loss is the
        # ~1e30 NEG_INF sentinel, ops/ctc_loss.py) are masked PER SAMPLE,
        # torch's CTCLoss(zero_infinity=True) semantics (the reference's
        # effective behavior) — otherwise one short utterance poisons the
        # whole batch mean and the train-step NaN guard skips the entire
        # step: a corpus with a few infeasible samples learns NOTHING
        # while loss prints ~k/B * 1e30.
        valid = (batch["signal_lens"] > 0) \
            & jnp.isfinite(per_sample) & (per_sample < 1e25)
        per_sample = jnp.where(valid, per_sample, 0.0)
        loss = jnp.sum(per_sample) / jnp.maximum(jnp.sum(valid), 1)
        return loss, (new_stats, log_probs, enc_lens)

    return loss_fn


def make_train_step(
    cfg: ModelConfig,
    optimizer: optax.GradientTransformation,
    *,
    grad_accum: int = 1,
    use_specaug: bool = True,
    lr_schedule=None,
    compute_dtype=None,
    ctc_impl: str = "scan",
    value_schedules=None,
):
    """Returns train_step(state, batch_dict, rng) -> (state, metrics).

    value_schedules: optional {name: fn(step) -> scalar} evaluated on the
    traced step count each step (train/freeze.make_value_schedule). Known
    names route to knobs inside the step (specaug_freq_masks /
    specaug_time_masks anneal the live SpecAugment band counts); every
    scheduled value is also reported in metrics. Replaces the
    reference's ValueSetterCallback (callbacks.py:515-556) without
    host-side attribute pokes or recompiles."""
    loss_fn = make_loss_fn(cfg, use_specaug=use_specaug,
                           compute_dtype=compute_dtype, ctc_impl=ctc_impl)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def one_microbatch(carry, micro):
        params, stats, grad_sum, loss_sum, rng, sched = carry
        rng, sub = jax.random.split(rng)
        (loss, (new_stats, _, _)), grads = grad_fn(params, stats, micro, sub,
                                                   True, sched)
        grad_sum = jax.tree_util.tree_map(jnp.add, grad_sum, grads)
        return (params, new_stats, grad_sum, loss_sum + loss, rng,
                sched), None

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array):
        sched = {k: fn(state.step)
                 for k, fn in (value_schedules or {}).items()}
        if grad_accum > 1:
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((grad_accum, x.shape[0] // grad_accum)
                                    + x.shape[1:]), batch)
            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (_, new_stats, grad_sum, loss_sum, _, _), _ = jax.lax.scan(
                one_microbatch,
                (state.params, state.batch_stats, zero_grads, 0.0, rng,
                 sched),
                micro)
            grads = jax.tree_util.tree_map(lambda g: g / grad_accum, grad_sum)
            loss = loss_sum / grad_accum
        else:
            (loss, (new_stats, _, _)), grads = grad_fn(
                state.params, state.batch_stats, batch, rng, True, sched)

        # NaN/inf guard. Infeasible-sample sentinels are masked per sample
        # in make_loss_fn, so a masked-NaN row can leave loss finite while
        # grads are NaN (the row still leaks into BN batch stats and the
        # where-VJP turns 0 * NaN into NaN) — guard on grad norm too.
        grad_norm = optax.global_norm(grads)
        finite = jnp.isfinite(loss) & (loss < 1e25) & jnp.isfinite(grad_norm)
        safe_grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        updates, new_opt_state = optimizer.update(
            safe_grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        def keep_if_finite(new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(finite, n, o), new, old)

        state = state.replace(
            params=keep_if_finite(new_params, state.params),
            batch_stats=keep_if_finite(new_stats, state.batch_stats),
            opt_state=keep_if_finite(new_opt_state, state.opt_state),
            step=state.step + 1,
            skipped_steps=state.skipped_steps
            + jnp.where(finite, 0, 1).astype(jnp.int32),
        )
        metrics = {"loss": loss,
                   "grad_norm": jnp.where(finite, grad_norm, jnp.inf)}
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step)
        metrics.update(sched)
        return state, metrics

    return train_step


def make_eval_step(cfg: ModelConfig):
    """eval_step(variables, batch) -> dict with loss, greedy preds, lengths."""
    loss_fn = make_loss_fn(cfg, use_specaug=False)
    blank = cfg.num_classes

    def eval_step(params, batch_stats, batch):
        loss, (_, log_probs, enc_lens) = loss_fn(
            params, batch_stats, batch, jax.random.PRNGKey(0), False)
        preds, keep = greedy_decode(log_probs, enc_lens, blank=blank)
        return {"loss": loss, "preds": preds, "keep": keep,
                "enc_lens": enc_lens}

    return eval_step


def _prefetch(iterable, depth: int = 2):
    """Background-thread batch prefetch (the reference's DataLoader
    num_workers equivalent, data_layer.py): audio decode + on-the-fly
    augmentation run on the host while the device executes the previous
    step, so per-read perturbation (cli --augment) never serializes
    behind the train step. Worker exceptions re-raise at the consumer."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    done = object()
    stop = threading.Event()

    def _put(item) -> bool:
        # bounded put that gives up when the consumer abandoned the
        # generator (break / exception mid-epoch) — otherwise each
        # abandoned epoch leaks a thread blocked on a full queue
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterable:
                if not _put(item):
                    return
            _put(done)
        except BaseException as e:        # forwarded, not swallowed
            _put(e)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is done:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


@dataclasses.dataclass
class Trainer:
    """Epoch/step driver with callbacks, eval and checkpointing.

    Replaces the reference's PtActions.train epoch loop + callback dispatch
    (actions.py:1294-1416, nemo/core/callbacks.py). Callbacks are plain
    callables: fn(trainer, metrics_dict) invoked every `log_every` steps.
    """

    cfg: ModelConfig
    optimizer: optax.GradientTransformation
    grad_accum: int = 1
    use_specaug: bool = True
    lr_schedule: Optional[Callable] = None
    compute_dtype: Optional[str] = None      # e.g. "bfloat16"
    log_every: int = 10
    eval_every: int = 0
    checkpoint_manager: Optional[object] = None
    checkpoint_every: int = 0
    seed: int = 0
    # jax.profiler trace of steps [profile_start, profile_stop) written here
    # (replaces the reference's step-time-only observability, SURVEY §5.1)
    profile_dir: Optional[str] = None
    profile_start: int = 10
    profile_stop: int = 13
    # log a sample hyp/ref + batch WER every log_every steps (reference
    # monitor_asr_train_progress, helpers.py:36-78)
    monitor_progress: bool = False
    # "scan" | "pallas" | "auto" (pallas on a single TPU device, where the
    # fused kernel is ~1.3x and nothing needs to partition; scan otherwise)
    ctc_impl: str = "auto"
    # background-thread batch prefetch depth (0 disables)
    prefetch_depth: int = 2
    # {name: fn(step) -> scalar} traced annealing knobs (train/freeze.py
    # make_value_schedule); ValueSetterCallback equivalent
    value_schedules: Optional[dict] = None

    def __post_init__(self):
        dtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        impl = self.ctc_impl
        if impl == "auto":
            impl = "pallas" if (jax.device_count() == 1 and
                                jax.devices()[0].platform != "cpu") \
                else "scan"
        self._train_step = jax.jit(make_train_step(
            self.cfg, self.optimizer, grad_accum=self.grad_accum,
            use_specaug=self.use_specaug, lr_schedule=self.lr_schedule,
            compute_dtype=dtype, ctc_impl=impl,
            value_schedules=self.value_schedules))
        self._eval_step = jax.jit(make_eval_step(self.cfg))
        self.callbacks = []
        self.history = []

    def fit(self, state: TrainState, batcher: Iterable, *,
            num_epochs: int = 1, eval_batcher: Optional[Iterable] = None
            ) -> TrainState:
        rng = train_rng(self.seed)
        for epoch in range(num_epochs):
            t_epoch = time.time()
            it = (_prefetch(iter(batcher), depth=self.prefetch_depth)
                  if self.prefetch_depth > 0 else batcher)
            for batch in it:
                rng, step_rng = jax.random.split(rng)
                t0 = time.time()
                if self.profile_dir is not None \
                        and int(state.step) == self.profile_start:
                    jax.profiler.start_trace(self.profile_dir)
                state, metrics = self._train_step(
                    state, batch_to_arrays(batch), step_rng)
                step = int(state.step)
                if self.profile_dir is not None \
                        and step == self.profile_stop:
                    jax.tree_util.tree_leaves(state.params)[0] \
                        .block_until_ready()
                    jax.profiler.stop_trace()
                if self.log_every and step % self.log_every == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    m.update(step=step, epoch=epoch,
                             step_time=time.time() - t0)
                    if self.monitor_progress:
                        m.update(self._progress_sample(state, batch))
                    self.history.append(m)
                    for cb in self.callbacks:
                        cb(self, m)
                if (self.eval_every and eval_batcher is not None
                        and step % self.eval_every == 0):
                    self.evaluate(state, eval_batcher)
                if (self.checkpoint_manager is not None
                        and self.checkpoint_every
                        and step % self.checkpoint_every == 0):
                    self.checkpoint_manager.save(state, step)
            self.history.append({"epoch": epoch,
                                 "epoch_time": time.time() - t_epoch})
        return state

    def _progress_sample(self, state: TrainState, batch) -> dict:
        """Decode the current training batch and report one hyp/ref pair +
        batch WER (reference monitor_asr_train_progress)."""
        labels = self.cfg.labels
        out = self._eval_step(state.params, state.batch_stats,
                              batch_to_arrays(batch))
        seqs = collapse_batch(np.asarray(out["preds"]),
                              np.asarray(out["keep"]))
        hyps, refs = [], []
        for i, ids in enumerate(seqs):
            if batch.signal_lens[i] == 0:
                continue
            hyps.append(ids_to_text(ids, labels))
            refs.append("".join(
                labels[t] for t in batch.tokens[i, : batch.token_lens[i]]))
        if not hyps:
            return {}
        return {"train_wer": word_error_rate(hyps, refs),
                "sample_hyp": hyps[0], "sample_ref": refs[0]}

    def evaluate(self, state: TrainState, batcher: Iterable) -> dict:
        """Greedy-decode eval with corpus WER/CER (reference
        process_evaluation_epoch, helpers.py:175-204). In multi-host runs
        each process evaluates its manifest shard and the edit/token counts
        are summed across hosts (replacing the reference's padded
        all_gather of raw tensors, actions.py:584-616)."""
        from vietasr_tpu.train.metrics import levenshtein

        labels = self.cfg.labels
        hyps, refs, losses = [], [], []
        for batch in batcher:
            out = self._eval_step(state.params, state.batch_stats,
                                  batch_to_arrays(batch))
            losses.append(float(out["loss"]))
            seqs = collapse_batch(np.asarray(out["preds"]),
                                  np.asarray(out["keep"]))
            for i, ids in enumerate(seqs):
                if batch.signal_lens[i] == 0:
                    continue
                hyps.append(ids_to_text(ids, labels))
                refs.append("".join(
                    labels[t] for t in batch.tokens[i, : batch.token_lens[i]]))

        def counts(use_cer):
            edits = tokens = 0
            for h, r in zip(hyps, refs):
                h_l = list(h) if use_cer else h.split()
                r_l = list(r) if use_cer else r.split()
                edits += levenshtein(h_l, r_l)
                tokens += len(r_l)
            return edits, tokens

        from vietasr_tpu.parallel.distributed import gather_eval_results

        w_e, w_t = counts(False)
        c_e, c_t = counts(True)
        local = np.asarray(
            [w_e, w_t, c_e, c_t, len(hyps),
             float(np.sum(losses)) if losses else 0.0, len(losses)],
            np.float64)
        total = np.asarray(gather_eval_results(local))
        if total.ndim == 2:        # (hosts, 7) in multi-host runs
            total = total.sum(axis=0)
        result = {
            "eval_loss": float(total[5] / max(total[6], 1)),
            "wer": float(total[0] / total[1]) if total[1] else float("inf"),
            "cer": float(total[2] / total[3]) if total[3] else float("inf"),
            "num_utts": int(total[4]),
        }
        self.history.append(result)
        return result
