"""Command-line interface: transcribe / train / eval.

Reference entry points: infer.py:174-207 (batch transcription over a wav
directory) and the NemoArgParser training flag set
(/root/reference/nemo/utils/argparse.py:6-133).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


def _add_common_model_args(p: argparse.ArgumentParser):
    p.add_argument("--config", required=True, help="model YAML config")
    p.add_argument("--encoder-checkpoint", help="reference-format encoder .pt")
    p.add_argument("--decoder-checkpoint", help="reference-format decoder .pt")
    p.add_argument("--checkpoint-dir", help="our msgpack checkpoint folder")


def cmd_transcribe(args) -> int:
    import numpy as np

    from vietasr_tpu.pipeline import Transcriber, TranscriberOptions

    opts = TranscriberOptions(
        beam_width=args.beam_width, lm_path=args.lm_path,
        lm_alpha=args.lm_alpha, lm_beta=args.lm_beta,
        decoder=args.decoder)
    variables = None
    if args.checkpoint_dir:
        variables = _load_msgpack_variables(args)
    t = Transcriber(
        args.config,
        encoder_checkpoint=args.encoder_checkpoint,
        decoder_checkpoint=args.decoder_checkpoint,
        variables=variables,
        options=opts)

    paths = []
    for target in args.audio:
        if os.path.isdir(target):
            # wav + mp3, like the reference CLI (infer.py:199-201)
            paths.extend(sorted(
                glob.glob(os.path.join(target, "*.wav"))
                + glob.glob(os.path.join(target, "*.mp3"))))
        else:
            paths.append(target)
    if not paths:
        print("no audio files found", file=sys.stderr)
        return 1

    from vietasr_tpu.audio.io import read_audio

    signals, kept = [], []
    sr = t.cfg.featurizer.sample_rate
    for p in paths:
        samples, _ = read_audio(p, target_sr=sr)
        if args.max_duration and len(samples) > args.max_duration * sr:
            print(f"SKIP (> {args.max_duration}s): {p}", file=sys.stderr)
            continue
        signals.append(samples)
        kept.append(p)
    if getattr(args, "int8", False):
        # calibrate static activation scales from the inputs themselves
        # (models/quantize.py; QuartzNet pointwise GEMMs go int8)
        t.calibrate_int8(signals[: min(len(signals), 16)])
    t0 = time.time()
    texts = t.transcribe_batch(signals)
    wall = time.time() - t0
    audio_secs = sum(len(s) for s in signals) / sr
    for p, text in zip(kept, texts):
        print(json.dumps({"audio_filepath": p, "pred_text": text},
                         ensure_ascii=False))
    print(f"# {len(kept)} files, {audio_secs:.1f}s audio in {wall:.2f}s "
          f"({audio_secs / max(wall, 1e-9):.1f}x realtime)", file=sys.stderr)
    return 0


def _load_msgpack_variables(args):
    import jax

    from vietasr_tpu.config import load_config
    from vietasr_tpu.models import model_init
    from vietasr_tpu.train import CheckpointManager

    cfg = load_config(args.config)
    template_vars = model_init(jax.random.PRNGKey(0), cfg)
    variables = CheckpointManager(args.checkpoint_dir).restore_variables(
        template_vars)
    if variables is None:
        raise FileNotFoundError(
            f"no checkpoints in {args.checkpoint_dir}")
    return variables


def _build_augmentor(spec: str, seed: int = 0):
    """`--augment speed,gain,noise[:p]` -> (AudioAugmentor, bucket_margin).

    Probabilities default to the reference recipe's spirit (speed always
    on; gain/noise/shift at 0.7). bucket_margin covers the worst-case
    length growth (speed 0.9x -> 1/0.9 longer) so a slowed waveform is
    never cropped against its transcript at the bucket boundary."""
    import numpy as np

    from vietasr_tpu.audio.augment import (AudioAugmentor, GainPerturbation,
                                           ShiftPerturbation,
                                           SpeedPerturbation,
                                           WhiteNoisePerturbation)

    rng = np.random.RandomState(seed)
    margin = 1.0
    perturbations = []
    for item in spec.split(","):
        name, _, p = item.partition(":")
        name = name.strip().lower()
        prob = float(p) if p else None
        if name == "speed":
            perturbations.append((prob if prob is not None else 1.0,
                                  SpeedPerturbation(0.9, 1.1, rng=rng)))
            margin = max(margin, 1.0 / 0.9)
        elif name == "gain":
            perturbations.append((prob if prob is not None else 0.7,
                                  GainPerturbation(-6, 6, rng=rng)))
        elif name == "noise":
            perturbations.append((prob if prob is not None else 0.7,
                                  WhiteNoisePerturbation(-60, -38, rng=rng)))
        elif name == "shift":
            perturbations.append((prob if prob is not None else 0.7,
                                  ShiftPerturbation(rng=rng)))
        else:
            raise SystemExit(f"unknown --augment perturbation: {name!r}")
    return AudioAugmentor(perturbations=perturbations, rng=rng), margin


def cmd_train(args) -> int:
    import jax

    from vietasr_tpu.audio import (AudioTextDataset, BucketBatcher,
                                   CharTokenizer, read_manifest)
    from vietasr_tpu.config import load_config
    from vietasr_tpu.models import model_init
    from vietasr_tpu.train import (CheckpointManager, TrainState,
                                   Trainer, make_optimizer, make_schedule)

    from vietasr_tpu.parallel import initialize_multihost

    topo = initialize_multihost(
        coordinator_address=args.coordinator_address,
        num_processes=args.num_processes, process_id=args.process_id)
    cfg = load_config(args.config)
    tok = CharTokenizer(cfg.labels)
    entries = read_manifest(args.train_manifest,
                            min_duration=cfg.data.min_duration,
                            max_duration=cfg.data.max_duration)
    # ON-THE-FLY waveform augmentation (reference data-layer perturbation,
    # perturb.py AudioAugmentor): a fresh random perturbation per READ, so
    # no two epochs see the same waveform — baking augmentation into wav
    # files once lets a model memorize utterance-level acoustics (the
    # round-3 held-out study failed exactly this way: train WER 0, held-out
    # WER 1.0 on a disk-fixed augmented corpus)
    augmentor = None
    bucket_margin = 1.0
    if args.augment:
        augmentor, bucket_margin = _build_augmentor(
            args.augment, seed=args.seed + 1000 * topo["process_index"])
    ds = AudioTextDataset(entries, tok,
                          sample_rate=cfg.featurizer.sample_rate,
                          trim=cfg.data.trim_silence,
                          augmentor=augmentor)
    # per-host manifest shard (reference DistributedSampler equivalent)
    batcher = BucketBatcher(ds, args.batch_size,
                            max_duration=cfg.data.max_duration or 16.7,
                            seed=args.seed,
                            shard_id=topo["process_index"],
                            num_shards=topo["process_count"],
                            bucket_margin=bucket_margin)

    steps_per_epoch = max(batcher.steps_per_epoch(), 1)
    total = args.num_epochs * steps_per_epoch
    schedule = make_schedule(args.lr_policy, args.lr, total,
                             warmup_steps=args.warmup_steps)
    opt = make_optimizer(args.optimizer, schedule,
                         weight_decay=args.weight_decay,
                         grad_clip_norm=args.grad_clip)
    variables = model_init(jax.random.PRNGKey(args.seed), cfg)
    state = TrainState.create(variables, opt)

    cm = CheckpointManager(args.work_dir, keep=args.keep_checkpoints)
    restored = cm.restore(state)
    if restored is not None:
        state = restored
        print(f"resumed from step {int(state.step)}")

    eval_batcher = None
    if args.eval_manifest:
        eval_ds = AudioTextDataset(
            read_manifest(args.eval_manifest), tok,
            sample_rate=cfg.featurizer.sample_rate)
        eval_batcher = BucketBatcher(eval_ds, args.batch_size, shuffle=False)

    trainer = Trainer(cfg=cfg, optimizer=opt, grad_accum=args.grad_accum,
                      lr_schedule=schedule, log_every=args.log_every,
                      eval_every=args.eval_every, checkpoint_manager=cm,
                      checkpoint_every=args.checkpoint_every, seed=args.seed,
                      compute_dtype=args.compute_dtype)
    trainer.callbacks.append(
        lambda tr, m: print(json.dumps(m, ensure_ascii=False)))
    state = trainer.fit(state, batcher, num_epochs=args.num_epochs,
                        eval_batcher=eval_batcher)
    cm.save(state)
    print(f"done at step {int(state.step)}")
    return 0


def cmd_serve(args) -> int:
    from vietasr_tpu.pipeline import Transcriber, TranscriberOptions
    from vietasr_tpu.serve import serve

    opts = TranscriberOptions(
        beam_width=args.beam_width, lm_path=args.lm_path,
        lm_alpha=args.lm_alpha, lm_beta=args.lm_beta)
    variables = _load_msgpack_variables(args) if args.checkpoint_dir else None
    t = Transcriber(args.config,
                    encoder_checkpoint=args.encoder_checkpoint,
                    decoder_checkpoint=args.decoder_checkpoint,
                    variables=variables, options=opts)
    pool = None
    if args.streaming:
        from vietasr_tpu.serve.streams import StreamPool

        if t.cfg.architecture == "conformer":
            from vietasr_tpu.streaming_conformer import \
                ConformerOnlineTranscriber

            ot = ConformerOnlineTranscriber(t.cfg, t.variables)
        else:
            from vietasr_tpu.streaming_online import OnlineTranscriber

            ot = OnlineTranscriber(t.cfg, t.variables)
        pool = StreamPool(ot, slots=args.stream_slots,
                          decoder=args.stream_decoder,
                          beam_width=args.beam_width,
                          lm_path=args.lm_path,
                          lm_alpha=args.lm_alpha, lm_beta=args.lm_beta)
    serve(t, host=args.host, port=args.port, record_dir=args.record_dir,
          stream_pool=pool)
    return 0


def cmd_eval(args) -> int:
    import jax

    from vietasr_tpu.audio import (AudioTextDataset, BucketBatcher,
                                   CharTokenizer, read_manifest)
    from vietasr_tpu.config import load_config
    from vietasr_tpu.models import model_init
    from vietasr_tpu.models.convert import variables_from_checkpoints
    from vietasr_tpu.train import TrainState, Trainer, make_optimizer

    cfg = load_config(args.config)
    if args.encoder_checkpoint and args.decoder_checkpoint:
        variables = variables_from_checkpoints(
            args.encoder_checkpoint, args.decoder_checkpoint, cfg.encoder)
    elif args.checkpoint_dir:
        variables = _load_msgpack_variables(args)
    else:
        variables = model_init(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer("sgd", 0.0)
    state = TrainState.create(variables, opt)
    tok = CharTokenizer(cfg.labels)
    ds = AudioTextDataset(read_manifest(args.manifest), tok,
                          sample_rate=cfg.featurizer.sample_rate)
    batcher = BucketBatcher(ds, args.batch_size, shuffle=False)
    trainer = Trainer(cfg=cfg, optimizer=opt)
    result = trainer.evaluate(state, batcher)
    print(json.dumps(result, ensure_ascii=False))
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="vietasr_tpu", description="TPU-native Vietnamese ASR")
    parser.add_argument("--platform", choices=["tpu", "cpu"], default=None,
                        help="force the JAX platform (default: environment)")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("transcribe", help="transcribe wav files or a directory")
    _add_common_model_args(p)
    p.add_argument("audio", nargs="+", help="wav files or directories")
    p.add_argument("--beam-width", type=int, default=100)
    p.add_argument("--lm-path", help="ARPA/kenlm n-gram LM for beam search")
    p.add_argument("--lm-alpha", type=float, default=0.5)
    p.add_argument("--lm-beta", type=float, default=1.5)
    p.add_argument("--decoder", default="greedy",
                   choices=["greedy", "beam", "device_beam"],
                   help="greedy | host C++ beam (+word LM) | on-device "
                        "batched beam (+char-LM table)")
    p.add_argument("--int8", action="store_true",
                   help="serve the QuartzNet pointwise convs as calibrated "
                        "int8 GEMMs (calibrates on the inputs)")
    p.add_argument("--max-duration", type=float, default=0.0,
                   help="skip files longer than this many seconds (0 = no "
                        "skip; the reference skips >10s, infer.py:201-203)")
    p.set_defaults(fn=cmd_transcribe)

    p = sub.add_parser("train", help="train from a JSON-lines manifest")
    _add_common_model_args(p)
    p.add_argument("--train-manifest", required=True)
    p.add_argument("--eval-manifest")
    p.add_argument("--work-dir", default="work")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--num-epochs", type=int, default=1)
    p.add_argument("--optimizer", default="novograd")
    p.add_argument("--lr", type=float, default=0.02)
    p.add_argument("--lr-policy", default="CosineAnnealing")
    p.add_argument("--warmup-steps", type=int, default=1000)
    p.add_argument("--weight-decay", type=float, default=0.001)
    p.add_argument("--grad-clip", type=float, default=None)
    p.add_argument("--grad-accum", type=int, default=1)
    p.add_argument("--augment", default=None,
                   help="on-the-fly waveform perturbations, e.g. "
                        "'speed,gain,noise' or 'speed:1.0,gain:0.5' "
                        "(reference data-layer perturb recipe)")
    p.add_argument("--compute-dtype", default=None,
                   choices=[None, "bfloat16", "float32"],
                   help="bf16 mixed precision (Apex AMP equivalent)")
    # multi-host launch (reference --local_rank + env:// equivalent)
    p.add_argument("--coordinator-address", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--eval-every", type=int, default=0)
    p.add_argument("--checkpoint-every", type=int, default=500)
    p.add_argument("--keep-checkpoints", type=int, default=4)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("serve", help="web demo: upload + mic websocket "
                                     "(reference app.py equivalent)")
    _add_common_model_args(p)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=5000)
    p.add_argument("--record-dir", default=None,
                   help="save received audio here (reference static/record)")
    p.add_argument("--streaming", action="store_true",
                   help="enable real-time partial-result websocket sessions")
    p.add_argument("--stream-slots", type=int, default=8)
    p.add_argument("--stream-decoder",
                   choices=("greedy", "beam", "beam_host"),
                   default="greedy",
                   help="per-stream incremental decoder; beam (batched "
                        "on-device, quality default) and beam_host "
                        "(legacy per-slot Python) emit \\r-prefixed "
                        "revision partials")
    p.add_argument("--beam-width", type=int, default=50)
    p.add_argument("--lm-path")
    p.add_argument("--lm-alpha", type=float, default=0.5)
    p.add_argument("--lm-beta", type=float, default=1.5)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("eval", help="WER/CER over a labelled manifest")
    _add_common_model_args(p)
    p.add_argument("--manifest", required=True)
    p.add_argument("--batch-size", type=int, default=16)
    p.set_defaults(fn=cmd_eval)

    args = parser.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from vietasr_tpu.utils.env import enable_compilation_cache
    enable_compilation_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
