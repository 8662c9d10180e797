from vietasr_tpu.audio.io import AudioSegment, read_audio, resample, trim_silence
from vietasr_tpu.audio.manifest import read_manifest, ManifestEntry
from vietasr_tpu.audio.tokenizer import CharTokenizer
from vietasr_tpu.audio.dataset import (
    AudioTextDataset,
    BucketBatcher,
    Batch,
    pad_to_bucket,
)

__all__ = [
    "AudioSegment",
    "read_audio",
    "resample",
    "trim_silence",
    "read_manifest",
    "ManifestEntry",
    "CharTokenizer",
    "AudioTextDataset",
    "BucketBatcher",
    "Batch",
    "pad_to_bucket",
]
