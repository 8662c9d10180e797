"""Config system: typed dataclasses + YAML ingestion.

Reads the reference's section-per-component YAML shape directly
(/root/reference/configs/quartznet12x1_vi.yaml — sections
`AudioToTextDataLayer`, `AudioToMelSpectrogramPreprocessor`,
`SpectrogramAugmentation`, `JasperEncoder`, `labels`), so existing configs
work unchanged, while exposing plain dataclasses to the rest of the library.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import yaml

from vietasr_tpu.frontend.features import FeaturizerConfig


@dataclasses.dataclass(frozen=True)
class BlockConfig:
    """One encoder block (reference JasperBlock kwargs,
    nemo/collections/asr/parts/jasper.py:175-198)."""

    filters: int
    repeat: int = 1
    kernel: int = 11
    stride: int = 1
    dilation: int = 1
    dropout: float = 0.0
    residual: bool = True
    residual_dense: bool = False
    separable: bool = False
    groups: int = 1
    heads: int = -1
    se: bool = False
    se_reduction_ratio: int = 16
    kernel_size_factor: float = 1.0

    @classmethod
    def from_dict(cls, d: dict) -> "BlockConfig":
        d = dict(d)
        for key in ("kernel", "stride", "dilation"):
            v = d.get(key)
            if isinstance(v, (list, tuple)):
                d[key] = v[0]
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    @property
    def effective_kernel(self) -> int:
        """kernel_size_factor rescaling, rounded up to odd
        (reference compute_new_kernel_size, parts/jasper.py:52-57)."""
        k = max(int(self.kernel * float(self.kernel_size_factor)), 1)
        return k + 1 if k % 2 == 0 else k

    @property
    def same_padding(self) -> int:
        """'same' padding (reference get_same_padding, parts/jasper.py:60-65)."""
        if self.stride > 1 and self.dilation > 1:
            raise ValueError("only stride OR dilation may exceed 1")
        if self.dilation > 1:
            return (self.dilation * self.effective_kernel) // 2 - 1
        return self.effective_kernel // 2


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """Reference JasperEncoder kwargs (nemo/collections/asr/jasper.py:136-147)."""

    blocks: Sequence[BlockConfig]
    feat_in: int = 64
    activation: str = "relu"
    conv_mask: bool = True
    frame_splicing: int = 1
    residual_mode: str = "add"
    normalization_mode: str = "batch"
    init_mode: str = "xavier_uniform"


@dataclasses.dataclass(frozen=True)
class ConformerConfig:
    """Conformer encoder (models/conformer.py; YAML section
    `ConformerEncoder`)."""

    num_blocks: int = 16
    d_model: int = 176
    num_heads: int = 4
    ff_expansion: int = 4
    conv_kernel: int = 31
    dropout: float = 0.1
    subsampling_factor: int = 4       # conv2d subsampling, stride 2 per stage
    subsampling_channels: int = 176
    # "conv2d": two k3 s2 conv stages (the classic Conformer frontend);
    # "stack": frame stacking — reshape (B, T, F) -> (B, T/4, 4F) into the
    # d_model projection. Exact-capacity TPU alternative: the conv2d
    # stage-2 (3x3 x C^2 dense conv) runs at ~25% MXU efficiency and
    # dominates the subsample cost, while stacking is one tile-aligned
    # matmul with ~460x fewer FLOPs; it is also trivially causal, so
    # streaming needs no subsample carry.
    subsampling_mode: str = "conv2d"
    # streaming (chunked-causal) mode, WeNet/U2-style: 0 = full-context
    # offline attention; > 0 = queries see their own chunk plus
    # `left_chunks` previous chunks (frames AFTER subsampling), depthwise
    # conv and conv2d subsampling become left-padded (causal), enabling
    # the exact stateful stream in streaming_conformer.py
    chunk_size: int = 0
    left_chunks: int = 1
    # lax.scan over the (homogeneous) block stack instead of a Python
    # unroll. Identical math (test_conformer asserts bit-compat), O(1)
    # compiled-graph size and much faster compiles — but MEASURED 1.47x
    # slower per train step on v5e (72.7 vs 49.4 ms at B=32x15 s): the
    # dynamic op count is unchanged and the scan adds per-iteration
    # slicing of the stacked params plus grad accumulation via
    # dynamic-update-slice. Use for compile-time- or HLO-size-bound
    # configs (e.g. very deep encoders); the default unrolls.
    scan_blocks: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "ConformerConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclasses.dataclass(frozen=True)
class SpecAugmentConfig:
    """Reference SpectrogramAugmentation kwargs
    (nemo/collections/asr/audio_preprocessing.py:522-608)."""

    freq_masks: int = 0
    time_masks: int = 0
    freq_width: int = 10
    time_width: int = 10
    rect_masks: int = 0
    rect_time: int = 5
    rect_freq: int = 20

    @classmethod
    def from_dict(cls, d: dict) -> "SpecAugmentConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Reference AudioToTextDataLayer kwargs we honor (data_layer.py:42-117)."""

    sample_rate: int = 16000
    max_duration: Optional[float] = 16.7
    min_duration: Optional[float] = 0.1
    trim_silence: bool = False
    normalize_transcripts: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "DataConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    name: str
    labels: List[str]
    featurizer: FeaturizerConfig
    encoder: EncoderConfig
    spec_augment: SpecAugmentConfig
    data: DataConfig
    architecture: str = "quartznet"            # "quartznet" | "conformer"
    conformer: Optional[ConformerConfig] = None

    @property
    def num_classes(self) -> int:
        """Vocabulary size without the CTC blank (blank id == num_classes,
        reference jasper.py:247, losses.py:46-47)."""
        return len(self.labels)


def load_config(path: str) -> ModelConfig:
    """Load a model config from NeMo-style sectioned YAML."""
    with open(path, "r", encoding="utf-8") as f:
        raw = yaml.safe_load(f)
    return config_from_dict(raw)


def config_to_dict(cfg: ModelConfig) -> dict:
    """Emit the NeMo-shaped sectioned dict for this config — the export
    half of the module-config round-trip (reference export_to_config /
    import_from_config, nemo/core/neural_modules.py:233-366).

    Invariant: config_from_dict(config_to_dict(cfg)) == cfg.
    """
    raw = {
        "model": cfg.name,
        "AudioToTextDataLayer": dataclasses.asdict(cfg.data),
        "AudioToMelSpectrogramPreprocessor":
            dataclasses.asdict(cfg.featurizer),
        "SpectrogramAugmentation": dataclasses.asdict(cfg.spec_augment),
        "JasperEncoder": {
            "activation": cfg.encoder.activation,
            "conv_mask": cfg.encoder.conv_mask,
            "residual_mode": cfg.encoder.residual_mode,
            "normalization_mode": cfg.encoder.normalization_mode,
            "init_mode": cfg.encoder.init_mode,
            "jasper": [dataclasses.asdict(b) for b in cfg.encoder.blocks],
        },
        "labels": list(cfg.labels),
    }
    if cfg.conformer is not None:
        raw["ConformerEncoder"] = dataclasses.asdict(cfg.conformer)
    return raw


def save_config(cfg: ModelConfig, path: str) -> None:
    """Write the config back to reference-compatible YAML."""
    with open(path, "w", encoding="utf-8") as f:
        yaml.safe_dump(config_to_dict(cfg), f, allow_unicode=True,
                       sort_keys=False)


def config_from_dict(raw: dict) -> ModelConfig:
    feat_cfg = FeaturizerConfig.from_dict(
        raw.get("AudioToMelSpectrogramPreprocessor", {})
    )
    enc_raw = raw.get("JasperEncoder", {})
    blocks = tuple(BlockConfig.from_dict(b) for b in enc_raw.get("jasper", []))
    enc_cfg = EncoderConfig(
        blocks=blocks,
        feat_in=feat_cfg.features * feat_cfg.frame_splicing,
        activation=enc_raw.get("activation", "relu"),
        conv_mask=enc_raw.get("conv_mask", True),
        frame_splicing=feat_cfg.frame_splicing,
        residual_mode=enc_raw.get("residual_mode", "add"),
        normalization_mode=enc_raw.get("normalization_mode", "batch"),
        init_mode=enc_raw.get("init_mode", "xavier_uniform"),
    )
    conformer = None
    architecture = "quartznet"
    if "ConformerEncoder" in raw:
        conformer = ConformerConfig.from_dict(raw["ConformerEncoder"])
        architecture = "conformer"
    return ModelConfig(
        name=raw.get("model", "model"),
        labels=list(raw.get("labels", [])),
        featurizer=feat_cfg,
        encoder=enc_cfg,
        spec_augment=SpecAugmentConfig.from_dict(
            raw.get("SpectrogramAugmentation", {})
        ),
        data=DataConfig.from_dict(raw.get("AudioToTextDataLayer", {})),
        architecture=architecture,
        conformer=conformer,
    )
