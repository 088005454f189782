"""Configuration system.

Drop-in compatible with the reference JSON schema (reference: configs/config.json,
utils.py:181-310 — the recursive ``HParams`` object): a single JSON file with
``train`` / ``data`` / ``model`` sections.  Here each section is a typed frozen
dataclass so configs are hashable pytree leaves usable as jit static arguments.

Unknown keys are preserved in ``extra`` so user configs with additional fields
round-trip losslessly.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Mapping, Optional, Tuple


def _freeze(value):
    """Recursively convert lists→tuples and dicts→sorted tuples for hashability."""
    if isinstance(value, list):
        return tuple(_freeze(v) for v in value)
    if isinstance(value, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in value.items()))
    return value


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference: configs/config.json ``train`` section)."""

    log_interval: int = 100
    eval_interval: int = 1000
    seed: int = 1234
    epochs: int = 10000
    learning_rate: float = 1e-4
    betas: Tuple[float, float] = (0.8, 0.99)
    eps: float = 1e-9
    batch_size: int = 12
    # Mixed precision.  The reference autocasts its whole step to fp16 with
    # a GradScaler (train.py:124,168,207); on TPU the analogue is bf16.
    # Round 4 root-caused the earlier bf16 GAN collapse (the bf16-quantized
    # output waveform hands the discriminator a trivial real/fake separator
    # — benchmarks/artifacts/bf16_diag/ANALYSIS.md) and shipped a CONVERGING
    # policy: bf16_scope="tail_f32" (+ optional bf16_disc), flagship overfit
    # mel ×0.154-0.157 (= f32) at 10.5-11.4 steps/s vs 10.1 f32 (B=12×1024,
    # v5e, shipped kernels).  Default remains False until bf16 convergence
    # is also demonstrated at production shape through the Trainer
    # (fp32 e2e evidence: benchmarks/artifacts/trainer_e2e.json); enable
    # with fp16_run=true for the measured-fastest converging configuration.
    fp16_run: bool = False
    # bf16 cast scope when fp16_run is enabled:
    # "tail_f32" (default) = everything in bf16 EXCEPT the decoder's final
    #   conv_post+tanh (and the discriminators) — the measured converging
    #   policy: round-4 stage-localization runs showed the GAN collapse
    #   enters through the bf16-quantized output waveform (decoder-only
    #   bf16 collapses @770; with the f32 tail the full bf16 generator
    #   converges at flagship, mel ×0.156 over 4000 steps —
    #   benchmarks/artifacts/bf16_diag/stage_matrix*.json);
    # "stable" = encoder-side only (decoder + discriminators f32; round-3
    #   scope — collapses slowly, kept for A/B);
    # "full" = everything, the reference autocast scope (collapses fast).
    # The legacy whole-graph scopes REPRODUCE the GAN collapse
    # (BENCH_TRAIN_r04.bf16_root_cause) and exist only for diagnostics /
    # A/B reproduction: selecting them raises unless
    # bf16_allow_divergent=true explicitly acknowledges that.
    bf16_scope: str = "tail_f32"
    # Opt-in acknowledgment required to run the known-diverging legacy
    # whole-graph bf16 scopes ("stable"/"full").  Without it they fail
    # loudly at step construction instead of silently collapsing @120-770.
    bf16_allow_divergent: bool = False
    # Diagnostic cast granularity: when non-empty (and fp16_run), cast ONLY
    # these top-level generator modules to bf16 and keep everything else
    # (incl. discriminators) f32 — used to localize which stage triggers the
    # bf16 GAN collapse (benchmarks/bench_bf16_diag.py).  Overrides
    # bf16_scope's keep-list.
    bf16_only: Tuple[str, ...] = ()

    # Run the discriminators in bf16 (with fp16_run). Mechanism-1 of the
    # bf16 collapse (benchmarks/artifacts/bf16_diag/ANALYSIS.md) was the
    # ASYMMETRY of a quantized fake vs continuous real waveform; a bf16 D
    # quantizes both inputs identically at its first conv, so this composes
    # with tail_f32.  Round-5 evidence: converges (mel ×0.44 @1500 steps,
    # convergence_bf16_disc.json) and is the fastest measured training
    # configuration — 11.82 steps/s vs 10.02 f32 at flagship shape
    # (benchmarks/artifacts/bf16_payoff_analysis.md).  Recommended with
    # fp16_run; kept opt-in so fp16_run alone stays the exact round-4
    # validated policy.
    bf16_disc: bool = False

    def effective_bf16_stages(self) -> Tuple[str, ...]:
        """Stage-cast set the precision policy resolves to (Synthesizer
        bf16_stages + train-step param casts); empty = whole-graph scopes
        ("stable"/"full" legacy behavior).  Unknown scopes raise — a typo
        must not silently degrade to the known-collapsing legacy cast."""
        if not self.fp16_run:
            return ()
        if self.bf16_only:
            return tuple(self.bf16_only)
        if self.bf16_scope == "tail_f32":
            return ("enc_p", "heads", "fpn", "project", "enc_q", "flow",
                    "dec_body")
        if self.bf16_scope not in ("stable", "full"):
            raise ValueError(
                f"unknown bf16_scope {self.bf16_scope!r} "
                "(expected 'tail_f32', 'stable', or 'full')")
        if not self.bf16_allow_divergent:
            raise ValueError(
                f"bf16_scope={self.bf16_scope!r} is a legacy whole-graph "
                "cast KNOWN to collapse GAN training (round-4 stage "
                "localization, benchmarks/artifacts/bf16_diag/ANALYSIS.md; "
                "collapse onset @120-770 steps). Use the converging default "
                "bf16_scope='tail_f32', or set bf16_allow_divergent=true to "
                "run it anyway for diagnostics/A-B reproduction.")
        return ()
    lr_decay: float = 0.999875
    segment_size: int = 16384
    init_lr_ratio: float = 1.0
    warmup_epochs: int = 0
    c_mel: float = 45.0
    c_kl: float = 1.0
    save_dir: str = "./logdir/vispeech"
    # differentiable fused WN stack (Pallas custom VJP) in the posterior
    # encoder + flow couplings during training (ops/pallas/wn_stack_train.py);
    # measured 8.45 vs 8.09 steps/s stacked on the other kernels, and the
    # full stack's flagship overfit converges
    # (benchmarks/artifacts/convergence_fp32_allfused.json: mel ×0.51)
    fused_wn: bool = True
    # trainable fused rel-pos attention (Pallas custom VJP + in-kernel
    # dropout) in the phoneme/frame encoders during training
    # (ops/pallas/flash_attention_train.py) — the measured top train stage
    fused_attn: bool = True
    # differentiable polyphase-folded MRF (ops/folded_mrf.py, pure XLA) for
    # the decoder's narrow C<=64 stages during training — exact-math
    # equivalent to the ResBlock path (gradients pinned,
    # tests/test_models.py::TestFoldedMRFTraining); measured 8.09 vs 7.48
    # steps/s at B=12×1024 on v5e
    folded_mrf: bool = True
    # TPU-first input pipeline: ship int16 waveforms only and compute the
    # linear spectrogram ON DEVICE inside the train step (matmul-DFT on the
    # MXU, ~ms) instead of loading host-computed .spec caches — ~6× less
    # host→device traffic per batch (spec [T,1025] f32 dominates) and no
    # host DFT/cache IO at all.  The reference computes spectrograms in its
    # dataloader workers and caches them beside the wavs
    # (reference data_utils.py:113-124, mel_processing.py:51) — a
    # CPU+PCIe-era design; on TPU compute is cheaper than bandwidth.
    device_dsp: bool = True


@dataclass(frozen=True)
class DataConfig:
    """Data/DSP hyperparameters (reference: configs/config.json ``data`` section)."""

    training_files: str = "filelists/train.list"
    validation_files: str = "filelists/val.list"
    max_wav_value: float = 32768.0
    sampling_rate: int = 44100
    filter_length: int = 2048
    hop_length: int = 512
    win_length: int = 2048
    n_mel_channels: int = 80
    mel_fmin: float = 0.0
    mel_fmax: Optional[float] = None
    add_blank: bool = True
    n_speakers: int = 200
    cleaned_text: bool = True
    spk2id: Tuple[Tuple[str, int], ...] = ()

    @property
    def spec_channels(self) -> int:
        return self.filter_length // 2 + 1

    def speaker_id(self, name: str) -> int:
        for k, v in self.spk2id:
            if k == name:
                return v
        raise KeyError(f"unknown speaker {name!r}")


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters (reference: configs/config.json ``model`` section)."""

    inter_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 4
    kernel_size: int = 3
    p_dropout: float = 0.1
    resblock: str = "1"
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_rates: Tuple[int, ...] = (8, 8, 4, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    n_layers_q: int = 3
    use_spectral_norm: bool = False
    gin_channels: int = 256
    f0_mean: float = 171.21
    f0_std: float = 128.9
    freeze_textencoder: bool = False
    freeze_decoder: bool = False
    use_sdp: bool = False  # stochastic duration predictor (API parity; off by default
    #                        as in the reference, models.py:558)


@dataclass(frozen=True)
class Config:
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    extra: Tuple[Tuple[str, Any], ...] = ()

    def to_dict(self) -> Dict[str, Any]:
        def unfreeze(v):
            if isinstance(v, tuple):
                if v and all(isinstance(e, tuple) and len(e) == 2 and isinstance(e[0], str) for e in v):
                    return {k: unfreeze(x) for k, x in v}
                return [unfreeze(e) for e in v]
            return v

        out = {}
        for section in ("train", "data", "model"):
            cfg = getattr(self, section)
            out[section] = {f.name: unfreeze(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)}
        for k, v in self.extra:
            out[k] = unfreeze(v)
        return out


def _build_section(cls, raw: Mapping[str, Any]):
    known = {f.name for f in dataclasses.fields(cls)}
    kwargs = {k: _freeze(v) for k, v in raw.items() if k in known}
    return cls(**kwargs)


def load_config(path: str) -> Config:
    """Load a reference-format JSON config file."""
    with open(path, "r", encoding="utf-8") as f:
        raw = json.load(f)
    return config_from_dict(raw)


def config_from_dict(raw: Mapping[str, Any]) -> Config:
    extra = tuple(sorted((k, _freeze(v)) for k, v in raw.items()
                         if k not in ("train", "data", "model")))
    return Config(
        train=_build_section(TrainConfig, raw.get("train", {})),
        data=_build_section(DataConfig, raw.get("data", {})),
        model=_build_section(ModelConfig, raw.get("model", {})),
        extra=extra,
    )


def save_config(cfg: Config, path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        json.dump(cfg.to_dict(), f, ensure_ascii=False, indent=2)
