"""The Synthesizer — VITS/FastSpeech2/VISinger hybrid composition root.

Mirrors the reference SynthesizerTrn (models.py:532-732):
  TextEncoder → {duration, pitch, energy} heads (+ teacher-forced prenets) →
  vectorized LengthRegulator → FramePriorNet → Projection → flow ↔
  PosteriorEncoder → random-segment HiFi-GAN decode.

Reference quirks reproduced deliberately:
  * LF0 = 2595·log10(1+f0/700)/500 but the inverse uses 2590
    (models.py:642 vs 646,698 — asymmetric constant kept for parity)
  * energy normalized (e−60)/36 (models.py:649)
  * pitch predictor input is stop-gradient; energy predictor input is NOT
    (only its speaker embedding is) — frame_prior_network.py:119-121
  * duration loss = Σ(logw−log(d+1))² / Σmask (models.py:635-639)
  * pitch/energy losses are unmasked means over the padded batch
    (models.py:644,651)

TPU-first departures:
  * [B, T, C] layout; the length regulator is a device-side path matmul
    (no host sync — the reference's worst bottleneck, models.py:390-432)
  * frame count is the static padded bucket size; everything is masked
  * sampling/dropout RNG via flax rng collections ('sample', 'dropout')
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vispeech_tpu.config import Config
from vispeech_tpu.models.generator import Generator
from vispeech_tpu.models.predictors import (
    DurationPredictor,
    EnergyPredictor,
    PitchPredictor,
    StochasticDurationPredictor,
)
from vispeech_tpu.ops.attention import Encoder
from vispeech_tpu.ops.flows import ResidualCouplingLayer, Flip
from vispeech_tpu.ops.layers import Conv1d, normal_init
from vispeech_tpu.ops.length_regulator import length_regulate
from vispeech_tpu.ops.masking import length_mask, rand_slice_segments
from vispeech_tpu.ops.policy import ServingPolicy, default_serving_policy
from vispeech_tpu.ops.wavenet import WN

Array = jax.Array


def f0_to_lf0(f0: Array) -> Array:
    """Normalized log-F0 (reference models.py:642)."""
    return (2595.0 * jnp.log10(1.0 + f0 / 700.0)) / 500.0


def lf0_to_f0(lf0: Array) -> Array:
    """Inverse with the reference's asymmetric 2590 constant (models.py:646,698)."""
    return (jnp.power(10.0, lf0 * 500.0 / 2590.0) - 1.0) * 700.0


def normalize_energy(e: Array) -> Array:
    return (e - 60.0) / 36.0


def denormalize_energy(ne: Array) -> Array:
    return ne * 36.0 + 60.0


class TextEncoder(nn.Module):
    """Phoneme embedding (×√h) + rel-pos transformer (models.py:136-174)."""

    n_vocab: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    use_pallas: Optional[bool] = None  # attention kernel policy (ops/policy.py)
    use_pallas_train: bool = False     # trainable fused attention (custom VJP)

    @nn.compact
    def __call__(self, phonemes: Array, lengths: Array, deterministic: bool = True):
        emb = nn.Embed(
            self.n_vocab,
            self.hidden_channels,
            embedding_init=normal_init(self.hidden_channels**-0.5),
            name="symbol_emb",
        )
        x = emb(phonemes) * jnp.sqrt(float(self.hidden_channels))  # [B, N, H]
        x_mask = length_mask(lengths, phonemes.shape[1], x.dtype)
        x = Encoder(
            self.hidden_channels,
            self.filter_channels,
            self.n_heads,
            self.n_layers,
            self.kernel_size,
            self.p_dropout,
            use_pallas=self.use_pallas,
            use_pallas_train=self.use_pallas_train,
            name="encoder",
        )(x * x_mask, x_mask, deterministic=deterministic)
        return x, x_mask


class PosteriorEncoder(nn.Module):
    """Linear-spec → latent posterior, 16-layer WN (models.py:212-241)."""

    out_channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 16
    gin_channels: int = 0
    trainable_fused_wn: bool = False

    @nn.compact
    def __call__(
        self,
        spec: Array,
        lengths: Array,
        g: Optional[Array] = None,
        deterministic: bool = True,
    ):
        x_mask = length_mask(lengths, spec.shape[1], spec.dtype)
        x = Conv1d(self.hidden_channels, 1, name="pre")(spec) * x_mask
        x = WN(
            self.hidden_channels,
            self.kernel_size,
            self.dilation_rate,
            self.n_layers,
            gin_channels=self.gin_channels,
            trainable_fused=self.trainable_fused_wn,
            name="enc",
        )(x, x_mask, g=g, deterministic=deterministic)
        stats = Conv1d(2 * self.out_channels, 1, name="proj")(x) * x_mask
        m, logs = stats[..., : self.out_channels], stats[..., self.out_channels :]
        eps = jax.random.normal(self.make_rng("sample"), m.shape, m.dtype)
        z = (m + eps * jnp.exp(logs)) * x_mask
        return z, m, logs, x_mask


class ResidualCouplingBlock(nn.Module):
    """4×(mean-only coupling + flip) prior flow (models.py:177-209)."""

    channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 4
    n_flows: int = 4
    gin_channels: int = 0
    trainable_fused_wn: bool = False

    def setup(self):
        self.couplings = [
            ResidualCouplingLayer(
                self.channels,
                self.hidden_channels,
                self.kernel_size,
                self.dilation_rate,
                self.n_layers,
                gin_channels=self.gin_channels,
                mean_only=True,
                trainable_fused_wn=self.trainable_fused_wn,
            )
            for _ in range(self.n_flows)
        ]
        self.flips = [Flip() for _ in range(self.n_flows)]

    def __call__(self, x, x_mask, g=None, reverse=False, deterministic=True):
        if not reverse:
            for coupling, flip in zip(self.couplings, self.flips):
                x, _ = coupling(x, x_mask, g=g, deterministic=deterministic)
                x, _ = flip(x, x_mask)
        else:
            for coupling, flip in zip(reversed(self.couplings), reversed(self.flips)):
                x = flip(x, x_mask, reverse=True)
                x = coupling(x, x_mask, g=g, reverse=True, deterministic=deterministic)
        return x


class FramePriorNet(nn.Module):
    """Frame-level rel-pos transformer (models.py:435-470; the reference's
    dead Embedding(121,h) is not reproduced)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    use_pallas: Optional[bool] = None  # attention kernel policy (ops/policy.py)
    use_pallas_train: bool = False     # trainable fused attention (custom VJP)

    @nn.compact
    def __call__(self, x_frame, x_mask, deterministic: bool = True):
        return Encoder(
            self.hidden_channels,
            self.filter_channels,
            self.n_heads,
            self.n_layers,
            self.kernel_size,
            self.p_dropout,
            use_pallas=self.use_pallas,
            use_pallas_train=self.use_pallas_train,
            name="fft_block",
        )(x_frame * x_mask, x_mask, deterministic=deterministic)


class Projection(nn.Module):
    """1×1 conv → prior stats split (models.py:517-529)."""

    out_channels: int

    @nn.compact
    def __call__(self, x, x_mask):
        stats = Conv1d(2 * self.out_channels, 1, name="proj")(x) * x_mask
        return stats[..., : self.out_channels], stats[..., self.out_channels :]


class Synthesizer(nn.Module):
    """Generator network (training forward / infer / voice conversion)."""

    n_vocab: int
    spec_channels: int
    segment_size: int  # in frames
    inter_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 4
    kernel_size: int = 3
    p_dropout: float = 0.1
    resblock: str = "1"
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    upsample_rates: Tuple[int, ...] = (8, 8, 4, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    n_speakers: int = 0
    gin_channels: int = 0
    use_sdp: bool = False
    # Serving policy (ops/policy.py) — explicit, jit-static, testable on any
    # backend.  Defaults are the training/parity configuration: float32,
    # pure-XLA (differentiable) everywhere.
    decode_dtype: str = "float32"      # "float32" | "bfloat16"
    fused_decode: bool = False         # Pallas/folded MRF stages (infer-only)
    attn_pallas: Optional[bool] = None  # None=auto, True/False=force
    # Training policy: differentiable fused WN stack (custom VJP) in the
    # posterior encoder + flow couplings (cfg.train.fused_wn)
    train_fused_wn: bool = False
    # Training policy: trainable fused attention (custom VJP + in-kernel
    # dropout) in the phoneme/frame rel-pos encoders (cfg.train.fused_attn)
    train_fused_attn: bool = False
    # Training policy: differentiable polyphase-folded MRF for the decoder's
    # narrow (C<=64) stages (cfg.train.folded_mrf)
    train_folded_mrf: bool = False
    # Diagnostic (cfg.train.bf16_only): stages whose training-forward compute
    # runs in bf16 — float inputs cast to bf16 at the stage boundary and
    # outputs cast back to f32, so precision effects are localized to ONE
    # stage (params are cast to match in train/step.py).  Stage names:
    # enc_p, heads, fpn, project, enc_q, flow, dec.
    bf16_stages: Tuple[str, ...] = ()

    @classmethod
    def from_config(
        cls,
        cfg: Config,
        n_vocab: int,
        policy: Optional["ServingPolicy"] = None,
    ) -> "Synthesizer":
        kw = {}
        if policy is not None:
            kw = dict(
                decode_dtype=policy.decode_dtype,
                fused_decode=policy.fused_decode,
                attn_pallas=policy.attn_pallas,
            )
        m = cfg.model
        return cls(
            **kw,
            n_vocab=n_vocab,
            spec_channels=cfg.data.spec_channels,
            segment_size=cfg.train.segment_size // cfg.data.hop_length,
            inter_channels=m.inter_channels,
            hidden_channels=m.hidden_channels,
            filter_channels=m.filter_channels,
            n_heads=m.n_heads,
            n_layers=m.n_layers,
            kernel_size=m.kernel_size,
            p_dropout=m.p_dropout,
            resblock=m.resblock,
            resblock_kernel_sizes=m.resblock_kernel_sizes,
            resblock_dilation_sizes=m.resblock_dilation_sizes,
            upsample_rates=m.upsample_rates,
            upsample_initial_channel=m.upsample_initial_channel,
            upsample_kernel_sizes=m.upsample_kernel_sizes,
            n_speakers=cfg.data.n_speakers,
            gin_channels=m.gin_channels,
            use_sdp=m.use_sdp,
            train_fused_wn=cfg.train.fused_wn,
            train_fused_attn=cfg.train.fused_attn,
            train_folded_mrf=cfg.train.folded_mrf,
            bf16_stages=cfg.train.effective_bf16_stages(),
        )

    @classmethod
    def for_serving(cls, cfg: Config, n_vocab: int) -> "Synthesizer":
        """Construct with the measured-fastest policy for the current backend
        (bf16 + fused kernels on TPU; float32/XLA elsewhere) — resolved once
        on the host, never inside traced code."""
        return cls.from_config(cfg, n_vocab, policy=default_serving_policy())

    def setup(self):
        self.enc_p = TextEncoder(
            self.n_vocab, self.hidden_channels, self.filter_channels,
            self.n_heads, self.n_layers, self.kernel_size, self.p_dropout,
            use_pallas=self.attn_pallas,
            use_pallas_train=self.train_fused_attn,
        )
        self.dec = Generator(
            self.resblock, self.resblock_kernel_sizes, self.resblock_dilation_sizes,
            self.upsample_rates, self.upsample_initial_channel,
            self.upsample_kernel_sizes, gin_channels=self.gin_channels,
            folded_narrow=self.train_folded_mrf,
        )
        self.enc_q = PosteriorEncoder(
            self.inter_channels, self.hidden_channels, 5, 1, 16,
            gin_channels=self.gin_channels,
            trainable_fused_wn=self.train_fused_wn,
        )
        self.flow = ResidualCouplingBlock(
            self.inter_channels, self.hidden_channels, 5, 1, 4,
            gin_channels=self.gin_channels,
            trainable_fused_wn=self.train_fused_wn,
        )
        if self.use_sdp:
            self.sdp = StochasticDurationPredictor(
                self.hidden_channels, 192, 3, 0.5, 4, gin_channels=self.gin_channels
            )
        self.duration_predictor = DurationPredictor(
            256, 3, 0.5, gin_channels=self.gin_channels
        )
        self.frame_prior_net = FramePriorNet(
            self.hidden_channels, self.filter_channels, self.n_heads,
            self.n_layers, self.kernel_size, self.p_dropout,
            use_pallas=self.attn_pallas,
            use_pallas_train=self.train_fused_attn,
        )
        self.pitch_predictor = PitchPredictor(
            self.hidden_channels, self.filter_channels, self.n_heads,
            self.kernel_size, self.p_dropout, gin_channels=self.gin_channels,
            use_pallas=self.attn_pallas,
            use_pallas_train=self.train_fused_attn,
        )
        self.energy_predictor = EnergyPredictor(
            self.hidden_channels, gin_channels=self.gin_channels
        )
        self.project = Projection(self.inter_channels)
        self.pitch_prenet = Conv1d(self.hidden_channels, 3, padding=1)
        self.energy_prenet = Conv1d(self.hidden_channels, 3, padding=1)
        if self.n_speakers > 1:
            self.emb_g = nn.Embed(self.n_speakers, self.gin_channels)

    def _speaker(self, sid: Optional[Array]) -> Optional[Array]:
        if self.n_speakers > 1 and sid is not None:
            return self.emb_g(sid)[:, None, :]  # [B, 1, G]
        return None

    def _stage(self, name: str, fn, *args, **kw):
        """Precision-localization boundary (see bf16_stages): when `name`
        is selected, run `fn` with float array args cast to bf16 and cast
        its float outputs back to f32; otherwise call through unchanged."""
        if name not in self.bf16_stages:
            return fn(*args, **kw)

        def cast(tree, dt):
            return jax.tree.map(
                lambda a: a.astype(dt)
                if isinstance(a, jnp.ndarray)
                and jnp.issubdtype(a.dtype, jnp.floating) else a,
                tree,
            )

        out = fn(*cast(args, jnp.bfloat16), **cast(kw, jnp.bfloat16))
        return cast(out, jnp.float32)

    def __call__(
        self,
        phonemes: Array,          # [B, N] int
        phoneme_lengths: Array,   # [B]
        f0: Array,                # [B, N] Hz, phoneme-level
        energy: Array,            # [B, N]
        duration: Array,          # [B, N] frames
        spec: Array,              # [B, T, spec_channels]
        spec_lengths: Array,      # [B]
        sid: Optional[Array] = None,
        deterministic: bool = False,
    ):
        """Training forward (reference models.py:624-670)."""
        g = self._speaker(sid)
        x, x_mask = self._stage(
            "enc_p", self.enc_p, phonemes, phoneme_lengths,
            deterministic=deterministic,
        )

        # duration loss on log(d+1)
        logw_ = jnp.log(duration.astype(jnp.float32) + 1.0)[..., None] * x_mask
        logw = self._stage(
            "heads", self.duration_predictor, x, x_mask, g=g,
            deterministic=deterministic,
        )
        l_length = jnp.sum(jnp.square(logw - logw_)) / jnp.sum(x_mask)

        # pitch: teacher-forced GT injected through the prenet
        lf0 = f0_to_lf0(f0)
        pred_lf0 = self._stage(
            "heads", self.pitch_predictor, x, x_mask, g=g,
            deterministic=deterministic,
        )
        l_pitch = jnp.mean(jnp.square(lf0 - pred_lf0))
        x = x + self._stage("heads", self.pitch_prenet, lf0[..., None])
        pred_f0 = lf0_to_f0(pred_lf0)

        # energy
        norm_energy = normalize_energy(energy)
        pred_norm_energy = self._stage(
            "heads", self.energy_predictor, x, g=g, deterministic=deterministic
        )
        l_energy = jnp.mean(jnp.square(norm_energy - pred_norm_energy))
        x = x + self._stage("heads", self.energy_prenet, norm_energy[..., None])

        # phoneme → frame expansion (static frame count = padded spec length)
        t_frames = spec.shape[1]
        x_frame, frame_lengths = length_regulate(x, duration, t_frames)
        frame_mask = length_mask(frame_lengths, t_frames, x.dtype)

        x_frame = self._stage(
            "fpn", self.frame_prior_net, x_frame, frame_mask,
            deterministic=deterministic,
        )
        m_p, logs_p = self._stage("project", self.project, x_frame, frame_mask)

        z, m_q, logs_q, y_mask = self._stage(
            "enc_q", self.enc_q, spec, spec_lengths, g=g,
            deterministic=deterministic,
        )
        z_p = self._stage(
            "flow", self.flow, z, y_mask, g=g, deterministic=deterministic
        )

        z_slice, ids_slice = rand_slice_segments(
            z, spec_lengths, self.segment_size, self.make_rng("sample")
        )
        if "dec_body" in self.bf16_stages:
            o = self._stage(
                "dec_body", partial(self.dec, tail_f32=True), z_slice, g=g
            )
        else:
            o = self._stage("dec", self.dec, z_slice, g=g)
        return (
            o, l_length, l_pitch, l_energy, ids_slice, frame_mask, y_mask,
            (z, z_p, m_p, logs_p, m_q, logs_q),
            pred_f0, pred_norm_energy, norm_energy,
        )

    def infer(
        self,
        phonemes: Array,
        phoneme_lengths: Array,
        t_frames: int,
        sid: Optional[Array] = None,
        noise_scale: float = 1.0,
        max_len: Optional[int] = None,
        energy_control=None,    # None | float | [B, N] array (absolute energy)
        pitch_control=None,     # None | float | [B, N] array (Hz)
        duration_control=None,  # None | float | [B, N] array (frames)
        eps: Optional[Array] = None,  # [B, T, inter] prior noise (None: rng)
        deterministic: bool = True,
    ):
        """Inference with per-phoneme prosody overrides (models.py:672-722).

        Scalar controls multiply predictions; array controls replace them —
        the GUI prosody-editing contract (gui.py:82-113).  `t_frames` is the
        static frame budget (padded bucket); frames beyond the realized
        duration are masked.  Composition of the two pipeline stages
        ``infer_prior`` → ``infer_decode`` (parallel/pipeline.py splits them
        across a 'stage' mesh axis).
        """
        z_p, frame_mask, duration, f0, energy, (m_p, logs_p) = self.infer_prior(
            phonemes, phoneme_lengths, t_frames, sid=sid,
            noise_scale=noise_scale, energy_control=energy_control,
            pitch_control=pitch_control, duration_control=duration_control,
            eps=eps, deterministic=deterministic,
        )
        o, z, frame_mask = self.infer_decode(
            z_p, frame_mask, sid=sid, max_len=max_len,
            deterministic=deterministic,
        )
        return o, frame_mask, (z, z_p, m_p, logs_p), duration, f0, energy

    def infer_prior(
        self,
        phonemes: Array,
        phoneme_lengths: Array,
        t_frames: int,
        sid: Optional[Array] = None,
        noise_scale: float = 1.0,
        energy_control=None,
        pitch_control=None,
        duration_control=None,
        eps: Optional[Array] = None,
        deterministic: bool = True,
    ):
        """Pipeline stage 1: text → sampled prior latent z_p.

        Text encoder → variance adapter (duration/pitch/energy with the
        prosody-override contract) → length regulation → FramePriorNet →
        projection → z_p = m_p + eps·exp(logs_p)·noise_scale.  `eps` injects
        the prior noise explicitly (pipeline microbatching / reproducibility);
        None draws from the 'sample' rng stream.
        Returns (z_p, frame_mask, duration, f0_Hz, energy).
        """
        g = self._speaker(sid)
        x, x_mask = self.enc_p(phonemes, phoneme_lengths, deterministic=deterministic)

        if isinstance(duration_control, (jnp.ndarray, jax.Array)) and getattr(
            duration_control, "ndim", 0
        ) >= 1:
            duration = duration_control
        else:
            scale = 1.0 if duration_control is None else duration_control
            if self.use_sdp:
                logw = self.sdp(
                    x, x_mask, g=g, reverse=True, noise_scale=noise_scale,
                    deterministic=deterministic,
                )
            else:
                logw = self.duration_predictor(
                    x, x_mask, g=g, deterministic=deterministic
                )
            w = (jnp.exp(logw) * x_mask - 1.0) * scale
            duration = jnp.ceil(w)[..., 0]

        if isinstance(pitch_control, (jnp.ndarray, jax.Array)) and getattr(
            pitch_control, "ndim", 0
        ) >= 1:
            lf0 = f0_to_lf0(pitch_control)
        else:
            scale = 1.0 if pitch_control is None else pitch_control
            lf0 = self.pitch_predictor(x, x_mask, g=g, deterministic=deterministic) * scale
        x = x + self.pitch_prenet(lf0[..., None])
        f0 = lf0_to_f0(lf0)

        if isinstance(energy_control, (jnp.ndarray, jax.Array)) and getattr(
            energy_control, "ndim", 0
        ) >= 1:
            norm_energy = normalize_energy(energy_control)
        else:
            scale = 1.0 if energy_control is None else energy_control
            pred = self.energy_predictor(x, g=g, deterministic=deterministic)
            norm_energy = normalize_energy(denormalize_energy(pred) * scale)
        x = x + self.energy_prenet(norm_energy[..., None])
        energy = denormalize_energy(norm_energy)

        x_frame, frame_lengths = length_regulate(x, duration, t_frames)
        frame_mask = length_mask(frame_lengths, t_frames, x.dtype)

        x_frame = self.frame_prior_net(x_frame, frame_mask, deterministic=deterministic)
        m_p, logs_p = self.project(x_frame, frame_mask)
        if eps is None:
            eps = jax.random.normal(self.make_rng("sample"), m_p.shape, m_p.dtype)
        z_p = m_p + eps * jnp.exp(logs_p) * noise_scale
        return z_p, frame_mask, duration, f0, energy, (m_p, logs_p)

    def infer_decode(
        self,
        z_p: Array,
        frame_mask: Array,
        sid: Optional[Array] = None,
        max_len: Optional[int] = None,
        deterministic: bool = True,
    ):
        """Pipeline stage 2: sampled prior → waveform.

        Flow reverse (4 couplings) → vocoder under the serving policy
        (`_decode`).  Returns (audio, z, frame_mask[, :max_len]).
        """
        g = self._speaker(sid)
        z = self.flow(z_p, frame_mask, g=g, reverse=True, deterministic=deterministic)
        z = z * frame_mask
        if max_len is not None:
            z = z[:, :max_len]
            frame_mask = frame_mask[:, :max_len]
        o = self._decode(z, g)
        return o, z, frame_mask

    def _decode(self, z: Array, g: Optional[Array]) -> Array:
        """Vocoder call under the explicit serving policy (ops/policy.py):
        ``decode_dtype`` sets the decoder activation dtype (the decoder is
        where nearly all inference FLOPs and activation memory live; conv
        kernels are cast to the activation dtype with f32 accumulation, the
        waveform is returned f32), ``fused_decode`` dispatches the MRF stages
        to the Pallas / polyphase-folded kernels."""
        dtype = jnp.dtype(self.decode_dtype)
        # folded=False: serving dispatch is governed solely by the serving
        # policy's `fused_decode` (which already routes C<64 stages through
        # the folded path); the train.folded_mrf flag must not leak here
        o = self.dec(
            z.astype(dtype),
            g=g.astype(dtype) if g is not None else None,
            fused=self.fused_decode,
            folded=False,
        )
        return o.astype(jnp.float32)

    def predict_durations(
        self,
        phonemes: Array,
        phoneme_lengths: Array,
        sid: Optional[Array] = None,
    ) -> Array:
        """Cheap duration-only pass → predicted frame counts [B, N]
        (serving uses this to pick the static frame bucket before the full
        infer program; reference computes this inline, models.py:681-688)."""
        g = self._speaker(sid)
        x, x_mask = self.enc_p(phonemes, phoneme_lengths, deterministic=True)
        logw = self.duration_predictor(x, x_mask, g=g, deterministic=True)
        w = (jnp.exp(logw) * x_mask - 1.0)
        return jnp.maximum(jnp.ceil(w), 0.0)[..., 0]

    def voice_conversion(
        self,
        spec: Array,
        spec_lengths: Array,
        sid_src: Array,
        sid_tgt: Array,
        deterministic: bool = True,
    ):
        """Flow-based any-to-any conversion (reference models.py:724-732)."""
        assert self.n_speakers > 1, "voice conversion requires speakers"
        g_src = self.emb_g(sid_src)[:, None, :]
        g_tgt = self.emb_g(sid_tgt)[:, None, :]
        z, m_q, logs_q, y_mask = self.enc_q(
            spec, spec_lengths, g=g_src, deterministic=deterministic
        )
        z_p = self.flow(z, y_mask, g=g_src, deterministic=deterministic)
        z_hat = self.flow(z_p, y_mask, g=g_tgt, reverse=True, deterministic=deterministic)
        o_hat = self._decode(z_hat * y_mask, g_tgt)
        return o_hat, y_mask, (z, z_p, z_hat)
