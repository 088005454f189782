"""Jittable GAN training step (reference train.py:139-266 redesigned for TPU).

One step = D update on the detached generator output, then G update against
the *updated* discriminator — the reference's exact ordering (train.py:195-225:
optim_d.step() happens before the second net_d call).  The generator forward
runs ONCE via ``jax.vjp``: its outputs feed the D update detached, and the
stored vjp closes the G gradient through the same forward — the reference's
retained-graph arrangement (torch runs one net_g forward and reuses the
stored graph for the G backward), reclaiming the ~1/3 of step FLOPs a second
traced forward would cost.

bf16 policy (``train.fp16_run`` + ``train.bf16_scope``): params and float
batch inputs are cast to bf16 inside the differentiated function — the
reference autocasts its whole G+D step to fp16 (train.py:124,168,207) —
while every loss is computed in float32 (the reference keeps loss math out
of autocast, train.py:197,209) and the mel of the generated slice is taken
from an f32 waveform.  Master params, optimizer state and gradients stay
f32: the vjp of the param cast converts the bf16 cotangents back.  There is
no GradScaler — bf16 has fp32 range.  LayerNorm statistics, softmax, and
weight-norm ‖v‖ accumulate in f32 internally (ops/layers.py,
ops/attention.py), matching torch autocast's fp32-list.

Scope ``"tail_f32"`` (default; round-4 root-cause result) casts the whole
generator to bf16 via per-stage boundary casts EXCEPT the decoder's final
conv_post+tanh: the round-4 stage-localization matrix
(benchmarks/artifacts/bf16_diag/stage_matrix*.json, flagship overfits on
TPU) showed every encoder-side stage alone in bf16 CONVERGES while the
decoder alone in bf16 COLLAPSES (@770) — the collapse enters through the
bf16-quantized output waveform (7-bit mantissa ≈ −48 dB noise floor the
f32 discriminator separates trivially), and with the f32 tail the full
bf16 generator converges (mel ×0.156 over 4000 steps, matching f32).
Legacy whole-graph scopes remain for A/B: ``"stable"`` (round-3 guess —
decoder+D f32, encoder bf16; collapses slowly) and ``"full"`` (everything,
the reference autocast scope; collapses fast).  ``fp16_run`` still
defaults OFF pending production-shape bf16 convergence evidence; the
shipped speed comes from the fused kernels, which do their internal math
in f32-in-VMEM either way.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vispeech_tpu.config import Config
from vispeech_tpu.dsp import mel_spectrogram, spec_to_mel, spectrogram
from vispeech_tpu.models import MultiPeriodDiscriminator, Synthesizer
from vispeech_tpu.ops.masking import grad_global_norm, length_mask, slice_segments
from vispeech_tpu.train import losses as L

Array = jax.Array


class Batch(NamedTuple):
    """One padded training batch (data layout: [B, ...], time-major).

    Under the device-DSP pipeline (cfg.train.device_dsp) `spec` is None and
    `wav` carries int16 samples; the train step computes the masked linear
    spectrogram on device (dsp.spectrogram matmul-DFT) — see config.py.
    """

    phonemes: Array         # [B, N] int32
    phoneme_lengths: Array  # [B]
    f0: Array               # [B, N] Hz
    energy: Array           # [B, N]
    duration: Array         # [B, N] frames
    spec: Optional[Array]   # [B, T, spec_channels] f32, or None (device DSP)
    spec_lengths: Array     # [B]
    wav: Array              # [B, T*hop, 1] f32 in [-1,1], or int16
    wav_lengths: Array      # [B]
    sid: Array              # [B]


def _cast_floats(tree, dtype):
    """Cast every floating-point leaf of a pytree to `dtype`."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        tree,
    )


# stage name (Synthesizer.bf16_stages) → top-level generator param keys
STAGE_PARAM_KEYS = {
    "enc_p": ("enc_p",),
    "heads": ("duration_predictor", "pitch_predictor", "energy_predictor",
              "pitch_prenet", "energy_prenet"),
    "fpn": ("frame_prior_net",),
    "project": ("project",),
    "enc_q": ("enc_q",),
    "flow": ("flow",),
    "dec": ("dec",),
    # decoder with an f32 tail: conv_post(+tanh) stay f32 so the output
    # waveform is continuous-valued (see Generator.__call__ tail_f32)
    "dec_body": ("dec",),
}


def g_param_cast(cfg: Config):
    """The generator-param bf16 cast the train step applies under
    ``cfg.train`` precision policy, as a reusable fn(params)->params
    (shared with diagnostics so probes see training's exact precision)."""
    if not cfg.train.fp16_run:
        return lambda p: p
    full_scope = cfg.train.bf16_scope == "full"
    bf16_only = cfg.train.effective_bf16_stages()
    if bf16_only:
        only_keys = frozenset(
            k for s in bf16_only for k in STAGE_PARAM_KEYS.get(s, (s,))
        )
        dec_tail_f32 = "dec_body" in bf16_only

        def _cast_module(k: str) -> bool:
            return k in only_keys
    else:
        dec_tail_f32 = False

        def _cast_module(k: str) -> bool:
            return full_scope or k != "dec"

    def cast(params):
        out = {}
        for k, v in params.items():
            if not _cast_module(k):
                out[k] = v
            elif k == "dec" and dec_tail_f32:
                out[k] = {
                    kk: (vv if kk == "conv_post" else _cast_floats(vv, jnp.bfloat16))
                    for kk, vv in v.items()
                }
            else:
                out[k] = _cast_floats(v, jnp.bfloat16)
        return out

    return cast


class TrainState(struct.PyTreeNode):
    step: Array
    params_g: Any
    params_d: Any
    opt_state_g: Any
    opt_state_d: Any
    rng: Array


def make_optimizer(
    cfg: Config,
    steps_per_epoch: int,
    freeze: Tuple[str, ...] = (),
) -> optax.GradientTransformation:
    """AdamW β=(0.8,0.99), eps 1e-9, wd 0.01 (torch default), per-epoch
    exponential decay γ=0.999875 (reference train.py:95-104,121-122).

    `freeze` lists top-level param-tree keys whose updates are zeroed —
    the reference's requires_grad_(False) freeze flags (models.py:617-622,
    config freeze_textencoder/freeze_decoder).
    """

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return cfg.train.learning_rate * (cfg.train.lr_decay ** epoch)

    tx = optax.adamw(
        learning_rate=schedule,
        b1=cfg.train.betas[0],
        b2=cfg.train.betas[1],
        eps=cfg.train.eps,
        weight_decay=0.01,
    )
    if freeze:
        frozen = set(freeze)

        def mask(params):
            return {k: (k in frozen) for k in params}

        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), mask))
    return tx


def g_freeze_keys(cfg: Config) -> Tuple[str, ...]:
    """Top-level generator param keys frozen by config flags."""
    keys = []
    if cfg.model.freeze_textencoder:
        keys.append("enc_p")
    if cfg.model.freeze_decoder:
        keys.append("dec")
    return tuple(keys)


def create_train_state(
    cfg: Config,
    rng: jax.Array,
    n_vocab: int,
    batch: Batch,
    steps_per_epoch: int = 1000,
) -> Tuple[TrainState, Synthesizer, MultiPeriodDiscriminator]:
    model_g = Synthesizer.from_config(cfg, n_vocab)
    model_d = MultiPeriodDiscriminator()
    rng, init_g, init_d, sample, dropout = jax.random.split(rng, 5)
    # jit the inits: eager init dispatches each op separately (pathological
    # over remote-device transports and slow everywhere)
    params_g = jax.jit(partial(model_g.init, deterministic=True))(
        {"params": init_g, "sample": sample, "dropout": dropout},
        batch.phonemes, batch.phoneme_lengths, batch.f0, batch.energy,
        batch.duration, batch.spec, batch.spec_lengths, batch.sid,
    )
    seg = cfg.train.segment_size
    dummy_wav = jnp.zeros((batch.wav.shape[0], seg, 1), batch.wav.dtype)
    params_d = jax.jit(model_d.init)(init_d, dummy_wav, dummy_wav)
    tx_g = make_optimizer(cfg, steps_per_epoch, freeze=g_freeze_keys(cfg))
    tx_d = make_optimizer(cfg, steps_per_epoch)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g,
        params_d=params_d,
        opt_state_g=tx_g.init(params_g["params"]),
        opt_state_d=tx_d.init(params_d["params"]),
        rng=rng,
    )
    return state, model_g, model_d


def make_train_step(
    cfg: Config,
    model_g: Synthesizer,
    model_d: MultiPeriodDiscriminator,
    steps_per_epoch: int = 1000,
):
    """Returns train_step(state, batch) -> (state, metrics), ready to jit/pjit."""
    tx_g = make_optimizer(cfg, steps_per_epoch, freeze=g_freeze_keys(cfg))
    tx_d = make_optimizer(cfg, steps_per_epoch)
    d = cfg.data
    seg_frames = cfg.train.segment_size // d.hop_length
    compute_dtype = jnp.bfloat16 if cfg.train.fp16_run else jnp.float32
    # "stable": decoder + discriminators stay f32 (see module docstring).
    # bf16_only (diagnostic): cast ONLY the listed top-level generator
    # modules, everything else f32 — localizes the collapse trigger.
    full_scope = cfg.train.bf16_scope == "full"
    bf16_only = cfg.train.effective_bf16_stages()
    _g_cast = g_param_cast(cfg)
    d_dtype = jnp.float32
    if cfg.train.fp16_run and (
        (full_scope and not bf16_only) or cfg.train.bf16_disc
    ):
        d_dtype = compute_dtype

    def g_forward(params_g, batch: Batch, rngs):
        return model_g.apply(
            params_g,
            batch.phonemes, batch.phoneme_lengths, batch.f0, batch.energy,
            batch.duration, batch.spec, batch.spec_lengths, batch.sid,
            deterministic=False,
            rngs=rngs,
        )

    def mel_of(spec):
        return spec_to_mel(spec, d.filter_length, d.n_mel_channels,
                           d.sampling_rate, d.mel_fmin, d.mel_fmax)

    def mel_of_wav(y):
        return mel_spectrogram(
            y[..., 0], d.filter_length, d.n_mel_channels, d.sampling_rate,
            d.hop_length, d.win_length, d.mel_fmin, d.mel_fmax,
        )

    def train_step(state: TrainState, batch: Batch):
        # device-DSP pipeline: int16 wav in, masked f32 spectrogram computed
        # here on the MXU (padded region forced to exact zeros, matching the
        # host collate's zero padding)
        if batch.wav.dtype == jnp.int16:
            batch = batch._replace(
                wav=batch.wav.astype(jnp.float32) / d.max_wav_value)
        if batch.spec is None:
            spec = spectrogram(
                batch.wav[..., 0], d.filter_length, d.sampling_rate,
                d.hop_length, d.win_length,
            )
            spec = spec * length_mask(batch.spec_lengths, spec.shape[1])
            batch = batch._replace(spec=spec)

        rng, step_rng = jax.random.split(state.rng)
        rngs = {
            "sample": jax.random.fold_in(step_rng, 0),
            "dropout": jax.random.fold_in(step_rng, 1),
        }

        # -------- ONE generator forward, vjp-tracked --------------------
        # diff: float outputs the G loss differentiates through;
        # aux: indices/masks/predictions that carry no gradient.
        # Under the bf16 policy the cast into (params/inputs) and out of
        # (diff outputs) bfloat16 happens INSIDE the differentiated function,
        # so g_vjp takes f32 cotangents and returns f32 param grads.
        def g_forward_split(gparams):
            fwd_batch = batch
            if compute_dtype != jnp.float32:
                gparams = _g_cast(gparams)
                if not bf16_only:  # stage boundaries cast their own inputs
                    fwd_batch = batch._replace(
                        f0=batch.f0.astype(compute_dtype),
                        energy=batch.energy.astype(compute_dtype),
                        spec=batch.spec.astype(compute_dtype),
                    )
            (y_hat, l_length, l_pitch, l_energy, ids_slice, x_mask, y_mask,
             latents, pred_f0, pred_ne, ne) = g_forward(
                {"params": gparams}, fwd_batch, rngs
            )
            diff = _cast_floats(
                (y_hat, l_length, l_pitch, l_energy, latents), jnp.float32
            )
            aux = (ids_slice, y_mask)
            return diff, aux

        diff_out, g_vjp, (ids_slice, y_mask) = jax.vjp(
            g_forward_split, state.params_g["params"], has_aux=True
        )
        y_hat = jax.lax.stop_gradient(diff_out[0])

        wav_slice = slice_segments(
            batch.wav, ids_slice * d.hop_length, cfg.train.segment_size
        )

        def d_loss_fn(dparams):
            # bf16 compute needs bf16 params too (f32 kernels would promote
            # the convs back to f32); the cast's vjp restores f32 grads
            if d_dtype != jnp.float32:
                dparams = _cast_floats(dparams, d_dtype)
            logits_r, logits_g, _, _ = model_d.apply(
                {"params": dparams}, wav_slice.astype(d_dtype),
                y_hat.astype(d_dtype),
            )
            loss_disc, r_losses, g_losses = L.discriminator_loss(logits_r, logits_g)
            return loss_disc, (r_losses, g_losses)

        (loss_disc, _), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.params_d["params"]
        )
        grad_norm_d = grad_global_norm(d_grads)
        d_updates, opt_state_d = tx_d.update(
            d_grads, state.opt_state_d, state.params_d["params"]
        )
        new_params_d = {
            "params": optax.apply_updates(state.params_d["params"], d_updates)
        }

        # -------- generator update against the updated D --------
        # Loss as a function of the forward's OUTPUTS; the output cotangents
        # close through g_vjp — no second generator forward.
        mel = mel_of(batch.spec)

        def g_loss_from_outputs(diff):
            y_hat, l_length, l_pitch, l_energy, latents = diff
            z, z_p, m_p, logs_p, m_q, logs_q = latents

            y_mel = slice_segments(mel, ids_slice, seg_frames)
            y_hat_mel = mel_of_wav(y_hat.astype(jnp.float32))

            d_apply_params = new_params_d
            if d_dtype != jnp.float32:
                d_apply_params = {
                    "params": _cast_floats(new_params_d["params"], d_dtype)
                }
            _, logits_g, fmap_r, fmap_g = model_d.apply(
                d_apply_params, wav_slice.astype(d_dtype),
                y_hat.astype(d_dtype),
            )
            loss_dur = l_length.astype(jnp.float32)
            loss_pitch = l_pitch.astype(jnp.float32)
            loss_energy = l_energy.astype(jnp.float32)
            loss_mel = jnp.mean(jnp.abs(y_mel - y_hat_mel)) * cfg.train.c_mel
            loss_kl = L.kl_loss(z_p, logs_q, m_p, logs_p, y_mask) * cfg.train.c_kl
            loss_fm = L.feature_loss(fmap_r, fmap_g)
            loss_gen, _ = L.generator_loss(logits_g)
            total = (loss_gen + loss_fm + loss_mel + loss_dur + loss_kl
                     + loss_pitch + loss_energy)
            aux = {
                "loss/g/total": total, "loss/g/gen": loss_gen, "loss/g/fm": loss_fm,
                "loss/g/mel": loss_mel, "loss/g/dur": loss_dur, "loss/g/kl": loss_kl,
                "loss/g/pitch": loss_pitch, "loss/g/energy": loss_energy,
            }
            return total, aux

        (loss_gen_all, g_metrics), diff_grads = jax.value_and_grad(
            g_loss_from_outputs, has_aux=True
        )(diff_out)
        (g_grads,) = g_vjp(diff_grads)
        grad_norm_g = grad_global_norm(g_grads)
        g_updates, opt_state_g = tx_g.update(
            g_grads, state.opt_state_g, state.params_g["params"]
        )
        new_params_g = {
            "params": optax.apply_updates(state.params_g["params"], g_updates)
        }

        metrics = dict(g_metrics)
        metrics.update({
            "loss/d/total": loss_disc,
            "grad_norm_d": grad_norm_d,
            "grad_norm_g": grad_norm_g,
        })
        new_state = state.replace(
            step=state.step + 1,
            params_g=new_params_g,
            params_d=new_params_d,
            opt_state_g=opt_state_g,
            opt_state_d=opt_state_d,
            rng=rng,
        )
        return new_state, metrics

    return train_step
