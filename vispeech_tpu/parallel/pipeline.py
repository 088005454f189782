"""Pipeline parallelism: the Synthesizer inference path split across a
'stage' mesh axis with a GPipe microbatch schedule (SURVEY.md §2.8 — the
reference has no pipeline parallelism; this is the optional stage split it
lists for when configs outgrow one chip).

The model splits at its natural seam (models/synthesizer.py):

- **stage 0** ``Synthesizer.infer_prior``: text encoder → variance adapter →
  length regulation → FramePriorNet → projection → sampled prior z_p;
- **stage 1** ``Synthesizer.infer_decode``: flow reverse → HiFi-GAN vocoder.

Mechanics (all inside one ``shard_map`` over the 'stage' axis, so the whole
schedule is a single XLA program):

- The batch is cut into M microbatches.  At tick t, stage s processes
  microbatch t−s; a ``lax.switch`` on ``axis_index('stage')`` picks the
  stage body, so each device runs only its own stage per tick.
- Activations ride the pipeline in a fixed-shape float32 **carrier**
  ``[B_mb, T, C]`` (C = max(hop, inter+1)): stage 0 packs z_p and the frame
  mask into channels, stage 1 unpacks them and packs the waveform back as
  [T, hop].  One ``ppermute`` per tick relays carriers to the next stage —
  a neighbor hop that rides ICI.
- Small per-microbatch side inputs (speaker id, injected prior noise) are
  replicated; every stage slices the microbatch it is currently holding
  (mb = t − s), so only the big activation is communicated.
- M + S − 1 ticks total; bubble fraction (S−1)/(M+S−1) — choose M ≥ ~4·S.

Prior noise is injected explicitly (``eps``) rather than drawn inside the
stage so the pipelined program is sample-for-sample identical to the
single-device ``Synthesizer.infer`` (tested in tests/test_pipeline.py).

At this model scale (~40 M params) pipeline parallelism is a fit/latency
tool, not the preferred scale-out axis — data/tensor/context parallelism
(parallel/mesh.py, parallel/context.py) scale throughput better; SURVEY.md
§2.8 reaches the same conclusion for the reference.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vispeech_tpu.models.synthesizer import Synthesizer

Array = jax.Array

N_STAGES = 2  # infer_prior | infer_decode (the model's natural seam)


def make_synthesizer_pipeline(
    model: Synthesizer,
    mesh: Mesh,
    t_frames: int,
    microbatches: int,
    noise_scale: float = 0.667,
    axis_name: str = "stage",
    max_len: Optional[int] = None,
):
    """Returns ``fn(variables, phonemes, lengths, sid, eps) -> audio``.

    audio: [B, T·hop, 1] float32, identical to ``Synthesizer.infer`` with the
    same injected ``eps``.  B must divide into `microbatches` equal chunks;
    ``mesh.shape[axis_name]`` must equal ``N_STAGES``.
    """
    S = mesh.shape[axis_name]
    if S != N_STAGES:
        raise ValueError(f"pipeline needs a {N_STAGES}-device '{axis_name}' "
                         f"axis, got {S}")
    M = microbatches
    hop = 1
    for r in model.upsample_rates:
        hop *= r
    c_inter = model.inter_channels
    c_car = max(hop, c_inter + 1)
    t_out = t_frames if max_len is None else min(max_len, t_frames)

    def sched(variables, phonemes, lengths, sid, eps):
        B, N = phonemes.shape
        if B % M != 0:
            raise ValueError(
                f"batch size {B} must divide into microbatches={M} equal "
                f"chunks (got remainder {B % M})"
            )
        B_mb = B // M
        s = jax.lax.axis_index(axis_name)

        def slice_mb(x, mb):
            start = (mb * B_mb,) + (0,) * (x.ndim - 1)
            return jax.lax.dynamic_slice(x, start, (B_mb,) + x.shape[1:])

        def stage_prior(carrier, mb):
            z_p, frame_mask, *_ = model.apply(
                variables,
                slice_mb(phonemes, mb), slice_mb(lengths, mb), t_frames,
                sid=slice_mb(sid, mb), noise_scale=noise_scale,
                eps=slice_mb(eps, mb), method=Synthesizer.infer_prior,
            )
            out = jnp.zeros((B_mb, t_frames, c_car), jnp.float32)
            out = out.at[..., :c_inter].set(z_p.astype(jnp.float32))
            return out.at[..., c_inter].set(frame_mask[..., 0].astype(jnp.float32))

        def stage_decode(carrier, mb):
            z_p = carrier[..., :c_inter]
            frame_mask = carrier[..., c_inter : c_inter + 1]
            audio, _, _ = model.apply(
                variables, z_p, frame_mask, sid=slice_mb(sid, mb),
                max_len=max_len, method=Synthesizer.infer_decode,
            )
            out = jnp.zeros((B_mb, t_frames, c_car), jnp.float32)
            wave = audio[..., 0].reshape(B_mb, t_out, hop).astype(jnp.float32)
            return out.at[:, :t_out, :hop].set(wave)

        def tick(t, carry):
            carrier, outbuf = carry
            mb = jnp.clip(t - s, 0, M - 1)
            y = jax.lax.switch(
                jnp.minimum(s, N_STAGES - 1),
                (stage_prior, stage_decode),
                carrier, mb,
            )
            # last stage banks its finished microbatch
            widx = jnp.clip(t - (S - 1), 0, M - 1)
            upd = jax.lax.dynamic_update_slice(
                outbuf, y[None], (widx, 0, 0, 0)
            )
            write = jnp.logical_and(s == S - 1, t >= S - 1)
            outbuf = jnp.where(write, upd, outbuf)
            # relay every carrier one stage forward (ICI neighbor hop)
            carrier = jax.lax.ppermute(
                y, axis_name, [(i, (i + 1) % S) for i in range(S)]
            )
            return carrier, outbuf

        vary = functools.partial(jax.lax.pcast, to="varying",
                                 axis_name=axis_name)
        carrier0 = vary(jnp.zeros((B_mb, t_frames, c_car), jnp.float32))
        outbuf0 = vary(jnp.zeros((M, B_mb, t_frames, c_car), jnp.float32))
        _, outbuf = jax.lax.fori_loop(0, M + S - 1, tick, (carrier0, outbuf0))
        return outbuf[None]  # [1(stage), M, B_mb, T, C]

    sharded = jax.shard_map(
        sched,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=P(axis_name),
        check_vma=False,
    )

    def fn(variables, phonemes, lengths, sid, eps):
        stacked = sharded(variables, phonemes, lengths, sid, eps)
        out = stacked[-1]  # the last stage's bank: [M, B_mb, T, C]
        M_, B_mb, T_, _ = out.shape
        wave = out[:, :, :t_out, :hop].reshape(M_ * B_mb, t_out * hop, 1)
        return wave

    return fn
