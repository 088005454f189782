"""TTS inference engine (reference inference.py:21-46, models.py:672-732).

Text → phonemes → jitted Synthesizer.infer → waveform, with the full prosody
control surface:

- scalar ``duration/pitch/energy`` multipliers,
- per-phoneme override *tensors* (the GUI's slider contract, gui.py:82-113 —
  the result dict returns per-phoneme predicted F0/duration/energy so a client
  can edit and re-drive synthesis),
- ``noise_scale``, speaker selection, and flow-based voice conversion.

TPU-static-shape design: phoneme length pads to a multiple of 32 and the
frame budget comes from a cheap jitted duration-only pass followed by bucket
selection, so the number of compiled programs stays bounded while arbitrary
text lengths work.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from vispeech_tpu.config import Config, load_config
from vispeech_tpu.data.dataset import numpy_spectrogram
from vispeech_tpu.models import Synthesizer
from vispeech_tpu.ops.policy import default_serving_policy
from vispeech_tpu.text import cleaned_text_to_sequence, text_to_phones
from vispeech_tpu.text.symbols import N_SYMBOLS
from vispeech_tpu.utils.checkpoint import latest_checkpoint_step

Control = Union[None, float, np.ndarray]

_PH_PAD = 32


def load_generator_params(ckpt_dir: str, step: Optional[int] = None) -> dict:
    """Extract the generator variables from a trainer checkpoint
    (flat ``params_g/...`` paths → nested dict)."""
    if step is None:
        step = latest_checkpoint_step(ckpt_dir)
    if step is None:
        raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
    path = os.path.join(ckpt_dir, f"ckpt_{step}.npz")
    stored = np.load(path)
    tree: dict = {}
    prefix = "params_g/"
    for key in stored.files:
        if not key.startswith(prefix):
            continue
        parts = key[len(prefix):].split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(stored[key])
    if not tree:
        raise ValueError(f"checkpoint {path} has no generator params")
    return tree


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_bucket(n: int) -> int:
    # ONE bucket scheme for the whole engine: single-request synthesize()
    # and synthesize_batch() share infer/batching.py's serving buckets so
    # the same request length never compiles two program families
    from vispeech_tpu.infer.batching import pick_bucket

    return pick_bucket(n)


class TTSEngine:
    """Loads config + checkpoint once, then synthesizes repeatedly."""

    def __init__(
        self,
        cfg: Config,
        variables: dict,
        max_phonemes: int = 512,
        policy=None,  # Optional[ServingPolicy]; None = fastest for backend
        transfer_int16: Optional[bool] = None,
    ):
        self.cfg = cfg
        if policy is None:
            policy = default_serving_policy()
        self.model = Synthesizer.from_config(cfg, N_SYMBOLS, policy=policy)
        self.variables = variables
        self.max_phonemes = max_phonemes
        # Serving emits 16-bit PCM anyway (server.wav_bytes), so on TPU the
        # waveform is quantized ON DEVICE and fetched as int16.  With the
        # latent tuple dropped inside the jit (see _get_infer_fn), audio is
        # the dominant fetched payload, so int16 halves the transfer term.
        # 'audio' in results stays float32 (dequantized, error
        # <= 1/32767 ~= 3.1e-5); 'audio_int16' carries the exact PCM.
        if transfer_int16 is None:
            transfer_int16 = jax.default_backend() == "tpu"
        self.transfer_int16 = bool(transfer_int16)
        self._dur_fns: Dict[int, object] = {}
        self._infer_fns: Dict[tuple, object] = {}
        self._vc_fns: Dict[int, object] = {}
        self.spk2id = dict(cfg.data.spk2id)

    @classmethod
    def from_checkpoint(
        cls, config_path: str, ckpt_dir: str, step: Optional[int] = None
    ) -> "TTSEngine":
        cfg = load_config(config_path)
        variables = {"params": load_generator_params(ckpt_dir, step)["params"]}
        return cls(cfg, variables)

    # ------------------------------------------------------------ text

    def phonemes(self, text: str) -> Sequence[str]:
        return text_to_phones(text)

    def _encode(self, phones: Sequence[str]):
        ids = cleaned_text_to_sequence(list(phones))
        n = len(ids)
        n_pad = min(_round_up(max(n, 1), _PH_PAD), self.max_phonemes)
        if n > n_pad:
            raise ValueError(f"too many phonemes: {n} > {self.max_phonemes}")
        arr = np.zeros((1, n_pad), np.int32)
        arr[0, :n] = ids
        return jnp.asarray(arr), jnp.asarray([n], jnp.int32), n

    # ------------------------------------------------------------ main API

    def synthesize(
        self,
        text: Optional[str] = None,
        phones: Optional[Sequence[str]] = None,
        speaker: Union[int, str] = 0,
        noise_scale: float = 0.667,
        duration_control: Control = None,
        pitch_control: Control = None,
        energy_control: Control = None,
        seed: int = 0,
    ) -> Dict[str, np.ndarray]:
        """Returns dict with 'audio' [T_samples], 'sampling_rate', and the
        per-phoneme 'phones', 'duration', 'f0', 'energy' (prosody-edit loop)."""
        if phones is None:
            if text is None:
                raise ValueError("need text or phones")
            phones = self.phonemes(text)
        phonemes, lengths, n = self._encode(phones)
        sid = jnp.asarray(
            [self.spk2id.get(speaker, 0) if isinstance(speaker, str) else int(speaker)],
            jnp.int32,
        )

        # frame budget: duration pass (or user-provided durations)
        if isinstance(duration_control, (np.ndarray, list, tuple)):
            dur_arr = np.zeros((1, phonemes.shape[1]), np.float32)
            dur_arr[0, :n] = np.asarray(duration_control, np.float32).reshape(-1)[:n]
            total = int(dur_arr.sum())
        else:
            dur_fn = self._get_duration_fn(phonemes.shape[1])
            pred_dur = np.asarray(jax.device_get(
                dur_fn(self.variables, phonemes, lengths, sid)
            ))
            scale = 1.0 if duration_control is None else float(duration_control)
            dur_arr = np.ceil(np.maximum(pred_dur * scale, 0.0)).astype(np.float32)
            dur_arr[0, n:] = 0
            total = int(dur_arr.sum())
        t_frames = _pick_bucket(max(total, 1))

        pitch_arr, pitch_scale = self._split_control(pitch_control, phonemes.shape[1], n)
        energy_arr, energy_scale = self._split_control(energy_control, phonemes.shape[1], n)

        run = self._get_infer_fn(
            phonemes.shape[1], t_frames,
            use_pitch_arr=pitch_arr is not None,
            use_energy_arr=energy_arr is not None,
        )
        audio, frame_mask, dur, f0, energy = jax.device_get(run(
            self.variables, phonemes, lengths, sid, jax.random.PRNGKey(seed),
            jnp.asarray(noise_scale, jnp.float32),
            jnp.asarray(dur_arr),
            jnp.asarray(pitch_arr) if pitch_arr is not None
            else jnp.asarray(pitch_scale, jnp.float32),
            jnp.asarray(energy_arr) if energy_arr is not None
            else jnp.asarray(energy_scale, jnp.float32),
        ))
        n_frames = int(np.asarray(frame_mask).sum())
        wav, pcm = self._audio_from_fetched(
            np.asarray(audio)[0], n_frames * self.cfg.data.hop_length)
        out = {
            "audio": wav,
            "sampling_rate": self.cfg.data.sampling_rate,
            "phones": list(phones),
            "duration": np.asarray(dur)[0, :n],
            "f0": np.asarray(f0)[0, :n],
            "energy": np.asarray(energy)[0, :n],
        }
        if pcm is not None:
            out["audio_int16"] = pcm
        return out

    def synthesize_batch(
        self,
        texts: Optional[Sequence[str]] = None,
        phones_list: Optional[Sequence[Sequence[str]]] = None,
        speakers: Union[int, str, Sequence] = 0,
        noise_scale: float = 0.667,
        seed: int = 0,
        tiers: Sequence[int] = None,
    ) -> Sequence[Dict[str, np.ndarray]]:
        """Bulk synthesis through tiered bucket batching (infer/batching.py).

        Requests are grouped by predicted frame bucket, cut into batch
        tiers (largest full tier first, remainder in the smallest covering
        tier), and each group runs as ONE device dispatch — the throughput
        path the reference's one-at-a-time mutex server never had
        (reference inference_api.py:35-69).  Dispatch runs one batch ahead
        of the host fetch (depth-1 pipeline) so the device computes batch
        k+1 while batch k's audio transfers; with transfer_int16 the audio
        crosses as device-quantized PCM.  Returns one result dict per
        request, order-preserving, same fields as synthesize()."""
        from vispeech_tpu.infer.batching import (
            DEFAULT_TIERS, SERVING_BUCKETS, plan_batches,
        )

        if phones_list is None:
            if texts is None:
                raise ValueError("need texts or phones_list")
            phones_list = [self.phonemes(t) for t in texts]
        R = len(phones_list)
        if not isinstance(speakers, (list, tuple, np.ndarray)):
            speakers = [speakers] * R
        sids = np.asarray(
            [self.spk2id.get(s, 0) if isinstance(s, str) else int(s)
             for s in speakers], np.int32)

        ids_list = [cleaned_text_to_sequence(list(p)) for p in phones_list]
        n_list = [len(ids) for ids in ids_list]

        # ---- per-request predicted durations (grouped by phoneme pad) ----
        durs = [None] * R
        by_npad: Dict[int, list] = {}
        for i, n in enumerate(n_list):
            n_pad = min(_round_up(max(n, 1), _PH_PAD), self.max_phonemes)
            if n > n_pad:
                raise ValueError(f"too many phonemes: {n}")
            by_npad.setdefault(n_pad, []).append(i)
        for n_pad, idxs in by_npad.items():
            ph = np.zeros((len(idxs), n_pad), np.int32)
            for r, i in enumerate(idxs):
                ph[r, : n_list[i]] = ids_list[i]
            pred = np.asarray(jax.device_get(self._get_duration_fn(n_pad)(
                self.variables, jnp.asarray(ph),
                jnp.asarray([n_list[i] for i in idxs], jnp.int32),
                jnp.asarray(sids[idxs]),
            )))
            for r, i in enumerate(idxs):
                d = np.ceil(np.maximum(pred[r], 0.0)).astype(np.float32)
                d[n_list[i]:] = 0
                durs[i] = d
        totals = [max(int(d.sum()), 1) for d in durs]

        # ---- tiered bucket plan, one dispatch per plan -------------------
        plans = plan_batches(totals, SERVING_BUCKETS,
                             tiers or DEFAULT_TIERS)
        results: list = [None] * R
        hop = self.cfg.data.hop_length
        base_key = jax.random.PRNGKey(seed)

        def harvest(plan, outs):
            # device_get here is the big fetch (audio); because the NEXT
            # plan's dispatch is already enqueued (async dispatch), the
            # device computes batch k+1 while the host pulls batch k —
            # software pipelining that hides the transfer term measured in
            # benchmarks/artifacts/serving_latency.json
            audio, _, out_dur, f0, energy = jax.device_get(outs)
            for r, i in enumerate(plan.indices):
                n = n_list[i]
                wav, pcm = self._audio_from_fetched(
                    np.asarray(audio)[r], totals[i] * hop)
                results[i] = {
                    "audio": wav,
                    "sampling_rate": self.cfg.data.sampling_rate,
                    "phones": list(phones_list[i]),
                    "duration": np.asarray(out_dur)[r, :n],
                    "f0": np.asarray(f0)[r, :n],
                    "energy": np.asarray(energy)[r, :n],
                }
                if pcm is not None:
                    results[i]["audio_int16"] = pcm

        pending = None  # (plan, device outputs) — depth-1 pipeline
        for plan_idx, plan in enumerate(plans):
            # same phoneme-pad rule as _encode (clamped by max_phonemes so
            # batch and single paths share compiled shapes)
            n_pad = min(
                _round_up(max(n_list[i] for i in plan.indices), _PH_PAD),
                self.max_phonemes,
            )
            B = plan.tier
            ph = np.zeros((B, n_pad), np.int32)
            lens = np.ones((B,), np.int32)
            dur = np.zeros((B, n_pad), np.float32)
            sid = np.zeros((B,), np.int32)
            for r, i in enumerate(plan.indices):
                ph[r, : n_list[i]] = ids_list[i]
                lens[r] = n_list[i]
                dur[r, : len(durs[i])] = durs[i][:n_pad]
                sid[r] = sids[i]
            run = self._get_infer_fn(n_pad, plan.bucket,
                                     use_pitch_arr=False,
                                     use_energy_arr=False)
            outs = run(
                self.variables, jnp.asarray(ph), jnp.asarray(lens),
                jnp.asarray(sid), jax.random.fold_in(base_key, plan_idx),
                jnp.asarray(noise_scale, jnp.float32),
                jnp.asarray(dur),
                jnp.asarray(1.0, jnp.float32), jnp.asarray(1.0, jnp.float32),
            )
            if pending is not None:
                harvest(*pending)
            pending = (plan, outs)
        if pending is not None:
            harvest(*pending)
        return results

    def _split_control(self, ctrl: Control, n_pad: int, n: int):
        """array control → (padded array, None); scalar/None → (None, scale)."""
        if isinstance(ctrl, (np.ndarray, list, tuple)):
            arr = np.zeros((1, n_pad), np.float32)
            arr[0, :n] = np.asarray(ctrl, np.float32).reshape(-1)[:n]
            return arr, None
        return None, (1.0 if ctrl is None else float(ctrl))

    def _get_duration_fn(self, n_pad: int):
        if n_pad not in self._dur_fns:
            def fn(variables, phonemes, lengths, sid):
                return self.model.apply(
                    variables, phonemes, lengths, sid,
                    method=Synthesizer.predict_durations,
                )

            self._dur_fns[n_pad] = jax.jit(fn)
        return self._dur_fns[n_pad]

    def _get_infer_fn(self, n_pad: int, t_frames: int,
                      use_pitch_arr: bool, use_energy_arr: bool):
        key = (n_pad, t_frames, use_pitch_arr, use_energy_arr,
               self.transfer_int16)
        if key not in self._infer_fns:
            int16 = self.transfer_int16

            def fn(variables, phonemes, lengths, sid, rng, noise_scale,
                   duration, pitch_ctrl, energy_ctrl):
                audio, frame_mask, _latents, dur, f0, energy = self.model.apply(
                    variables, phonemes, lengths, t_frames, sid=sid,
                    noise_scale=noise_scale,
                    duration_control=duration,
                    pitch_control=pitch_ctrl,
                    energy_control=energy_ctrl,
                    method=Synthesizer.infer,
                    rngs={"sample": rng},
                )
                # The (z, z_p, m_p, logs_p) latent tuple is (B,T,192) f32 each
                # — ~3072 B/frame vs 2048 B/frame of f32 audio.  Serving never
                # uses it, so it is dropped INSIDE the jit: XLA then neither
                # materializes nor transfers it, which is most of the fetch.
                if int16:
                    # quantize to PCM on device: wav encoding needs int16
                    # anyway (server.wav_bytes), and the audio fetch halves
                    audio = jnp.round(
                        jnp.clip(audio[..., 0].astype(jnp.float32), -1.0, 1.0)
                        * 32767.0
                    ).astype(jnp.int16)
                return audio, frame_mask, dur, f0, energy

            self._infer_fns[key] = jax.jit(fn)
        return self._infer_fns[key]

    def _audio_from_fetched(self, audio_row: np.ndarray, n_samples: int):
        """(float32 wav, int16 wav or None) from a fetched audio row."""
        if self.transfer_int16:
            pcm = np.asarray(audio_row)[:n_samples]
            return pcm.astype(np.float32) / 32767.0, pcm
        return np.asarray(audio_row)[:n_samples, 0], None

    # ------------------------------------------------------ voice conversion

    def voice_conversion(
        self,
        wav: np.ndarray,
        speaker_src: Union[int, str],
        speaker_tgt: Union[int, str],
    ) -> Dict[str, np.ndarray]:
        """Any-to-any conversion through the shared flow prior
        (reference models.py:724-732, inference.ipynb cells)."""
        d = self.cfg.data
        spec = numpy_spectrogram(
            np.asarray(wav, np.float32), d.filter_length, d.hop_length, d.win_length
        )
        t = spec.shape[0]
        t_pad = _pick_bucket(t)
        spec_pad = np.zeros((1, t_pad, spec.shape[1]), np.float32)
        spec_pad[0, :t] = spec

        def to_sid(s):
            return jnp.asarray(
                [self.spk2id.get(s, 0) if isinstance(s, str) else int(s)], jnp.int32
            )

        if t_pad not in self._vc_fns:
            def fn(variables, spec, spec_lengths, sid_src, sid_tgt, rng):
                out = self.model.apply(
                    variables, spec, spec_lengths, sid_src, sid_tgt,
                    method=Synthesizer.voice_conversion,
                    rngs={"sample": rng},
                )
                # drop the latent tuple inside the jit (see _get_infer_fn)
                return out[0], out[1]

            self._vc_fns[t_pad] = jax.jit(fn)
        audio, y_mask = jax.device_get(self._vc_fns[t_pad](
            self.variables, jnp.asarray(spec_pad), jnp.asarray([t], jnp.int32),
            to_sid(speaker_src), to_sid(speaker_tgt), jax.random.PRNGKey(0),
        ))
        return {
            "audio": np.asarray(audio)[0, : t * d.hop_length, 0],
            "sampling_rate": d.sampling_rate,
        }
