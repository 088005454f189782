"""Full training runtime (reference train.py:42-339 redesigned for TPU).

The reference launches one CUDA process per GPU with NCCL DDP; here a single
controller per host drives a jitted GAN step whose batch is sharded over the
('data', 'model') mesh — gradient all-reduce is GSPMD-inserted and rides ICI.
Multi-host: call jax.distributed.initialize() before Trainer(); per-host data
loading uses rank-strided bucket sharding (process_index/process_count), and
checkpoint/eval work runs on process 0 only.

Loop structure per the reference:
  * log scalars every `log_interval` steps (train.py:229-258)
  * evaluate + checkpoint every `eval_interval` steps (train.py:260-265)
  * checkpoints pruned to the newest 2 (utils.py:54-59), resume from latest
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vispeech_tpu.config import Config, save_config
from vispeech_tpu.data.dataset import (
    BucketSampler,
    FilelistDataset,
    bucket_phoneme_budgets,
    collate,
    data_loader,
)
from vispeech_tpu.dsp import mel_spectrogram, spec_to_mel
from vispeech_tpu.parallel import make_mesh, shard_batch
from vispeech_tpu.text.symbols import N_SYMBOLS
from vispeech_tpu.train.step import Batch, TrainState, create_train_state, make_train_step
from vispeech_tpu.utils import (
    TrainLogger,
    check_git_hash,
    get_logger,
    latest_checkpoint_step,
    load_checkpoint,
)
from vispeech_tpu.utils.checkpoint import AsyncCheckpointer
from vispeech_tpu.utils.plotting import line_plot_image, spectrogram_image


class Trainer:
    """End-to-end GAN trainer: data, sharded step, logging, eval, checkpoints."""

    def __init__(
        self,
        cfg: Config,
        data_root: str = "dataset",
        mesh=None,
        model_parallel: int = 1,
    ):
        self.cfg = cfg
        self.save_dir = cfg.train.save_dir
        self.logger = get_logger(self.save_dir if jax.process_index() == 0 else None)
        if jax.process_index() == 0:
            os.makedirs(self.save_dir, exist_ok=True)
            save_config(cfg, os.path.join(self.save_dir, "config.json"))
            check_git_hash(self.save_dir)
            self.tb = TrainLogger(os.path.join(self.save_dir, "tb"))
            self.tb_eval = TrainLogger(os.path.join(self.save_dir, "tb_eval"))
        else:  # pragma: no cover - multi-host only
            self.tb = self.tb_eval = None

        self.mesh = mesh if mesh is not None else make_mesh(model=model_parallel)

        self.train_set = FilelistDataset(
            cfg.data.training_files, cfg.data, data_root=data_root
        )
        self.val_set = FilelistDataset(
            cfg.data.validation_files, cfg.data, data_root=data_root
        )
        # batch_size is per-device (the reference's per-GPU batch,
        # config.json:13); each host loads its share of the data axis
        data_size = self.mesh.shape["data"]
        self.per_host_batch = cfg.train.batch_size * (
            data_size // jax.process_count()
        )
        self.sampler = BucketSampler(
            self.train_set.lengths,
            batch_size=self.per_host_batch,
            num_replicas=jax.process_count(),
            rank=jax.process_index(),
            seed=cfg.train.seed,
        )
        self.steps_per_epoch = max(len(self.sampler), 1)
        # one static (T, N) shape per bucket → at most one train-step
        # compile per non-empty bucket (see bucket_phoneme_budgets)
        self.phoneme_budgets = bucket_phoneme_budgets(self.train_set, self.sampler)
        self._shapes_seen: set = set()
        self.logger.info(
            "train: %d utts, val: %d utts, %d steps/epoch, devices=%d, "
            "buckets(T→N): %s",
            len(self.train_set), len(self.val_set), self.steps_per_epoch,
            len(jax.devices()),
            {self.sampler.buckets[b]: n for b, n in self.phoneme_budgets.items()},
        )

        rng = jax.random.PRNGKey(cfg.train.seed)
        init_batch = self._init_batch()
        self.state, self.model_g, self.model_d = create_train_state(
            cfg, rng, N_SYMBOLS, init_batch, self.steps_per_epoch
        )
        # tensor parallelism: place params under 'model'-axis channel
        # shardings; kept for resume so restored leaves land back sharded
        self._g_shardings = self._d_shardings = None
        if self.mesh.shape["model"] > 1:
            from vispeech_tpu.parallel import param_shardings

            self._g_shardings = param_shardings(
                self.state.params_g, self.mesh, require_match=True
            )
            self._d_shardings = param_shardings(self.state.params_d, self.mesh)
            self.state = self.state.replace(
                params_g=jax.device_put(self.state.params_g, self._g_shardings),
                params_d=jax.device_put(self.state.params_d, self._d_shardings),
            )
        self._step_fn = jax.jit(
            make_train_step(cfg, self.model_g, self.model_d, self.steps_per_epoch),
            donate_argnums=0,
        )
        self._infer_fn = None  # built lazily (static t_frames)
        # async checkpointing: the step loop overlaps the npz write; the
        # collective gather + device→host snapshot stay synchronous
        self._checkpointer = AsyncCheckpointer(keep=2)
        # preemption flag: set by request_stop() / SIGTERM during train()
        self._stop_requested = False
        self._profiling = False
        # per-step (frame_bucket, dispatch_s, host_wait_s, put_s) tuples:
        #   dispatch_s  = async step-dispatch wall time on the main thread
        #                 (host backpressure, NOT device step time — the
        #                 host only truly syncs at log_interval device_gets;
        #                 real throughput comes from the logged steps/s)
        #   host_wait_s = put thread blocked on the collate pipeline
        #                 (loader-bound indicator)
        #   put_s       = blocking host→device copy (transfer-bound
        #                 indicator; overlapped with compute by
        #                 _device_batches' double-buffering)
        # Bounded deque so multi-day runs don't grow host memory.
        from collections import deque

        self.step_times: "deque" = deque(maxlen=50_000)

    # ------------------------------------------------------------------ utils

    def _init_batch(self) -> Batch:
        """Tiny dummy batch just for parameter init (shapes don't matter)."""
        d = self.cfg.data
        B, N, T = 1, 8, max(self.cfg.train.segment_size // d.hop_length, 8)
        return Batch(
            phonemes=jnp.ones((B, N), jnp.int32),
            phoneme_lengths=jnp.full((B,), N, jnp.int32),
            f0=jnp.full((B, N), 150.0, jnp.float32),
            energy=jnp.full((B, N), 60.0, jnp.float32),
            duration=jnp.full((B, N), T // N, jnp.int32),
            spec=jnp.zeros((B, T, d.spec_channels), jnp.float32),
            spec_lengths=jnp.full((B,), T, jnp.int32),
            wav=jnp.zeros((B, T * d.hop_length, 1), jnp.float32),
            wav_lengths=jnp.full((B,), T * d.hop_length, jnp.int32),
            sid=jnp.zeros((B,), jnp.int32),
        )

    def resume(self) -> Optional[int]:
        """Restore the latest checkpoint if one exists; returns its step."""
        self.state, step = load_checkpoint(self.save_dir, self.state)
        if step is not None and self._g_shardings is not None:
            self.state = self.state.replace(
                params_g=jax.device_put(self.state.params_g, self._g_shardings),
                params_d=jax.device_put(self.state.params_d, self._d_shardings),
            )
        return step

    @property
    def global_step(self) -> int:
        return int(jax.device_get(self.state.step))

    # ------------------------------------------------------------------ train

    def _batches(self, epoch: int) -> Iterator[Batch]:
        for raw in data_loader(
            self.train_set, self.sampler, epoch,
            phoneme_budgets=self.phoneme_budgets,
            device_dsp=self.cfg.train.device_dsp,
        ):
            yield Batch(**raw)

    def _device_batches(self, epoch: int) -> Iterator[tuple]:
        """Device-side double-buffering: a background thread pulls collated
        host batches and issues their host→device puts, keeping up to two
        batches resident ahead of the step loop.

        Why a thread: ``jax.device_put`` BLOCKS the calling thread for the
        host→device copy (on a tunneled/low-bandwidth link this was ~0.4 s
        per flagship batch — the round-4 real-trainer bottleneck,
        BENCH_TRAIN_r04 trainer 2.17 vs harness 10.09 steps/s).  With the
        put on its own thread, batch k+1 transfers while the main thread
        dispatches step k and the device computes it — the overlap CUDA
        streams give the reference for free (reference train.py:76,159-166
        pin_memory+non_blocking).

        Yields (shape, device_batch, host_wait_s, put_s) where host_wait_s
        is how long the put thread waited on the collate pipeline (loader-
        bound indicator) and put_s is the blocking device_put time
        (transfer-bound indicator).
        """
        import queue as _queue
        import threading

        q: "_queue.Queue" = _queue.Queue(maxsize=2)
        sentinel = object()
        failure: list = []

        def worker():
            try:
                it = self._batches(epoch)
                while True:
                    t0 = time.perf_counter()
                    batch = next(it, None)
                    host_wait = time.perf_counter() - t0
                    if batch is None:
                        break
                    shape = (
                        batch.wav.shape[1] // self.cfg.data.hop_length,
                        batch.phonemes.shape[1],
                    )
                    t1 = time.perf_counter()
                    dev = shard_batch(batch, self.mesh)
                    put_s = time.perf_counter() - t1
                    q.put((shape, dev, host_wait, put_s))
            except BaseException as e:  # re-raised on the main thread below
                failure.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if failure:
                    raise failure[0]
                break
            yield item

    def request_stop(self) -> None:
        """Ask the training loop to checkpoint and exit at the next step
        boundary — preemption-safe shutdown (elastic recovery is resume()
        from that checkpoint).  Called by the SIGTERM handler train()
        installs; safe to call from any thread."""
        self._stop_requested = True

    def train(
        self,
        max_steps: Optional[int] = None,
        profile_steps: Optional[tuple] = None,
    ) -> None:
        """`profile_steps=(lo, hi)` captures an XLA/TPU trace of steps
        [lo, hi) into save_dir/profile (utils/profiling.py; process 0)."""
        cfg = self.cfg
        # a Trainer reused after a preemption stop must not exit immediately
        self._stop_requested = False
        start_step = self.global_step
        start_epoch = start_step // self.steps_per_epoch
        self.logger.info("starting at step %d (epoch %d)", start_step, start_epoch)
        t0 = time.time()
        # TPU-pod preemption arrives as SIGTERM: checkpoint, then exit
        # cleanly so the rescheduled job resumes from this step.
        import signal

        old_handler = None
        try:
            old_handler = signal.signal(
                signal.SIGTERM, lambda signum, frame: self.request_stop()
            )
        except ValueError:  # pragma: no cover - non-main thread
            pass
        try:
            self._train_loop(cfg, start_epoch, max_steps, t0, profile_steps)
        finally:
            if old_handler is not None:
                signal.signal(signal.SIGTERM, old_handler)
            self._stop_profile()
            self._write_train_stats()

    def _write_train_stats(self) -> None:
        """Machine-readable run stats sidecar (per-bucket step times, compile
        count) for harnesses/operators; process 0 only."""
        if jax.process_index() != 0:
            return
        import json

        by_bucket: dict = {}
        for t_frames, dt, host_wait, put_s in self.step_times:
            by_bucket.setdefault(t_frames, []).append((dt, host_wait, put_s))
        split = [(w, p) for _, _, w, p in self.step_times]
        stats = {
            "global_step": self.global_step,
            "compiled_shapes": sorted(self._shapes_seen),
            "n_compiles": len(self._shapes_seen),
            # dispatch (host backpressure) times — NOT device step times;
            # see step_times. Kept for host-overhead diagnostics only.
            "dispatch_ms_by_bucket": {
                str(k): {
                    "n": len(v),
                    "median_ms": round(
                        1e3 * float(np.median([d for d, _, _ in v])), 2),
                }
                for k, v in sorted(by_bucket.items())
            },
            # per-step input-pipeline split, measured on the put thread
            # (_device_batches): host_wait = collate/loader stall, put =
            # blocking H2D copy.  Both OVERLAP device compute via the
            # double buffer, so they only bound throughput when their sum
            # exceeds the device step time.
            "input_pipeline_ms": {
                "host_wait_median": round(
                    1e3 * float(np.median([w for w, _ in split])), 2)
                if split else None,
                "h2d_put_median": round(
                    1e3 * float(np.median([p for _, p in split])), 2)
                if split else None,
                "h2d_put_p90": round(
                    1e3 * float(np.percentile([p for _, p in split], 90)), 2)
                if split else None,
            },
        }
        try:
            with open(os.path.join(self.save_dir, "train_stats.json"), "w") as f:
                json.dump(stats, f, indent=1)
        except OSError:  # pragma: no cover
            pass

    def _start_profile(self) -> None:
        if not self._profiling:
            jax.profiler.start_trace(os.path.join(self.save_dir, "profile"))
            self._profiling = True
            self.logger.info("profiler trace started -> %s/profile", self.save_dir)

    def _stop_profile(self) -> None:
        if self._profiling:
            jax.profiler.stop_trace()
            self._profiling = False
            from vispeech_tpu.utils.profiling import device_memory_stats

            for dev, s in device_memory_stats().items():
                self.logger.info(
                    "profiler trace stopped; %s peak HBM %.1f MiB / %.1f MiB",
                    dev, s["peak_bytes_in_use"] / 2**20, s["bytes_limit"] / 2**20,
                )

    def _train_loop(self, cfg, start_epoch, max_steps, t0, profile_steps) -> None:
        profile_steps = profile_steps if jax.process_index() == 0 else None
        with self.mesh:
            for epoch in range(start_epoch, cfg.train.epochs):
                for shape, batch, host_wait, put_s in self._device_batches(epoch):
                    step = self.global_step
                    if profile_steps is not None:
                        if step >= profile_steps[1]:
                            self._stop_profile()
                        elif step >= profile_steps[0]:
                            self._start_profile()
                    if self._stop_requested:
                        self.logger.info(
                            "stop requested (preemption) — saving at step %d",
                            step,
                        )
                        self._save(step)
                        self._checkpointer.wait()
                        return
                    if max_steps is not None and step >= max_steps:
                        self._save(step)
                        self._checkpointer.wait()  # durable before returning
                        return
                    if shape not in self._shapes_seen:
                        self._shapes_seen.add(shape)
                        self.logger.info(
                            "step %d: new batch shape T=%d N=%d "
                            "(compile %d of ≤%d buckets)",
                            step, shape[0], shape[1], len(self._shapes_seen),
                            len(self.phoneme_budgets),
                        )
                    t_step = time.perf_counter()
                    self.state, metrics = self._step_fn(self.state, batch)
                    self.step_times.append(
                        (shape[0], time.perf_counter() - t_step,
                         host_wait, put_s)
                    )
                    step += 1
                    if step % cfg.train.log_interval == 0 and self.tb is not None:
                        metrics = jax.device_get(metrics)
                        lr = cfg.train.learning_rate * (
                            cfg.train.lr_decay ** (step // self.steps_per_epoch)
                        )
                        metrics["lr"] = lr
                        dt = time.time() - t0
                        metrics["steps_per_sec"] = cfg.train.log_interval / max(dt, 1e-9)
                        t0 = time.time()
                        self.tb.scalars(step, metrics)
                        self.logger.info(
                            "epoch %d step %d: g=%.3f d=%.3f mel=%.3f (%.2f steps/s)",
                            epoch, step,
                            float(metrics.get("loss/g/total", np.nan)),
                            float(metrics.get("loss/d/total", np.nan)),
                            float(metrics.get("loss/g/mel", np.nan)),
                            metrics["steps_per_sec"],
                        )
                    if step % cfg.train.eval_interval == 0:
                        if jax.process_index() == 0:
                            self.evaluate(step)
                        self._save(step)
            self._checkpointer.wait()

    def _save(self, step: int) -> None:
        self._checkpointer.save(self.save_dir, self.state, step)

    # ------------------------------------------------------------------- eval

    def _build_infer(self, t_frames: int):
        def fn(params, phonemes, lengths, sid, rng):
            return self.model_g.apply(
                params, phonemes, lengths, t_frames, sid=sid,
                noise_scale=0.667,
                method=type(self.model_g).infer,
                rngs={"sample": rng},
            )

        return jax.jit(fn)

    def evaluate(self, step: int, t_frames: int = 1024) -> None:
        """Synthesize the first val utterance, log mel/F0/audio
        (reference train.py:272-339: rank0, first utt, max_len=1000)."""
        if len(self.val_set) == 0 or self.tb_eval is None:
            return
        d = self.cfg.data
        raw = collate(self.val_set, [0], frame_budget=min(t_frames, 1400))
        if self._infer_fn is None:
            self._infer_fn = self._build_infer(raw["spec"].shape[1])
        audio, frame_mask, _, dur, f0_pred, energy_pred = jax.device_get(
            self._infer_fn(
                self.state.params_g,
                jnp.asarray(raw["phonemes"]),
                jnp.asarray(raw["phoneme_lengths"]),
                jnp.asarray(raw["sid"]),
                jax.random.PRNGKey(step),
            )
        )
        n_frames = int(np.asarray(frame_mask).sum())
        wav = np.asarray(audio)[0, : n_frames * d.hop_length, 0]

        gt_spec = raw["spec"][0, : int(raw["spec_lengths"][0])]
        gt_mel = np.asarray(jax.device_get(spec_to_mel(
            jnp.asarray(gt_spec[None]), d.filter_length, d.n_mel_channels,
            d.sampling_rate, d.mel_fmin, d.mel_fmax,
        )))[0]
        gen_mel = np.asarray(jax.device_get(mel_spectrogram(
            jnp.asarray(wav[None]), d.filter_length, d.n_mel_channels,
            d.sampling_rate, d.hop_length, d.win_length, d.mel_fmin, d.mel_fmax,
        )))[0]

        n_ph = int(raw["phoneme_lengths"][0])
        self.tb_eval.image(step, "eval/mel_gt", spectrogram_image(gt_mel) / 255.0)
        self.tb_eval.image(step, "eval/mel_gen", spectrogram_image(gen_mel) / 255.0)
        self.tb_eval.image(
            step, "eval/f0",
            line_plot_image(
                [raw["f0"][0, :n_ph], np.asarray(f0_pred)[0, :n_ph]],
                ["gt", "pred"], title="phoneme F0 (Hz)",
            ) / 255.0,
        )
        self.tb_eval.audio(step, "eval/audio_gen", wav, d.sampling_rate)
        gt_wav = raw["wav"][0, : int(raw["wav_lengths"][0]), 0]
        self.tb_eval.audio(step, "eval/audio_gt", gt_wav, d.sampling_rate)
        self.tb_eval.flush()
        self.logger.info("eval @ step %d: %d frames synthesized", step, n_frames)
