"""End-to-end Trainer test on a synthetic mini-dataset.

Exercises: filelist parsing → bucketed loading → jitted GAN step over the
8-device CPU mesh → logging → checkpoint save → resume (reference
train.py:42-137 covered nowhere else).
"""

import dataclasses
import os

import numpy as np
import pytest
from scipy.io import wavfile

from vispeech_tpu.config import Config, DataConfig, ModelConfig, TrainConfig

# several-minute XLA CPU compiles of the GAN step at bucket shapes + eval
pytestmark = pytest.mark.slow


HOP = 64


def tiny_config(tmp_path, n_speakers=2) -> Config:
    return Config(
        train=TrainConfig(
            log_interval=1,
            eval_interval=4,
            seed=0,
            epochs=100,
            batch_size=2,
            fp16_run=False,
            segment_size=4 * HOP,
            save_dir=str(tmp_path / "run"),
        ),
        data=DataConfig(
            training_files=str(tmp_path / "train.list"),
            validation_files=str(tmp_path / "val.list"),
            sampling_rate=8000,
            filter_length=256,
            hop_length=HOP,
            win_length=256,
            n_mel_channels=20,
            n_speakers=n_speakers,
            spk2id=(("spk0", 0), ("spk1", 1)),
        ),
        model=ModelConfig(
            inter_channels=16,
            hidden_channels=16,
            filter_channels=32,
            n_heads=2,
            n_layers=1,
            upsample_rates=(4, 4, 2, 2),
            upsample_initial_channel=32,
            upsample_kernel_sizes=(8, 8, 4, 4),
            resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),),
            gin_channels=8,
        ),
    )


def write_dataset(tmp_path, cfg: Config, n_utts=4):
    rng = np.random.RandomState(0)
    lines = []
    for i in range(n_utts):
        spk = f"spk{i % 2}"
        utt = f"u{i}"
        n_ph = 4 + i
        durs = rng.randint(2, 6, size=n_ph)
        n_frames = int(durs.sum())
        wav = (rng.randn(n_frames * HOP) * 0.1 * 32767).astype(np.int16)
        os.makedirs(tmp_path / "dataset" / spk, exist_ok=True)
        wavfile.write(tmp_path / "dataset" / spk / f"{utt}.wav", 8000, wav)
        phones = " ".join(["n", "i2", "h", "ao3"] + ["sp"] * (n_ph - 4))
        f0 = " ".join(f"{v:.1f}" for v in rng.uniform(100, 300, n_ph))
        energy = " ".join(f"{v:.1f}" for v in rng.uniform(30, 90, n_ph))
        lines.append(
            f"{spk}|{utt}|{phones}|{' '.join(map(str, durs))}|{f0}|{energy}"
        )
    (tmp_path / "train.list").write_text("\n".join(lines) + "\n")
    (tmp_path / "val.list").write_text(lines[0] + "\n")


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("trainer")
    cfg = tiny_config(tmp_path)
    write_dataset(tmp_path, cfg)
    return tmp_path, cfg


class TestTrainer:
    def test_train_eval_checkpoint_resume(self, workspace):
        from vispeech_tpu.train.loop import Trainer
        from vispeech_tpu.utils.checkpoint import latest_checkpoint_step

        tmp_path, cfg = workspace
        trainer = Trainer(cfg, data_root=str(tmp_path / "dataset"))
        assert trainer.resume() is None
        trainer.train(max_steps=5)
        step = trainer.global_step
        assert step == 5
        # eval_interval=4 → checkpoint at step 4 plus the final save at 5
        assert latest_checkpoint_step(cfg.train.save_dir) == 5
        # metrics were logged
        tb_dir = os.path.join(cfg.train.save_dir, "tb")
        assert os.listdir(tb_dir)
        # eval produced audio (tb_eval dir has an event file or audio/)
        assert os.listdir(os.path.join(cfg.train.save_dir, "tb_eval"))

        # fresh trainer resumes from step 5 and continues
        trainer2 = Trainer(cfg, data_root=str(tmp_path / "dataset"))
        assert trainer2.resume() == 5
        assert trainer2.global_step == 5
        trainer2.train(max_steps=6)
        assert trainer2.global_step == 6

    def test_preemption_sigterm_checkpoints_and_exits(self, workspace):
        """SIGTERM during train() checkpoints at the next step boundary and
        returns cleanly (TPU-pod preemption contract); a fresh trainer
        resumes from that checkpoint."""
        import signal
        import threading

        from vispeech_tpu.train.loop import Trainer
        from vispeech_tpu.utils.checkpoint import latest_checkpoint_step

        tmp_path, cfg = workspace
        cfg = dataclasses.replace(
            cfg,
            train=dataclasses.replace(
                cfg.train,
                save_dir=str(tmp_path / "run_preempt"),
                eval_interval=10_000,  # never evals/saves on its own
            ),
        )
        trainer = Trainer(cfg, data_root=str(tmp_path / "dataset"))
        threading.Timer(
            0.5, lambda: os.kill(os.getpid(), signal.SIGTERM)
        ).start()
        trainer.train(max_steps=10_000)  # returns instead of running 10k
        saved = latest_checkpoint_step(cfg.train.save_dir)
        assert saved is not None
        assert trainer.global_step < 10_000

        trainer2 = Trainer(cfg, data_root=str(tmp_path / "dataset"))
        assert trainer2.resume() == saved

    def test_loss_finiteness(self, workspace):
        """One more step; every logged loss must be finite."""
        import jax

        from vispeech_tpu.train.loop import Trainer

        tmp_path, cfg = workspace
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, save_dir=str(tmp_path / "run2"))
        )
        trainer = Trainer(cfg, data_root=str(tmp_path / "dataset"))
        batch = next(trainer._batches(0))
        from vispeech_tpu.parallel import shard_batch

        with trainer.mesh:
            batch = shard_batch(batch, trainer.mesh)
            state, metrics = trainer._step_fn(trainer.state, batch)
        metrics = jax.device_get(metrics)
        for k, v in metrics.items():
            assert np.isfinite(v), f"{k} = {v}"

    def test_checkpoint_roundtrips_into_engine(self, workspace):
        """A Trainer-written checkpoint loads through the public
        TTSEngine.from_checkpoint path and synthesizes (round-4 directive:
        the serving format-compat claim, exercised against a REAL trained
        checkpoint, not a hand-built one)."""
        from vispeech_tpu.infer.pipeline import TTSEngine
        from vispeech_tpu.train.loop import Trainer
        from vispeech_tpu.utils.checkpoint import latest_checkpoint_step

        tmp_path, cfg = workspace
        if latest_checkpoint_step(cfg.train.save_dir) is None:
            trainer = Trainer(cfg, data_root=str(tmp_path / "dataset"))
            trainer.train(max_steps=4)
        engine = TTSEngine.from_checkpoint(
            os.path.join(cfg.train.save_dir, "config.json"),
            cfg.train.save_dir,
        )
        out = engine.synthesize(phones=["n", "i2", "h", "ao3"], speaker=0)
        assert out["sampling_rate"] == cfg.data.sampling_rate
        assert len(out["audio"]) > 0
        assert np.isfinite(out["audio"]).all()
        # prosody contract fields round-trip too
        assert len(out["f0"]) == 4 and len(out["duration"]) == 4
