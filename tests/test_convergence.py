"""Training actually LEARNS — overfit regression (reference train.py:139-266).

Round-2 review finding: every training artifact asserted finiteness, never
descent, so a subtle gradient bug (vjp split, custom-VJP kernel, misplaced
stop-gradient) could pass the whole suite.  This test overfits one fixed
synthetic batch (data/synthetic.py: deterministic harmonic utterances) for a
few hundred steps on the 8-device CPU mesh and asserts the mel reconstruction
loss actually falls — the property that matters.  Thresholds are calibrated
loose (observed ratio is far below) so only a broken gradient path fails.
"""

import numpy as np
import pytest

# several hundred jitted GAN steps + one multi-minute compile
pytestmark = pytest.mark.slow

HOP = 64
STEPS = 300


@pytest.fixture(scope="module")
def overfit_run(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from vispeech_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from vispeech_tpu.data.dataset import FilelistDataset, collate
    from vispeech_tpu.data.synthetic import write_synthetic_dataset
    from vispeech_tpu.text.symbols import N_SYMBOLS
    from vispeech_tpu.train.step import Batch, create_train_state, make_train_step

    root = str(tmp_path_factory.mktemp("overfit"))
    write_synthetic_dataset(
        root, sr=8000, hop=HOP, n_utts=4, n_phones=8, dur_range=(3, 6), seed=0
    )
    cfg = Config(
        train=TrainConfig(
            seed=0, batch_size=4, fp16_run=False, segment_size=8 * HOP,
            learning_rate=2e-4,
        ),
        data=DataConfig(
            training_files=f"{root}/train.list",
            validation_files=f"{root}/val.list",
            sampling_rate=8000, filter_length=256, hop_length=HOP,
            win_length=256, n_mel_channels=20, n_speakers=2,
            spk2id=(("spk0", 0), ("spk1", 1)),
        ),
        model=ModelConfig(
            inter_channels=32, hidden_channels=32, filter_channels=64,
            n_heads=2, n_layers=1, upsample_rates=(4, 4, 2, 2),
            upsample_initial_channel=64, upsample_kernel_sizes=(8, 8, 4, 4),
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
            gin_channels=8,
        ),
    )
    ds = FilelistDataset(cfg.data.training_files, cfg.data,
                         data_root=f"{root}/dataset")
    T = max(u.n_frames for u in ds.utterances)
    raw = collate(ds, list(range(len(ds))), frame_budget=T)
    batch = Batch(**{k: jnp.asarray(v) for k, v in raw.items()})
    state, mg, md = create_train_state(cfg, jax.random.PRNGKey(0), N_SYMBOLS, batch)
    step_fn = jax.jit(make_train_step(cfg, mg, md), donate_argnums=0)

    hist = {"mel": [], "dur": [], "pitch": [], "d": []}
    for i in range(STEPS):
        state, m = step_fn(state, batch)
        if i % 10 == 0 or i == STEPS - 1:
            m = jax.device_get(m)
            hist["mel"].append(float(m["loss/g/mel"]))
            hist["dur"].append(float(m["loss/g/dur"]))
            hist["pitch"].append(float(m["loss/g/pitch"]))
            hist["d"].append(float(m["loss/d/total"]))
    return hist


class TestConvergence:
    def test_mel_loss_halves(self, overfit_run):
        """The decoder/posterior reconstruction path learns: mel L1 after
        300 overfit steps < 0.5× its initial value (reference behavior:
        mel L1 falls fast in early training)."""
        mel = overfit_run["mel"]
        initial = np.mean(mel[:2])
        final = np.mean(mel[-3:])
        assert final < 0.5 * initial, (initial, final, mel)

    def test_prosody_heads_learn(self, overfit_run):
        """Duration + pitch MSE heads descend on their fixed targets."""
        dur, pitch = overfit_run["dur"], overfit_run["pitch"]
        assert np.mean(dur[-3:]) < 0.7 * np.mean(dur[:2]), dur
        assert np.mean(pitch[-3:]) < 0.7 * np.mean(pitch[:2]), pitch

    def test_discriminator_engages(self, overfit_run):
        """D loss stays finite and below its 2·(1+0) random-logits start —
        the adversarial game is being played, not diverging."""
        d = overfit_run["d"]
        assert np.all(np.isfinite(d))
        assert np.mean(d[-3:]) < 6.0, d
