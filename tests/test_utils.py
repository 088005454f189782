"""Tests for checkpointing (tolerant load, prune, resume) and logging."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import struct

from vispeech_tpu.utils.checkpoint import (
    latest_checkpoint_step,
    list_checkpoint_steps,
    load_checkpoint,
    prune_checkpoints,
    save_checkpoint,
)


class State(struct.PyTreeNode):
    step: jax.Array
    params_g: dict
    opt_state_g: object
    rng: jax.Array


def make_state(w_shape=(4, 3), seed=0):
    params = {"dense": {"kernel": jnp.full(w_shape, float(seed)), "bias": jnp.zeros(w_shape[1])}}
    tx = optax.adamw(1e-3, b1=0.8, b2=0.99)
    return State(
        step=jnp.asarray(seed, jnp.int32),
        params_g=params,
        opt_state_g=tx.init(params),
        rng=jax.random.PRNGKey(seed),
    )


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        d = str(tmp_path)
        state = make_state(seed=7)
        save_checkpoint(d, state, step=100)
        fresh = make_state(seed=0)
        restored, step = load_checkpoint(d, fresh)
        assert step == 100
        assert int(restored.step) == 7
        np.testing.assert_allclose(
            np.asarray(restored.params_g["dense"]["kernel"]), 7.0
        )
        # optax NamedTuple structure survives
        chex_leaves_a = jax.tree_util.tree_structure(state.opt_state_g)
        chex_leaves_b = jax.tree_util.tree_structure(restored.opt_state_g)
        assert chex_leaves_a == chex_leaves_b

    def test_tolerant_shape_mismatch(self, tmp_path):
        d = str(tmp_path)
        save_checkpoint(d, make_state(w_shape=(4, 3), seed=5), step=10)
        bigger = make_state(w_shape=(8, 3), seed=1)
        restored, step = load_checkpoint(d, bigger)
        assert step == 10
        # mismatched kernel keeps init (1.0); matching bias restores (zeros in both)
        np.testing.assert_allclose(np.asarray(restored.params_g["dense"]["kernel"]), 1.0)
        assert int(restored.step) == 5

    def test_skip_optimizer(self, tmp_path):
        d = str(tmp_path)
        state = make_state(seed=3)
        # dirty the optimizer state
        mu = jax.tree_util.tree_map(lambda x: x + 9.0, state.opt_state_g)
        save_checkpoint(d, state.replace(opt_state_g=mu), step=1)
        fresh = make_state(seed=0)
        restored, _ = load_checkpoint(d, fresh, skip_optimizer=True)
        # params restored, optimizer untouched (still zeros from init)
        np.testing.assert_allclose(np.asarray(restored.params_g["dense"]["kernel"]), 3.0)
        flat = jax.tree_util.tree_leaves(restored.opt_state_g)
        fresh_flat = jax.tree_util.tree_leaves(fresh.opt_state_g)
        for a, b in zip(flat, fresh_flat):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_prune_and_latest(self, tmp_path):
        d = str(tmp_path)
        for s in (10, 20, 30, 40):
            save_checkpoint(d, make_state(seed=s), step=s, keep=2)
        assert list_checkpoint_steps(d) == [30, 40]
        assert latest_checkpoint_step(d) == 40

    def test_no_checkpoint(self, tmp_path):
        state = make_state()
        restored, step = load_checkpoint(str(tmp_path), state)
        assert step is None
        assert restored is state


class TestAsyncCheckpointer:
    def test_async_roundtrip_and_prune(self, tmp_path):
        from vispeech_tpu.utils.checkpoint import AsyncCheckpointer

        d = str(tmp_path)
        ckpt = AsyncCheckpointer(keep=2)
        for s in (1, 2, 3):
            ckpt.save(d, make_state(seed=s), step=s)
        ckpt.wait()
        assert list_checkpoint_steps(d) == [2, 3]
        restored, step = load_checkpoint(d, make_state(seed=0))
        assert step == 3 and int(restored.step) == 3

    def test_snapshot_is_consistent(self, tmp_path):
        """State mutated right after save() must not leak into the write."""
        from vispeech_tpu.utils.checkpoint import AsyncCheckpointer

        d = str(tmp_path)
        ckpt = AsyncCheckpointer()
        state = make_state(seed=4)
        ckpt.save(d, state, step=1)
        # mutate the caller's arrays via a donated-style overwrite
        state = state.replace(
            params_g=jax.tree_util.tree_map(lambda a: a * 0 - 1.0, state.params_g)
        )
        ckpt.wait()
        restored, _ = load_checkpoint(d, make_state(seed=0))
        np.testing.assert_allclose(
            np.asarray(restored.params_g["dense"]["kernel"]), 4.0
        )

    def test_write_error_is_raised(self, tmp_path):
        from vispeech_tpu.utils.checkpoint import AsyncCheckpointer

        target = tmp_path / "blocked"
        target.write_text("not a directory")  # makedirs will fail
        ckpt = AsyncCheckpointer()
        ckpt.save(str(target), make_state(), step=1)
        with pytest.raises(RuntimeError, match="async checkpoint write failed"):
            ckpt.wait()
        # error is consumed: a following save works elsewhere
        ckpt.save(str(tmp_path / "ok"), make_state(seed=2), step=2)
        ckpt.wait()
        assert latest_checkpoint_step(str(tmp_path / "ok")) == 2


class TestLogger:
    def test_scalars_and_media(self, tmp_path):
        from vispeech_tpu.utils.logging import TrainLogger

        lg = TrainLogger(str(tmp_path))
        lg.scalars(1, {"loss/g/total": jnp.asarray(2.5), "lr": 1e-4})
        lg.image(1, "mel", np.random.rand(80, 100, 3).astype(np.float32))
        lg.audio(1, "wav", np.zeros(4410, np.float32), 44100)
        lg.flush()
        lg.close()
        assert os.listdir(str(tmp_path))  # event file written

    def test_plotting(self):
        from vispeech_tpu.utils.plotting import (
            alignment_image,
            durations_to_alignment,
            line_plot_image,
            spectrogram_image,
        )

        img = spectrogram_image(np.random.rand(80, 120))
        assert img.ndim == 3 and img.shape[2] == 3
        img2 = line_plot_image([np.sin(np.linspace(0, 5, 50))], ["f0"])
        assert img2.ndim == 3
        aln = durations_to_alignment([2, 3, 1])
        assert aln.shape == (3, 6)
        assert aln.sum() == 6
        img3 = alignment_image(aln)
        assert img3.ndim == 3
