"""Tensor-parallel sharding regression tests (VERDICT r1 #7).

Builds the real Synthesizer param tree on the 8-device CPU mesh and asserts
the intended vocoder/WN kernels actually receive a 'model' sharding — a
renamed module must fail loudly, not silently degrade TP to replication.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vispeech_tpu.config import config_from_dict
from vispeech_tpu.models import Synthesizer
from vispeech_tpu.parallel import make_mesh, param_shardings

# the parallelism tests exercise an 8-way virtual CPU mesh (conftest); the
# single-chip TPU tier cannot host them — multi-chip coverage stays on the
# CPU tier + the driver's dryrun_multichip
pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh")



@pytest.fixture(scope="module")
def params():
    cfg = config_from_dict({
        "train": {"segment_size": 256},
        "data": {
            "sampling_rate": 8000, "filter_length": 128, "hop_length": 64,
            "win_length": 128, "n_speakers": 2,
        },
        "model": {
            "inter_channels": 16, "hidden_channels": 16, "filter_channels": 32,
            "n_heads": 2, "n_layers": 1, "kernel_size": 3, "p_dropout": 0.1,
            "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
            "upsample_rates": [8, 4, 2], "upsample_initial_channel": 128,
            "upsample_kernel_sizes": [16, 8, 4], "gin_channels": 8,
        },
    })
    model = Synthesizer.from_config(cfg, n_vocab=40)
    ph = jnp.ones((1, 8), jnp.int32)
    lens = jnp.full((1,), 8, jnp.int32)
    return jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            ph, lens, 16, sid=jnp.zeros((1,), jnp.int32),
            method=Synthesizer.infer,
        )
    )()


def _flat_specs(shardings):
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    return {
        "/".join(str(getattr(k, "key", k)) for k in path): s.spec
        for path, s in flat
    }


def test_intended_params_get_model_axis(params):
    mesh = make_mesh(data=4, model=2)
    specs = _flat_specs(param_shardings(params, mesh))

    def spec_of(substrings):
        hits = {k: v for k, v in specs.items()
                if all(s in k for s in substrings)}
        assert hits, f"no param path contains {substrings}"
        return hits

    # vocoder conv_pre (128 out-ch) and up_0 (64 out-ch) shard on 'model'
    for k, spec in spec_of(["dec", "conv_pre", "kernel"]).items():
        assert spec[-1] == "model", (k, spec)
    for k, spec in spec_of(["dec", "up_0", "v"]).items():
        assert spec[-1] == "model", (k, spec)
    # tiny params (16-ch flow WN here) stay replicated (< _MIN_SHARD_SIZE)
    for k, spec in spec_of(["flow", "in_0"]).items():
        assert spec == P(), (k, spec)
    # at least a handful of model-sharded leaves overall
    n_model = sum(1 for s in specs.values() if s and s[-1] == "model")
    assert n_model >= 4, n_model


def test_rename_fails_loudly(params):
    """A renamed module (no pattern hit at all) raises instead of silently
    replicating everything."""
    mesh = make_mesh(data=4, model=2)
    renamed = jax.tree_util.tree_map(lambda x: x, params)
    # reverse the module names so no substring pattern can hit (dec→ced …)
    renamed = {"params": {k[::-1]: v for k, v in renamed["params"].items()}}
    with pytest.raises(ValueError, match="no parameter matched"):
        param_shardings(renamed, mesh, require_match=True)


def test_data_only_mesh_never_raises(params):
    mesh = make_mesh(data=8, model=1)
    specs = _flat_specs(param_shardings(params, mesh))
    assert all(s == P() for s in specs.values())


def test_flagship_sized_channels_all_shard():
    """At the flagship 512-channel vocoder width every upsample stage ≥64ch
    matches; synthetic tree with real path names."""
    mesh = make_mesh(data=4, model=2)
    tree = {
        "params": {
            "dec": {
                "conv_pre": {"kernel": np.zeros((7, 192, 512))},
                "up_0": {"v": np.zeros((16, 512, 256)), "g": np.zeros((256,))},
                "res_0_0": {"conv1_0": {"v": np.zeros((3, 256, 256))}},
            },
            "enc_q": {"enc": {"in_3": {"v": np.zeros((5, 192, 384))}}},
            "flow": {"couplings_0": {"enc": {"in_0": {"v": np.zeros((5, 192, 384))}}}},
        }
    }
    specs = _flat_specs(param_shardings(tree, mesh))
    model_keys = [k for k, s in specs.items() if s and s[-1] == "model"]
    assert any("conv_pre" in k for k in model_keys)
    assert any("up_0" in k and k.endswith("v") for k in model_keys)
    assert any("res_0_0" in k for k in model_keys)
    assert any("enc_q" in k for k in model_keys)
    assert any("flow" in k for k in model_keys)
