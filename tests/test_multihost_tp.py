"""Cross-process TENSOR parallelism exercised for real on CPU.

Round-3 review (Missing #5): the multihost test ran a data-only mesh; the
model axis + host-gather checkpoint under TP had only run single-process.
This test launches TWO jax.distributed CPU processes (2 virtual devices
each) forming a ('data','model') = 2×2 mesh — the model axis lives inside
each process (ICI-like), the data axis spans processes (DCN-like) — and:

  * places generator params under the real TP channel shardings
    (parallel.param_shardings, require_match) via a jitted identity,
  * runs the real jitted GAN train step: TP collectives within a process,
    cross-process data-axis gradient all-reduce over gloo,
  * saves through the collective host-gather with params ACTUALLY
    distributed across processes (utils/checkpoint.gather_state_to_host),
  * restores with shardings on both processes and verifies a TP-sharded
    leaf round-trips bit-exactly.

Reference counterpart: none — reference is single-node data-parallel only
(reference train.py:42-64); we claim more, so we test more.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import os, re, sys, time
pid = int(sys.argv[1]); port = sys.argv[2]; workdir = sys.argv[3]
_flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                os.environ.get("XLA_FLAGS", ""))
WARM = pid < 0  # single-process cache-warm pass (4 local virtual devices)
os.environ["XLA_FLAGS"] = (
    _flags + " --xla_force_host_platform_device_count="
    + ("4" if WARM else "2")).strip()
os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_platforms", "cpu")
if not os.environ.get("VISPEECH_NO_JAX_CACHE"):
    jax.config.update("jax_compilation_cache_dir", "/tmp/vispeech_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if not WARM:
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2
    assert jax.device_count() == 4 and jax.local_device_count() == 2

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vispeech_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from vispeech_tpu.parallel import make_mesh, shard_batch
from vispeech_tpu.parallel.mesh import param_shardings, replicated
from vispeech_tpu.train.step import Batch, create_train_state, make_train_step
from vispeech_tpu.utils.checkpoint import (
    load_checkpoint, save_checkpoint, latest_checkpoint_step,
)

HOP = 4
# decoder wide enough (initial 128 -> stage channels 64) that the TP
# channel patterns match (parallel.mesh._MIN_SHARD_SIZE = 64)
cfg = Config(
    train=TrainConfig(seed=0, batch_size=1, fp16_run=False, segment_size=4 * HOP),
    data=DataConfig(
        sampling_rate=800, filter_length=8, hop_length=HOP, win_length=8,
        n_mel_channels=4, n_speakers=2, spk2id=(("spk0", 0), ("spk1", 1)),
    ),
    model=ModelConfig(
        inter_channels=8, hidden_channels=8, filter_channels=16, n_heads=2,
        n_layers=1, upsample_rates=(2, 2), upsample_initial_channel=128,
        upsample_kernel_sizes=(4, 4), resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), gin_channels=4,
    ),
)

# ('data','model') = 2x2: jax.devices() orders process 0's two devices
# first, so rows (data) split across processes and the model axis stays
# process-local — the DCN-outside / ICI-inside layout (SURVEY.md §2.8)
mesh = make_mesh(data=2, model=2)
assert mesh.shape == {"data": 2, "model": 2}
if not WARM:
    local_in_row = {d.process_index for d in mesh.devices[0]}
    assert len(local_in_row) == 1, "model axis must not span processes"

# trivial collective first: establish the gloo context inside its fixed
# 30 s rendezvous window before any multi-minute compile (see
# tests/test_multihost.py for the full rationale)
_tiny = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")),
    np.ones((1 if not WARM else 2,), np.float32))
with mesh:
    _total = jax.jit(lambda v: jnp.sum(v), out_shardings=replicated(mesh))(_tiny)
assert float(_total) == 2.0, _total

def _coord_client():
    try:
        from jax._src import distributed as _dist
        return _dist.global_state.client
    except Exception:
        return None

_CLIENT = _coord_client()

def barrier(name):
    if WARM:
        return
    if _CLIENT is not None:
        _CLIENT.wait_at_barrier(name, timeout_in_ms=600_000)
    else:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)

r = np.random.RandomState(100 + max(pid, 0))
B_local, N, T = (2 if WARM else 1), 8, 8
dur = np.full((B_local, N), T // N, np.int32)
local = dict(
    phonemes=r.randint(1, 40, (B_local, N)).astype(np.int32),
    phoneme_lengths=np.full((B_local,), N, np.int32),
    f0=r.uniform(80, 300, (B_local, N)).astype(np.float32),
    energy=r.uniform(30, 90, (B_local, N)).astype(np.float32),
    duration=dur,
    spec=r.randn(B_local, T, cfg.data.spec_channels).astype(np.float32),
    spec_lengths=np.full((B_local,), T, np.int32),
    wav=np.clip(r.randn(B_local, T * HOP, 1) * 0.1, -1, 1).astype(np.float32),
    wav_lengths=np.full((B_local,), T * HOP, np.int32),
    sid=(r.randint(0, 2, (B_local,))).astype(np.int32),
)

with mesh:
    init_local = Batch(**{k: jnp.asarray(v) for k, v in local.items()})
    state, mg, md = create_train_state(
        cfg, jax.random.PRNGKey(0), n_vocab=40, batch=init_local)

    # real TP shardings; require_match: a silent degrade to replication
    # would pass this test while testing nothing
    g_sh = param_shardings(state.params_g, mesh, require_match=True)
    d_sh = param_shardings(state.params_d, mesh)
    n_tp = sum(1 for s in jax.tree.leaves(
        g_sh, is_leaf=lambda x: isinstance(x, NamedSharding))
        if s.spec != P())
    assert n_tp >= 1, "no TP-sharded generator leaf"

    sh_tree = jax.tree.map(
        lambda _: replicated(mesh), jax.device_get(state),
    ).replace(params_g=g_sh, params_d=d_sh)
    barrier("tp_place")
    state = jax.jit(lambda s: s, out_shardings=sh_tree)(jax.device_get(state))
    if not WARM:
        # a sharded leaf is genuinely distributed: this process holds only
        # its model-axis slice of the up_0 weight-norm direction
        leaf = state.params_g["params"]["dec"]["up_0"]["v"]
        tp_shard = [s for s in leaf.addressable_shards]
        assert tp_shard[0].data.shape[-1] == leaf.shape[-1] // 2, (
            tp_shard[0].data.shape, leaf.shape)

    batch = Batch(**shard_batch(local, mesh))
    step_fn = jax.jit(make_train_step(cfg, mg, md), donate_argnums=0)
    barrier("tp_step")
    state, metrics = step_fn(state, batch)
    metrics = jax.device_get(metrics)
    for k, v in metrics.items():
        assert np.isfinite(v), (k, v)
    print(f"[{pid}] TP step metrics finite; mel={metrics['loss/g/mel']:.3f}",
          flush=True)

    # collective host-gather save with params distributed across processes
    barrier("tp_save")
    save_checkpoint(workdir, state, step=1)

for _ in range(1 if WARM else 120):
    if latest_checkpoint_step(workdir) == 1:
        break
    time.sleep(0.5)
assert latest_checkpoint_step(workdir) == 1

barrier("tp_load")
with mesh:
    fresh, _, _ = create_train_state(
        cfg, jax.random.PRNGKey(7), n_vocab=40, batch=init_local)
    fresh = jax.jit(lambda s: s, out_shardings=sh_tree)(jax.device_get(fresh))
    state2, step = load_checkpoint(workdir, fresh, shardings=sh_tree)
    assert step == 1
    a = state.params_g["params"]["dec"]["up_0"]["v"]
    b = state2.params_g["params"]["dec"]["up_0"]["v"]
    assert b.sharding.spec == a.sharding.spec  # restored SHARDED
    np.testing.assert_array_equal(
        np.asarray(a.addressable_shards[0].data),
        np.asarray(b.addressable_shards[0].data),
    )
print(("WARM_OK" if WARM else f"[{pid}] MULTIHOST_TP_OK"), flush=True)
"""


def test_two_process_tensor_parallel_train_and_checkpoint(tmp_path):
    """2 jax.distributed CPU processes, ('data','model')=2×2 mesh: TP param
    placement, one GAN step, host-gather save with cross-process shards,
    sharded restore."""
    worker = tmp_path / "worker_tp.py"
    worker.write_text(_WORKER)
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    warm_dir = tmp_path / "warm_ckpt"
    warm_dir.mkdir()
    port = str(14000 + os.getpid() % 2000)

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)

    warm = subprocess.run(
        [sys.executable, str(worker), "-1", port, str(warm_dir)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True, timeout=900,
    )
    assert warm.returncode == 0, f"warm pass failed:\n{warm.stdout[-4000:]}"
    assert "WARM_OK" in warm.stdout

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port, str(ckpt_dir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert "MULTIHOST_TP_OK" in out, f"worker {i} incomplete:\n{out[-2000:]}"
