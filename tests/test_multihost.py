"""Multi-host (multi-process) layer exercised for real on CPU.

Round-2 review: the DCN-facing code paths — jax.distributed.initialize, the
make_array_from_process_local_data branch of shard_batch, and checkpoint
host-gather — were `pragma: no cover` and had never executed.  This test
launches TWO jax.distributed CPU processes (2 virtual devices each → one
4-device 'data' mesh spanning both), runs the real jitted GAN train step on
a process-locally-loaded batch, saves a checkpoint through the collective
host-gather, and restores it on both processes.

Reference counterpart: single-node-only mp.spawn + NCCL DDP
(reference train.py:42-64); we claim multi-host, so we test it.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import os, re, sys, time
pid = int(sys.argv[1]); port = sys.argv[2]; workdir = sys.argv[3]
# FORCE 2 virtual devices per process — the parent pytest run exports
# xla_force_host_platform_device_count=8 (tests/conftest.py), which the
# worker would otherwise inherit (8 local x 2 processes = 16 != 4 global)
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
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4 and jax.local_device_count() == 2
else:
    assert jax.device_count() == 4

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vispeech_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from vispeech_tpu.parallel import make_mesh, shard_batch
from vispeech_tpu.parallel.mesh import replicated
from vispeech_tpu.train.step import Batch, create_train_state, make_train_step
from vispeech_tpu.utils.checkpoint import (
    load_checkpoint, save_checkpoint, latest_checkpoint_step,
)

HOP = 4
cfg = Config(
    train=TrainConfig(seed=0, batch_size=1, fp16_run=False, segment_size=4 * HOP),
    data=DataConfig(
        sampling_rate=800, filter_length=8, hop_length=HOP, win_length=8,
        n_mel_channels=4, n_speakers=2, spk2id=(("spk0", 0), ("spk1", 1)),
    ),
    model=ModelConfig(
        inter_channels=8, hidden_channels=8, filter_channels=16, n_heads=2,
        n_layers=1, upsample_rates=(2, 2), upsample_initial_channel=16,
        upsample_kernel_sizes=(4, 4), resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), gin_channels=4,
    ),
)
mesh = make_mesh()          # 4-device 'data' axis across BOTH processes
assert mesh.shape["data"] == 4

# Establish the gloo context with a TRIVIAL collective first: its compile is
# sub-second, so both processes rendezvous well inside gloo's fixed 30 s
# window even with Python-startup skew — and the heavy train-step compiles
# that follow then start in lockstep on both processes (identical programs,
# shared persistent cache), keeping execution skew at later collectives
# far below the window.  Without this, the first collective fires after a
# multi-minute compile whose cross-process skew exceeds 30 s and gloo
# context initialization itself times out.
from jax.sharding import NamedSharding as _NS
import numpy as _np
_tiny = jax.make_array_from_process_local_data(
    _NS(mesh, P("data")), _np.ones((2 if not WARM else 4,), _np.float32))
with mesh:
    _total = jax.jit(lambda v: jnp.sum(v), out_shardings=replicated(mesh))(_tiny)
assert float(_total) == 4.0, _total
if not WARM:
    print(f"[{pid}] gloo context up", flush=True)

# Coordination-service barrier (NOT gloo: the distributed KV service has a
# configurable long timeout).  Called before every collective-bearing
# program: both processes then START each multi-minute compile at the same
# instant, so the skew a gloo collective sees is only the DIFFERENCE in
# compile durations (seconds for identical programs), never the absolute
# compile time — gloo's fixed 30 s rendezvous window holds.
def _coord_client():
    # the coordination-service client moved across JAX versions; fall back
    # through the known locations, then to None (barrier becomes a no-op
    # and the test relies on gloo's own rendezvous window)
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

# process-local batch half (B_local=2 -> B_global=4), deterministic per rank
# (the warm pass holds all 4 rows locally and compiles the same programs)
r = np.random.RandomState(100 + max(pid, 0))
B_local, N, T = (4 if WARM else 2), 8, 8
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
barrier("pre_total")
with mesh:
    batch = Batch(**shard_batch(local, mesh))   # multihost branch
    # the global batch really spans both processes' data
    total = jax.jit(lambda b: sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                                  for x in b),
                    out_shardings=replicated(mesh))(batch)
    assert float(total) > 0

    # identical init on every process (same seed), then replicate over mesh
    init_local = Batch(**{k: jnp.asarray(v) for k, v in local.items()})
    state, mg, md = create_train_state(
        cfg, jax.random.PRNGKey(0), n_vocab=40, batch=init_local)
    # replicate via a jitted identity: jax.device_put to a replicated
    # multi-process sharding runs a cross-host assert_equal allgather
    # (another gloo rendezvous) that the barrier pattern cannot precede
    barrier("pre_replicate")
    state = jax.jit(lambda s: s, out_shardings=replicated(mesh))(
        jax.device_get(state))
    step_fn = jax.jit(make_train_step(cfg, mg, md), donate_argnums=0)
    barrier("pre_step")
    for _ in range(2):
        state, metrics = step_fn(state, batch)
    metrics = jax.device_get(metrics)
    for k, v in metrics.items():
        assert np.isfinite(v), (k, v)
    print(f"[{pid}] step metrics finite; mel={metrics['loss/g/mel']:.3f}",
          flush=True)

    # collective host-gather save (process 0 writes)
    barrier("pre_save")
    save_checkpoint(workdir, state, step=2)

# wait for the file (written by process 0 only; warm pass writes directly)
for _ in range(1 if WARM else 120):
    if latest_checkpoint_step(workdir) == 2:
        break
    time.sleep(0.5)
assert latest_checkpoint_step(workdir) == 2

barrier("pre_load")
with mesh:
    state2, step = load_checkpoint(workdir, jax.device_get(state))
    assert step == 2
    a = jax.device_get(state.params_g)["params"]["enc_p"]["symbol_emb"]["embedding"]
    b = state2.params_g["params"]["enc_p"]["symbol_emb"]["embedding"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
print(("WARM_OK" if WARM else f"[{pid}] MULTIHOST_OK"), flush=True)
"""


def test_two_process_train_and_checkpoint(tmp_path):
    """2 jax.distributed CPU processes: sharded batch assembly, jitted GAN
    step over the cross-process mesh, host-gather checkpoint, restore."""
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    warm_dir = tmp_path / "warm_ckpt"
    warm_dir.mkdir()
    port = str(12000 + os.getpid() % 2000)

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker pins cpu via jax.config

    # Cache-warm pass: ONE process, 4 local virtual devices, no
    # jax.distributed — compiles the exact programs (same HLO, same 4-device
    # logical topology, shared persistent cache) so the two real workers
    # below compile from cache in seconds and reach every gloo collective
    # well inside its fixed 30 s rendezvous window.  Without this, the
    # multi-minute train-step compile skews the processes apart on a 2-CPU
    # box and gloo context initialization times out.
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
        assert "MULTIHOST_OK" in out, f"worker {i} did not finish:\n{out[-2000:]}"
