"""Honest per-stage vocoder timing on TPU (fori_loop carry methodology)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
from bench_kernels import timeit
import jax, jax.numpy as jnp
import flax.linen as nn
from vispeech_tpu.config import Config
from vispeech_tpu.models.generator import Generator
from vispeech_tpu.ops.resblock import ResBlock1
from vispeech_tpu.ops.pallas.mrf_stage import mrf_stack

cfg = Config(); m = cfg.model
B, T = 8, 1408
DT = jnp.bfloat16

gen = Generator(
    resblock=m.resblock, resblock_kernel_sizes=m.resblock_kernel_sizes,
    resblock_dilation_sizes=m.resblock_dilation_sizes,
    upsample_rates=m.upsample_rates, upsample_initial_channel=m.upsample_initial_channel,
    upsample_kernel_sizes=m.upsample_kernel_sizes, gin_channels=m.gin_channels,
)
z = jax.random.normal(jax.random.PRNGKey(0), (B, T, m.inter_channels), DT)
g = jax.random.normal(jax.random.PRNGKey(1), (B, 1, m.gin_channels), DT)
params = jax.jit(gen.init)(jax.random.PRNGKey(2), z, g)
params = jax.tree_util.tree_map(lambda a: a.astype(DT), params)

dt_f = timeit(lambda z: gen.apply(params, z, g, fused=True), z, n=20)
dt_x = timeit(lambda z: gen.apply(params, z, g, fused=False), z, n=20)
audio_s = B * T * 512 / 44100
print(f"decoder fused: {dt_f:7.2f} ms ({audio_s/dt_f*1e3:6.0f} audio-s/s)")
print(f"decoder xla  : {dt_x:7.2f} ms ({audio_s/dt_x*1e3:6.0f} audio-s/s)")

for i, (tt, ch) in enumerate([(T*8, 256), (T*64, 128), (T*256, 64), (T*512, 32)]):
    x = jax.random.normal(jax.random.PRNGKey(i), (B, tt, ch), DT)
    class Stage(nn.Module):
        fused: bool = False
        @nn.compact
        def __call__(self, x):
            bs = [ResBlock1(ch, rk, tuple(rd), name=f"rb{j}")
                  for j, (rk, rd) in enumerate(zip(m.resblock_kernel_sizes, m.resblock_dilation_sizes))]
            if self.fused:
                packed = tuple(b(x, collect=True) for b in bs)
                return mrf_stack(x, packed, kernel_sizes=tuple(m.resblock_kernel_sizes),
                                 dilations=tuple(tuple(d) for d in m.resblock_dilation_sizes),
                                 interpret=False)
            acc = None
            for b in bs:
                y = b(x)
                acc = y if acc is None else acc + y
            return acc / len(bs)
    st_x = Stage(False); st_f = Stage(True)
    p = jax.jit(st_x.init)(jax.random.PRNGKey(3), x)
    p = jax.tree_util.tree_map(lambda a: a.astype(DT), p)
    flops = 252 * ch * ch * tt * B
    dtx = timeit(lambda x: st_x.apply(p, x), x, n=10)
    line = f"MRF C={ch:4d}: xla {dtx:7.2f} ms ({flops/(dtx/1e3)/1e12:6.1f} TF/s)"
    try:
        dtf = timeit(lambda x: st_f.apply(p, x), x, n=10)
        line += f"   fused {dtf:7.2f} ms ({flops/(dtf/1e3)/1e12:6.1f} TF/s)"
    except Exception as e:
        line += f"   fused FAILED {type(e).__name__}: {e}"
    print(line)

# upsample (transposed conv) stages
from vispeech_tpu.ops.layers import WNConvTranspose1d
chans = [512, 256, 128, 64]
lens = [T, T*8, T*64, T*256]
for i, (u, k) in enumerate(zip(m.upsample_rates, m.upsample_kernel_sizes)):
    cin, tt = chans[i], lens[i]
    cout = cin // 2
    x = jax.random.normal(jax.random.PRNGKey(i), (B, tt, cin), DT)
    up = WNConvTranspose1d(cout, k, u)
    p = jax.jit(up.init)(jax.random.PRNGKey(4), x)
    p = jax.tree_util.tree_map(lambda a: a.astype(DT), p)
    flops = 2 * k * cin * cout * tt * B
    dtu = timeit(lambda x: up.apply(p, x), x, n=10)
    print(f"up{i} k={k:2d} r={u} {cin}->{cout}: {dtu:7.2f} ms ({flops/(dtu/1e3)/1e12:6.1f} TF/s)")
