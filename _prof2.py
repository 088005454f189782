import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
from bench_kernels import timeit
import jax, jax.numpy as jnp
from vispeech_tpu.config import Config
from vispeech_tpu.models.generator import Generator

cfg = Config(); m = cfg.model
B, T = 8, 1408
DT = jnp.bfloat16
gen = Generator(resblock=m.resblock, resblock_kernel_sizes=m.resblock_kernel_sizes,
    resblock_dilation_sizes=m.resblock_dilation_sizes, upsample_rates=m.upsample_rates,
    upsample_initial_channel=m.upsample_initial_channel, upsample_kernel_sizes=m.upsample_kernel_sizes,
    gin_channels=m.gin_channels)
z = jax.random.normal(jax.random.PRNGKey(0), (B, T, m.inter_channels), DT)
g = jax.random.normal(jax.random.PRNGKey(1), (B, 1, m.gin_channels), DT)
params = jax.jit(gen.init)(jax.random.PRNGKey(2), z, g)
params = jax.tree_util.tree_map(lambda a: a.astype(DT), params)
audio_s = B * T * 512 / 44100
dt_f = timeit(lambda z: gen.apply(params, z, g, fused=True), z, n=20)
print(f"decoder fused(new policy): {dt_f:7.2f} ms ({audio_s/dt_f*1e3:6.0f} audio-s/s)")
