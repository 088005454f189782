"""Primitive layers: channels-last 1-D convolutions (plain / weight-norm /
transposed), layer norm, and torch-compatible initializers.

Torch-compatible initialization keeps from-scratch training statistically
equivalent to the reference (torch Conv1d default = kaiming-uniform(a=√5),
i.e. U(±1/√fan_in); reference relies on it everywhere except where noted).
Parameter structure of weight-normalized convs is (v, g) with w = g·v/‖v‖,
matching torch.nn.utils.weight_norm so reference checkpoints can be mapped
parameter-for-parameter (reference modules.py:111-184, models.py:244-297).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vispeech_tpu.ops.precision import get_matmul_precision

Array = jax.Array

# dimension numbers for [B, T, C] convs with kernels [K, Cin, Cout]
DIMENSION_NUMBERS = ("NHC", "HIO", "NHC")


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """U(±√(1/fan_in)) — torch Conv default (kaiming_uniform with a=√5)."""
    k, cin, _ = shape
    bound = math.sqrt(1.0 / (k * cin))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init(fan_in: int) -> Callable:
    bound = math.sqrt(1.0 / fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal_init(std: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


class Conv1d(nn.Module):
    """Channels-last 1-D convolution with explicit SAME-style padding.

    features: output channels; kernel dilation/stride as in torch.Conv1d.
    padding: int (symmetric) or (left, right); defaults to the torch-style
    (k·d − d)//2 symmetric padding used throughout the reference.
    """

    features: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1
    padding: Optional[Tuple[int, int]] = None
    feature_group_count: int = 1
    use_bias: bool = True
    kernel_init: Callable = torch_conv_kernel_init
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        kshape = (self.kernel_size, cin // self.feature_group_count, self.features)
        kernel = self.param("kernel", self.kernel_init, kshape)
        if self.padding is None:
            p = (self.kernel_size * self.dilation - self.dilation) // 2
            padding = ((p, p),)
        elif isinstance(self.padding, int):
            padding = ((self.padding, self.padding),)
        else:
            padding = (tuple(self.padding),)
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(self.stride,),
            padding=padding,
            rhs_dilation=(self.dilation,),
            dimension_numbers=DIMENSION_NUMBERS,
            feature_group_count=self.feature_group_count,
            precision=get_matmul_precision(),
        )
        if self.use_bias:
            binit = self.bias_init or torch_conv_bias_init(
                cin // self.feature_group_count * self.kernel_size
            )
            bias = self.param("bias", binit, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def _weight_norm(v: Array, g: Array) -> Array:
    """w = g · v/‖v‖ with the norm over (k, cin) per output channel.

    The norm accumulates in float32 even under the bf16 training policy
    (torch autocast equally computes weight_norm on fp32 master weights)."""
    vf = v.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(vf), axis=(0, 1), keepdims=True) + 1e-12)
    w = vf * (g.astype(jnp.float32)[None, None, :] / norm)
    return w.astype(v.dtype)


class WNConv1d(nn.Module):
    """Weight-normalized Conv1d (torch.nn.utils.weight_norm layout: v, g).

    ``effective_weights(cin)`` exposes the normalized kernel + bias so fused
    Pallas paths (ops/pallas/wn_stack.py) can consume the exact same
    parameters the XLA path trains.
    """

    features: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1
    padding: Optional[Tuple[int, int]] = None
    feature_group_count: int = 1
    use_bias: bool = True
    kernel_init: Callable = torch_conv_kernel_init

    @nn.compact
    def effective_weights(self, cin: int) -> Tuple[Array, Optional[Array]]:
        """(normalized kernel [k, cin, cout], bias [cout] or None)."""
        kshape = (self.kernel_size, cin // self.feature_group_count, self.features)
        v = self.param("v", self.kernel_init, kshape)
        g = self.param(
            "g",
            lambda key, shape: jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1))),
            (self.features,),
        )
        kernel = _weight_norm(v, g)
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias",
                torch_conv_bias_init(cin // self.feature_group_count * self.kernel_size),
                (self.features,),
            )
        return kernel, bias

    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        kernel, bias = self.effective_weights(cin)
        if self.padding is None:
            p = (self.kernel_size * self.dilation - self.dilation) // 2
            padding = ((p, p),)
        elif isinstance(self.padding, int):
            padding = ((self.padding, self.padding),)
        else:
            padding = (tuple(self.padding),)
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(self.stride,),
            padding=padding,
            rhs_dilation=(self.dilation,),
            dimension_numbers=DIMENSION_NUMBERS,
            feature_group_count=self.feature_group_count,
            precision=get_matmul_precision(),
        )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class WNConvTranspose1d(nn.Module):
    """Weight-normalized transposed 1-D conv (HiFi-GAN upsampler stage).

    Matches torch.ConvTranspose1d(k, stride=u, padding=(k−u)//2) output length
    T·u (reference models.py:253-257).  Implemented as lax.conv_transpose with
    the torch padding convention.
    """

    features: int
    kernel_size: int
    stride: int
    kernel_init: Callable = normal_init(0.01)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        # v layout [k, cin, cout], stored spatially *flipped* relative to the
        # torch ConvTranspose weight so the forward pass is a plain dilated
        # conv; torch weight-norm on ConvTranspose is per *input* channel
        # (dim=0 of [cin, cout, k]) → norm over axes (0, 2) here.
        v = self.param("v", self.kernel_init, (self.kernel_size, cin, self.features))
        g = self.param(
            "g",
            lambda key, shape: jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 2))),
            (cin,),
        )
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 2), keepdims=True) + 1e-12)
        kernel = v * (g[None, :, None] / norm)

        p = (self.kernel_size - self.stride) // 2
        # ConvTranspose(stride=u, padding=p) ≡ zero-stuff the input by u
        # (lhs_dilation) then correlate with the flipped kernel under
        # (k−1−p) padding — verified element-exact against torch.
        pad = self.kernel_size - 1 - p
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(1,),
            padding=((pad, pad),),
            lhs_dilation=(self.stride,),
            dimension_numbers=DIMENSION_NUMBERS,
            precision=get_matmul_precision(),
        )
        bias = self.param(
            "bias", torch_conv_bias_init(cin * self.kernel_size // self.stride),
            (self.features,),
        )
        return y + bias.astype(y.dtype)


class LayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis, eps=1e-5 (reference modules.py:20-32).

    The reference transposes to apply F.layer_norm over channels; in [B, T, C]
    layout it is simply the last axis — no transposes on TPU.
    """

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * gamma + beta).astype(x.dtype)
