"""Piecewise monotone rational-quadratic spline with linear tails.

Implements the transform of Durkan et al., "Neural Spline Flows" (2019) —
forward, inverse, and log|det J| — fully vectorized for jit (no data-dependent
control flow; out-of-interval elements pass through the identity tails).
Behavioral contract matches reference transforms.py:12-193 (same min bin
width/height 1e-3, min derivative 1e-3, linear tails, tail_bound).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def _searchsorted_lastdim(bins: Array, x: Array) -> Array:
    """index of the bin containing x: sum(bins <= x) - 1, clamped."""
    idx = jnp.sum((bins <= x[..., None]).astype(jnp.int32), axis=-1) - 1
    return jnp.clip(idx, 0, bins.shape[-1] - 2)


def rational_quadratic_spline(
    inputs: Array,
    unnormalized_widths: Array,
    unnormalized_heights: Array,
    unnormalized_derivatives: Array,
    inverse: bool = False,
    left: float = 0.0,
    right: float = 1.0,
    bottom: float = 0.0,
    top: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[Array, Array]:
    """inputs [...], parameters [..., K] / [..., K+1] → (outputs, logabsdet)."""
    num_bins = unnormalized_widths.shape[-1]

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (right - left) * cumwidths + left
    cumwidths = cumwidths.at[..., 0].set(left)
    cumwidths = cumwidths.at[..., -1].set(right)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights, [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (top - bottom) * cumheights + bottom
    cumheights = cumheights.at[..., 0].set(bottom)
    cumheights = cumheights.at[..., -1].set(top)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    bin_idx = _searchsorted_lastdim(cumheights if inverse else cumwidths, inputs)

    take = lambda a: jnp.take_along_axis(a, bin_idx[..., None], axis=-1)[..., 0]
    input_cumwidths = take(cumwidths)
    input_bin_widths = take(widths)
    input_cumheights = take(cumheights)
    input_heights = take(heights)
    delta = heights / widths
    input_delta = take(delta)
    input_derivatives = take(derivatives)
    input_derivatives_p1 = take(derivatives[..., 1:])

    if inverse:
        a = (inputs - input_cumheights) * (
            input_derivatives + input_derivatives_p1 - 2 * input_delta
        ) + input_heights * (input_delta - input_derivatives)
        b = input_heights * input_derivatives - (inputs - input_cumheights) * (
            input_derivatives + input_derivatives_p1 - 2 * input_delta
        )
        c = -input_delta * (inputs - input_cumheights)
        discriminant = b * b - 4 * a * c
        # clamp: numerical safety, mathematically discriminant >= 0
        root = 2 * c / (-b - jnp.sqrt(jnp.maximum(discriminant, 0.0)))
        outputs = root * input_bin_widths + input_cumwidths

        theta_one_minus_theta = root * (1 - root)
        denominator = input_delta + (
            (input_derivatives + input_derivatives_p1 - 2 * input_delta)
            * theta_one_minus_theta
        )
        derivative_numerator = input_delta**2 * (
            input_derivatives_p1 * root**2
            + 2 * input_delta * theta_one_minus_theta
            + input_derivatives * (1 - root) ** 2
        )
        logabsdet = -(jnp.log(derivative_numerator) - 2 * jnp.log(denominator))
        return outputs, logabsdet

    theta = (inputs - input_cumwidths) / input_bin_widths
    theta_one_minus_theta = theta * (1 - theta)
    numerator = input_heights * (
        input_delta * theta**2 + input_derivatives * theta_one_minus_theta
    )
    denominator = input_delta + (
        (input_derivatives + input_derivatives_p1 - 2 * input_delta)
        * theta_one_minus_theta
    )
    outputs = input_cumheights + numerator / denominator
    derivative_numerator = input_delta**2 * (
        input_derivatives_p1 * theta**2
        + 2 * input_delta * theta_one_minus_theta
        + input_derivatives * (1 - theta) ** 2
    )
    logabsdet = jnp.log(derivative_numerator) - 2 * jnp.log(denominator)
    return outputs, logabsdet


def unconstrained_rational_quadratic_spline(
    inputs: Array,
    unnormalized_widths: Array,
    unnormalized_heights: Array,
    unnormalized_derivatives: Array,
    inverse: bool = False,
    tail_bound: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[Array, Array]:
    """Linear tails outside [−tail_bound, tail_bound] (identity, logdet 0)."""
    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)

    constant = jnp.log(jnp.expm1(1 - min_derivative))
    unnormalized_derivatives = jnp.pad(
        unnormalized_derivatives,
        [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)],
        constant_values=constant,
    )

    # clamp out-of-interval inputs into range to keep spline math finite,
    # then select the identity for them
    safe_inputs = jnp.clip(inputs, -tail_bound, tail_bound)
    outputs_in, logabsdet_in = rational_quadratic_spline(
        safe_inputs,
        unnormalized_widths,
        unnormalized_heights,
        unnormalized_derivatives,
        inverse=inverse,
        left=-tail_bound,
        right=tail_bound,
        bottom=-tail_bound,
        top=tail_bound,
        min_bin_width=min_bin_width,
        min_bin_height=min_bin_height,
        min_derivative=min_derivative,
    )
    outputs = jnp.where(inside, outputs_in, inputs)
    logabsdet = jnp.where(inside, logabsdet_in, 0.0)
    return outputs, logabsdet


def piecewise_rational_quadratic_transform(
    inputs,
    unnormalized_widths,
    unnormalized_heights,
    unnormalized_derivatives,
    inverse=False,
    tails=None,
    tail_bound=1.0,
    min_bin_width=DEFAULT_MIN_BIN_WIDTH,
    min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
    min_derivative=DEFAULT_MIN_DERIVATIVE,
):
    """Dispatcher mirroring reference transforms.py:12-43."""
    if tails is None:
        return rational_quadratic_spline(
            inputs, unnormalized_widths, unnormalized_heights,
            unnormalized_derivatives, inverse=inverse,
            min_bin_width=min_bin_width, min_bin_height=min_bin_height,
            min_derivative=min_derivative,
        )
    assert tails == "linear", f"unsupported tails: {tails}"
    return unconstrained_rational_quadratic_spline(
        inputs, unnormalized_widths, unnormalized_heights,
        unnormalized_derivatives, inverse=inverse, tail_bound=tail_bound,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        min_derivative=min_derivative,
    )
