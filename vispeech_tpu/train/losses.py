"""GAN + VAE losses (reference losses.py:7-61, train.py:195-218).

All losses computed in float32 regardless of compute dtype — the reference
keeps loss math out of autocast (train.py:197,209).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def feature_loss(fmap_r: Sequence[Sequence[Array]], fmap_g: Sequence[Sequence[Array]]) -> Array:
    """2 × Σ mean|sg(real_fmap) − fake_fmap| (reference losses.py:7-15)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            rl = jax.lax.stop_gradient(rl.astype(jnp.float32))
            loss += jnp.mean(jnp.abs(rl - gl.astype(jnp.float32)))
    return loss * 2.0


def discriminator_loss(
    disc_real: Sequence[Array], disc_fake: Sequence[Array]
) -> Tuple[Array, List[Array], List[Array]]:
    """LSGAN discriminator loss (reference losses.py:18-31)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real, disc_fake):
        r_loss = jnp.mean(jnp.square(1.0 - dr.astype(jnp.float32)))
        g_loss = jnp.mean(jnp.square(dg.astype(jnp.float32)))
        loss += r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(disc_fake: Sequence[Array]) -> Tuple[Array, List[Array]]:
    """LSGAN generator adversarial loss (reference losses.py:34-43)."""
    loss = 0.0
    gen_losses = []
    for dg in disc_fake:
        l = jnp.mean(jnp.square(1.0 - dg.astype(jnp.float32)))
        gen_losses.append(l)
        loss += l
    return loss, gen_losses


def kl_loss(z_p: Array, logs_q: Array, m_p: Array, logs_p: Array, z_mask: Array) -> Array:
    """Masked KL(q‖p) on flow-mapped posterior samples (reference losses.py:46-61)."""
    z_p = z_p.astype(jnp.float32)
    logs_q = logs_q.astype(jnp.float32)
    m_p = m_p.astype(jnp.float32)
    logs_p = logs_p.astype(jnp.float32)
    z_mask = z_mask.astype(jnp.float32)
    kl = logs_p - logs_q - 0.5
    kl += 0.5 * jnp.square(z_p - m_p) * jnp.exp(-2.0 * logs_p)
    return jnp.sum(kl * z_mask) / jnp.sum(z_mask)
