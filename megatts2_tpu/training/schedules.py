"""Optax LR schedules matching the reference's
``transformers.get_cosine_schedule_with_warmup`` (models/trainer.py:63-68):
linear warmup to ``lr`` over ``warmup_steps``, then cosine decay to 0 at
``total_steps`` (num_cycles=0.5).  The GAN stage passes
``total_steps = max_steps // 2`` exactly as the reference does.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def cosine_schedule_with_warmup(
    lr: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.maximum(1.0, float(warmup_steps))
        warmup_factor = step / warm
        progress = (step - warmup_steps) / jnp.maximum(
            1.0, float(total_steps - warmup_steps)
        )
        cos_factor = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * progress)))
        return lr * jnp.where(step < warmup_steps, warmup_factor, cos_factor)

    return schedule


def make_adamw(
    lr: float,
    warmup_steps: int,
    total_steps: int,
    weight_decay: float = 0.01,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """AdamW with the cosine-warmup schedule (torch AdamW defaults:
    betas=(0.9, 0.999), eps=1e-8, weight_decay=0.01)."""
    return optax.adamw(
        learning_rate=cosine_schedule_with_warmup(lr, warmup_steps, total_steps),
        b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
    )
