"""Multi-window LSGAN mel discriminator.

Parity target: reference ``modules/dscrm.py`` (SyntaSpeech lineage):
``SingleWindowDisc`` = 3 × [Conv2d stride-2 → LeakyReLU(0.2) → Dropout2d(0.25)
→ BatchNorm2d (first two blocks only; the reference passes 0.8 positionally
into BatchNorm2d's *eps*)] → flatten → Linear → 1 validity scalar.
``MultiWindowDiscriminator`` clips random windows of 32/64/128 frames (the
same start frame for the whole batch) and sums the per-window validities.

TPU-first departures:
* Window starts are sampled OUTSIDE the module (pass ``starts``, one per
  window length) so the module stays a pure function.
* Window-doesn't-fit semantics: the reference's skip path
  (``dscrm.py:78-84`` → return ``None``) is unreachable as committed — its
  ``clip`` *asserts* ``x_len.max() - win_length >= 0`` (``dscrm.py:102``)
  and crashes on short batches.  Under jit we can neither crash nor return
  None, so pass ``max_true_len`` (longest un-padded mel in the batch) and
  any window longer than it contributes ZERO validity — the discriminator
  never scores zero-padding, and losses/grads are invariant to pad content.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import DiscriminatorConfig


class SingleWindowDisc(nn.Module):
    time_length: int
    freq_length: int = 80
    kernel: tuple = (3, 3)
    c_in: int = 1
    hidden_size: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        """x: (B, T, F, C) channels-last → (validity (B, 1), hiddens)."""
        h = []
        pad = ((self.kernel[0] // 2,) * 2, (self.kernel[1] // 2,) * 2)
        for i in range(3):
            x = nn.Conv(
                self.hidden_size, self.kernel, strides=(2, 2), padding=pad,
                dtype=self.dtype, name=f"conv_{i}",
            )(x)
            x = nn.leaky_relu(x, 0.2)
            x = nn.Dropout(0.25, broadcast_dims=(1, 2))(x, deterministic=not train)
            if i < 2:
                x = nn.BatchNorm(
                    use_running_average=not train, epsilon=0.8, momentum=0.9,
                    dtype=self.dtype, name=f"bn_{i}",
                )(x)
            h.append(x)
        x = x.reshape(x.shape[0], -1)
        validity = nn.Dense(1, dtype=self.dtype, name="adv_layer")(x)
        return validity, h


class Discriminator(nn.Module):
    cfg: DiscriminatorConfig = DiscriminatorConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        mel: jnp.ndarray,  # (B, T, 80)
        starts: Optional[Sequence] = None,  # per-window start frames (ints)
        train: bool = False,
        max_true_len: Optional[jnp.ndarray] = None,  # longest un-padded mel
    ):
        c = self.cfg
        validity = None
        hiddens = []
        if starts is None:
            starts = [0] * len(c.time_lengths)
        x = mel[..., None].astype(self.dtype)  # (B, T, F, 1)
        for i, (wl, s) in enumerate(zip(c.time_lengths, starts)):
            clip = jax.lax.dynamic_slice_in_dim(x, s, wl, axis=1)
            v, h = SingleWindowDisc(
                time_length=wl,
                freq_length=c.freq_length,
                kernel=c.kernel,
                c_in=c.c_in,
                hidden_size=c.hidden_size,
                dtype=self.dtype,
                name=f"disc_{i}",
            )(clip, train=train)
            if max_true_len is not None:
                # window longer than every true mel → would only see padding;
                # exclude it from the validity sum (see module docstring)
                v = jnp.where(wl <= max_true_len, v, jnp.zeros_like(v))
            validity = v if validity is None else validity + v
            hiddens.extend(h)
        return {"y": validity, "h": hiddens}
