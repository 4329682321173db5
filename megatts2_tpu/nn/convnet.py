"""1-D convolutional stacks (channels-last, TPU layout).

Parity targets: reference ``modules/convnet.py`` —
* ConvBlock   = activation → dropout(0.1) → Conv1d(same-pad) → LayerNorm(channels)
* ConvStack   = n_blocks sequential ConvBlocks
* ResidualBlockStack = n_stacks × (x = x + stack(x))
* ConvNet     = first conv → residual stacks → last conv
* ConvNetDouble = first conv → n_layers parallel (stack → middle → stack)
  branches SUMMED → last conv, with ONE middle-layer module instance shared
  across branches (``modules/mrte.py:101-118`` passes the same Conv1d to all).

The reference shuttles between (B, D, T) and (B, T, D); here everything is
(B, T, D) throughout — XLA's conv_general_dilated takes channels-last
directly and the MXU sees stacked matmuls.  Padding is explicit
``(k-1)//2`` / ``stride//2`` to match torch semantics exactly (XLA 'SAME'
distributes pad differently for strided convs).
"""
from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

_ACTS: dict[str, Callable] = {
    "ReLU": nn.relu,
    "GELU": nn.gelu,
    "SiLU": nn.silu,
    "Tanh": jnp.tanh,
    "LeakyReLU": lambda x: nn.leaky_relu(x, 0.01),
}


def get_activation(name: str) -> Callable:
    return _ACTS[name]


class ConvBlock(nn.Module):
    hidden_size: int
    kernel_size: int
    activation: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = get_activation(self.activation)(x)
        x = nn.Dropout(0.1)(x, deterministic=deterministic)
        p = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.hidden_size, (self.kernel_size,), padding=[(p, p)], dtype=self.dtype, name="conv"
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x


class ConvStack(nn.Module):
    hidden_size: int
    n_blocks: int
    kernel_size: int
    activation: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for i in range(self.n_blocks):
            x = ConvBlock(
                self.hidden_size, self.kernel_size, self.activation, self.dtype, name=f"blocks_{i}"
            )(x, deterministic)
        return x


class ResidualBlockStack(nn.Module):
    """n_stacks × (x = x + ConvStack(x)).  With ``scan_stacks=True`` the
    identical stacks run under ``nn.scan`` (one compiled body, params
    stacked on a leading depth axis) — cuts trace/compile size ~n_stacks×
    for the conv-heavy MegaG graph; default off for reference-layout
    parameter trees."""

    hidden_size: int
    n_stacks: int
    n_blocks: int
    kernel_size: int
    activation: str
    dtype: Any = jnp.float32
    scan_stacks: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.scan_stacks:
            def body(stack: ConvStack, carry: jnp.ndarray):
                return carry + stack(carry, deterministic), ()

            x, _ = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.n_stacks,
                metadata_params={nn.meta.PARTITION_NAME: None},
            )(
                ConvStack(
                    self.hidden_size, self.n_blocks, self.kernel_size,
                    self.activation, self.dtype, name="conv_stacks",
                ),
                x,
            )
            return x
        for i in range(self.n_stacks):
            x = x + ConvStack(
                self.hidden_size,
                self.n_blocks,
                self.kernel_size,
                self.activation,
                self.dtype,
                name=f"conv_stacks_{i}",
            )(x, deterministic)
        return x


class StridedConvMiddle(nn.Module):
    """Downsampling middle layer: Conv1d(k=stride+1, s=stride, p=stride//2),
    output length ceil-equivalent to the reference (``mrte.py:101-107``)."""

    hidden_size: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.stride // 2
        return nn.Conv(
            self.hidden_size,
            (self.stride + 1,),
            strides=(self.stride,),
            padding=[(p, p)],
            dtype=self.dtype,
            name="conv",
        )(x)


class MaxPoolMiddle(nn.Module):
    """MaxPool1d(stride, ceil_mode=True) equivalent (``vqpe.py:38``)."""

    stride: int

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        T = x.shape[1]
        pad = (-T) % self.stride
        return nn.max_pool(
            x, window_shape=(self.stride,), strides=(self.stride,), padding=((0, pad),)
        )


class ConvNet(nn.Module):
    in_channels: int
    out_channels: int
    hidden_size: int
    n_stacks: int
    n_blocks: int
    kernel_size: int
    activation: str
    dtype: Any = jnp.float32
    scan_stacks: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        p = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.hidden_size, (self.kernel_size,), padding=[(p, p)], dtype=self.dtype,
            name="first_layer",
        )(x)
        x = ResidualBlockStack(
            self.hidden_size, self.n_stacks, self.n_blocks, self.kernel_size, self.activation,
            self.dtype, scan_stacks=self.scan_stacks, name="conv_stack",
        )(x, deterministic)
        x = nn.Conv(
            self.out_channels, (self.kernel_size,), padding=[(p, p)], dtype=self.dtype,
            name="last_layer",
        )(x)
        return x


class ConvNetDoubleLayer(nn.Module):
    hidden_size: int
    n_stacks: int
    n_blocks: int
    kernel_size: int
    activation: str
    dtype: Any = jnp.float32
    scan_stacks: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, middle: Callable, deterministic: bool = True
    ) -> jnp.ndarray:
        x = ResidualBlockStack(
            self.hidden_size, self.n_stacks, self.n_blocks, self.kernel_size, self.activation,
            self.dtype, scan_stacks=self.scan_stacks, name="conv_stack1",
        )(x, deterministic)
        x = middle(x)
        x = ResidualBlockStack(
            self.hidden_size, self.n_stacks, self.n_blocks, self.kernel_size, self.activation,
            self.dtype, scan_stacks=self.scan_stacks, name="conv_stack2",
        )(x, deterministic)
        return x


class ConvNetDouble(nn.Module):
    """n_layers parallel downsampling branches, summed.  ``middle_kind`` is
    'conv' (strided conv, params shared across branches) or 'maxpool'."""

    in_channels: int
    out_channels: int
    hidden_size: int
    n_layers: int
    n_stacks: int
    n_blocks: int
    kernel_size: int
    activation: str
    middle_kind: str = "maxpool"
    middle_stride: int = 8
    dtype: Any = jnp.float32
    scan_stacks: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        p = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.hidden_size, (self.kernel_size,), padding=[(p, p)], dtype=self.dtype,
            name="first_layer",
        )(x)
        if self.middle_kind == "conv":
            middle = StridedConvMiddle(
                self.hidden_size, self.middle_stride, self.dtype, name="middle_layer"
            )
        elif self.middle_kind == "maxpool":
            middle = MaxPoolMiddle(self.middle_stride)
        else:
            raise ValueError(self.middle_kind)
        out = None
        for i in range(self.n_layers):
            y = ConvNetDoubleLayer(
                self.hidden_size, self.n_stacks, self.n_blocks, self.kernel_size, self.activation,
                self.dtype, scan_stacks=self.scan_stacks, name=f"layers_{i}",
            )(x, middle, deterministic)
            out = y if out is None else out + y
        out = nn.Conv(
            self.out_channels, (self.kernel_size,), padding=[(p, p)], dtype=self.dtype,
            name="last_layer",
        )(out)
        return out
