"""Full HiFi-GAN generator parity: our flax vocoder vs a functional torch
reconstruction (conv_pre → leaky/ConvTranspose ups → MRF resblocks avg →
conv_post → tanh) sharing the same weights — the standard V1 graph the
speechbrain checkpoint expects."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from megatts2_tpu.config import HiFiGANConfig
from megatts2_tpu.models import HiFiGAN

CFG = HiFiGANConfig(
    in_channels=8,
    upsample_initial_channel=16,
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 2), (1, 3)),
    lrelu_slope=0.1,
)


def t(a):
    return torch.from_numpy(np.asarray(a).copy())


def conv1d(p, x, dilation=1, padding=0):
    w = t(p["kernel"]).permute(2, 1, 0)
    return torch.nn.functional.conv1d(
        x, w, t(p["bias"]), dilation=dilation, padding=padding
    )


def tconv1d(p, x, k, s):
    # our kernel (k, in, out) flipped = torch ConvTranspose1d weight (in, out, k)
    w = t(np.asarray(p["kernel"])[::-1].copy()).permute(1, 2, 0)
    return torch.nn.functional.conv_transpose1d(
        x, w, t(p["bias"]), stride=s, padding=(k - s) // 2
    )


class TestHiFiGANParity:
    def test_generator_matches_torch(self):
        rng = np.random.RandomState(0)
        mel = rng.randn(2, 20, CFG.in_channels).astype(np.float32)
        model = HiFiGAN(CFG)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(mel))
        ours = np.asarray(model.apply(variables, jnp.asarray(mel)))

        p = variables["params"]
        lr = CFG.lrelu_slope
        x = torch.from_numpy(mel).transpose(1, 2)  # (B, C, T)
        x = conv1d(p["conv_pre"], x, padding=3)
        n_k = len(CFG.resblock_kernel_sizes)
        for i, (r, k) in enumerate(zip(CFG.upsample_rates, CFG.upsample_kernel_sizes)):
            x = torch.nn.functional.leaky_relu(x, lr)
            x = tconv1d(p[f"ups_{i}"], x, k, r)
            acc = None
            for j, (rk, rd) in enumerate(
                zip(CFG.resblock_kernel_sizes, CFG.resblock_dilation_sizes)
            ):
                rb = p[f"resblocks_{i * n_k + j}"]
                y = x
                for m, d in enumerate(rd):
                    z = torch.nn.functional.leaky_relu(y, lr)
                    z = conv1d(rb[f"convs1_{m}"], z, dilation=d, padding=(rk - 1) * d // 2)
                    z = torch.nn.functional.leaky_relu(z, lr)
                    z = conv1d(rb[f"convs2_{m}"], z, padding=(rk - 1) // 2)
                    y = y + z
                acc = y if acc is None else acc + y
            x = acc / n_k
        x = torch.nn.functional.leaky_relu(x, lr)
        x = conv1d(p["conv_post"], x, padding=3)
        ref = torch.tanh(x)[:, 0].numpy()

        assert ours.shape == ref.shape == (2, 20 * 4 * 2)
        np.testing.assert_allclose(ours, ref, atol=3e-5)
