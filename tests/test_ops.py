"""Unit tests for core ops: masks, length regulator, mel extraction."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from megatts2_tpu.ops import (
    make_attn_mask,
    make_pad_mask,
    mel_filterbank,
    mel_spectrogram,
    num_frames,
    regulate_length,
)
from megatts2_tpu.ops.masks import NEG_INF


class TestMasks:
    def test_pad_mask(self):
        m = make_pad_mask(jnp.array([2, 4]), 4)
        np.testing.assert_array_equal(
            np.asarray(m), [[False, False, True, True], [False] * 4]
        )

    def test_attn_mask_padding(self):
        m = make_attn_mask(jnp.array([2, 3]), 3)
        assert m.shape == (2, 1, 3, 3)
        # batch 0: key 2 masked for all queries
        assert float(m[0, 0, 0, 2]) == NEG_INF
        assert float(m[0, 0, 0, 1]) == 0.0
        assert float(m[1, 0, 2, 2]) == 0.0

    def test_attn_mask_causal(self):
        m = make_attn_mask(jnp.array([3, 3]), 3, causal=True)
        a = np.asarray(m[0, 0])
        assert a[0, 1] == NEG_INF and a[1, 0] == 0.0 and a[2, 2] == 0.0


class TestLengthRegulator:
    def test_matches_alignment_matmul(self):
        """Cross-check against the dense alignment-matrix semantics of the
        reference (mrte.py:23-31) computed here in numpy."""
        rng = np.random.RandomState(0)
        B, Tin, D = 2, 5, 7
        x = rng.randn(B, Tin, D).astype(np.float32)
        dur = np.array([[1, 2, 3, 0, 4], [2, 0, 1, 1, 1]], np.int32)
        max_out = 12
        # dense reference semantics
        expect = np.zeros((B, max_out, D), np.float32)
        for b in range(B):
            count = 0
            for j in range(Tin):
                for k in range(dur[b, j]):
                    expect[b, count + k] = x[b, j]
                count += dur[b, j]
        got = np.asarray(regulate_length(jnp.asarray(x), jnp.asarray(dur), max_out))
        np.testing.assert_allclose(got, expect, atol=1e-6)

    def test_reference_shape_case(self):
        # mirror of reference test (mrte.py:186-194): durations sum 10 / 11
        x = jnp.asarray(np.random.randn(2, 4, 8).astype(np.float32))
        dur = jnp.asarray([[1, 2, 3, 4], [1, 2, 3, 5]])
        out = regulate_length(x, dur, 11)
        assert out.shape == (2, 11, 8)
        assert float(jnp.abs(out[0, 10]).sum()) == 0.0  # beyond total → zeros


class TestMel:
    def test_filterbank_vs_torch_stft_pipeline(self):
        """Golden parity with the reference mel front-end, reconstructed from
        primitive torch ops (torch.stft + slaney fbanks) — the same ops
        torchaudio MelSpectrogram/speechbrain call underneath."""
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(1)
        n = 16000
        y = (rng.randn(n) * 0.1).astype(np.float32)

        spec = torch.stft(
            torch.from_numpy(y),
            n_fft=1024,
            hop_length=256,
            win_length=1024,
            window=torch.hann_window(1024),
            center=True,
            pad_mode="reflect",
            normalized=False,
            onesided=True,
            return_complex=True,
        ).abs()  # (freq, time) magnitude, power=1
        fb = torch.from_numpy(mel_filterbank())  # (freq, mel)
        ref = torch.log(torch.clamp(fb.T @ spec, min=1e-5)).numpy().T  # (T, mel)

        got = np.asarray(mel_spectrogram(jnp.asarray(y)))
        assert got.shape == ref.shape == (num_frames(n), 80)
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)

    def test_batched(self):
        y = jnp.asarray(np.random.RandomState(2).randn(2, 4096).astype(np.float32))
        m = mel_spectrogram(y)
        assert m.shape == (2, num_frames(4096), 80)

    def test_filterbank_rows_nonneg(self):
        fb = mel_filterbank()
        assert fb.shape == (513, 80)
        assert (fb >= 0).all()
        # every filter has support
        assert (fb.sum(0) > 0).all()
