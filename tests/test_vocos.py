"""Vocos iSTFT vocoder family (models/vocos.py + ops/istft.py).

Beyond-parity component (the reference's only vocoder is a pretrained
time-domain HiFi-GAN, ``models/megatts2.py:321-323``): istft must match
``torch.istft`` bit-close, the vocoder must honor HiFiGAN's drop-in
length contract, the full cascade must accept a VocosConfig as its
vocoder, and streaming emission must stay chunk-exact.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from megatts2_tpu.config import VocosConfig
from megatts2_tpu.models import Vocos
from megatts2_tpu.ops.istft import istft

TINY_VOCOS = VocosConfig(dim=16, intermediate_dim=48, num_layers=2)


class TestISTFT:
    @pytest.mark.parametrize("T", [5, 17])
    def test_matches_torch(self, T):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        re = rng.standard_normal((2, T, 513)).astype(np.float32)
        im = rng.standard_normal((2, T, 513)).astype(np.float32)
        ours = np.asarray(istft(jnp.asarray(re), jnp.asarray(im)))
        spec = torch.complex(torch.tensor(re), torch.tensor(im)).transpose(1, 2)
        ref = torch.istft(
            spec, n_fft=1024, hop_length=256, win_length=1024,
            window=torch.hann_window(1024, periodic=True), center=True,
        ).numpy()
        assert ours.shape == ref.shape == (2, (T - 1) * 256)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_stft_roundtrip(self):
        """istft(rfft(framed signal)) recovers the signal (interior)."""
        from megatts2_tpu.ops.mel import _hann_window, frame_signal

        rng = np.random.default_rng(1)
        y = rng.standard_normal((1, 4096)).astype(np.float32)
        frames = frame_signal(jnp.asarray(y)) * jnp.asarray(_hann_window(1024))
        spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
        rec = np.asarray(istft(jnp.real(spec), jnp.imag(spec)))
        np.testing.assert_allclose(rec[0], y[0], atol=1e-4)


class TestVocosModel:
    def test_length_contract_and_finite(self):
        """(B, T, 80) → (B, T*256), same as HiFiGAN."""
        model = Vocos(TINY_VOCOS)
        mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 24, 80)), jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), mel)["params"]
        wav = jax.jit(model.apply)({"params": params}, mel)
        assert wav.shape == (2, 24 * 256)
        assert np.isfinite(np.asarray(wav)).all()

    def test_bf16_matches_fp32_loosely(self):
        mel = jnp.asarray(np.random.default_rng(1).standard_normal((1, 16, 80)), jnp.float32)
        params = jax.jit(Vocos(TINY_VOCOS).init)(jax.random.PRNGKey(0), mel)["params"]
        w32 = np.asarray(jax.jit(Vocos(TINY_VOCOS).apply)({"params": params}, mel))
        w16 = np.asarray(
            jax.jit(Vocos(TINY_VOCOS, dtype=jnp.bfloat16).apply)({"params": params}, mel)
        )
        assert np.isfinite(w16).all()
        # head runs fp32 either way; backbone bf16 noise stays bounded
        assert np.abs(w32 - w16).mean() < 0.1 * (np.abs(w32).mean() + 1e-6)

    def test_grads_flow(self):
        mel = jnp.asarray(np.random.default_rng(2).standard_normal((1, 8, 80)), jnp.float32)
        params = jax.jit(Vocos(TINY_VOCOS).init)(jax.random.PRNGKey(0), mel)["params"]

        def loss(p):
            return jnp.mean(Vocos(TINY_VOCOS).apply(p, mel) ** 2)

        g = jax.jit(jax.grad(lambda p: loss({"params": p})))(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
        assert any(np.abs(np.asarray(x)).max() > 0 for x in leaves)


class TestCascadeWithVocos:
    def _tiny(self):
        from tests.test_streaming import TINY_ADM, TINY_G, TINY_PLM, _cascade_vars

        g_vars, plm_params, adm_params, _ = _cascade_vars()
        vocos_params = jax.jit(Vocos(TINY_VOCOS).init)(
            jax.random.PRNGKey(3), jnp.zeros((1, 16, 80))
        )["params"]
        return g_vars, plm_params, adm_params, vocos_params, TINY_G, TINY_PLM, TINY_ADM

    def test_synthesize_accepts_vocos_cfg(self):
        from megatts2_tpu.models.megatts import synthesize

        g_vars, plm_p, adm_p, voc_p, G, PLM, ADM = self._tiny()
        rng = np.random.RandomState(0)
        phones = rng.randint(1, 40, (1, 8)).astype(np.int32)
        wav, mel_hat, n_frames = synthesize(
            g_vars, plm_p, adm_p, voc_p, G, PLM, ADM, TINY_VOCOS,
            jnp.asarray(phones), jnp.asarray([8]),
            jnp.asarray(rng.randn(1, 64, 80).astype(np.float32)),
            max_frames=64, dtype=jnp.float32,
        )
        assert wav.shape == (1, 64 * 256)
        assert np.isfinite(np.asarray(wav)).all()

    def test_stream_matches_synthesize_vocos(self):
        from megatts2_tpu.models.megatts import synthesize
        from megatts2_tpu.models.streaming import (
            _roundup,
            decoder_rf_frames,
            stream_synthesize,
            vocoder_rf_frames,
        )
        from tests.test_streaming import TINY_G

        g_vars, plm_p, adm_p, voc_p, G, PLM, ADM = self._tiny()
        rng = np.random.RandomState(0)
        Tp = 48
        phones = rng.randint(1, 40, (1, Tp)).astype(np.int32)
        lens = np.full((1,), Tp, np.int32)
        mels = rng.randn(1, 64, 80).astype(np.float32)

        F = 32
        rv = _roundup(vocoder_rf_frames(TINY_VOCOS), 8)
        rd = _roundup(decoder_rf_frames(TINY_G), 8)
        max_frames = max(_roundup(96, F), F + 2 * (rv + rd))

        chunks = list(
            stream_synthesize(
                g_vars, plm_p, adm_p, voc_p, G, PLM, ADM, TINY_VOCOS,
                phones, lens, mels, max_frames=max_frames, chunk_frames=F,
                dtype=jnp.float32,
            )
        )
        assert len(chunks) >= 2
        streamed = np.concatenate(chunks)
        wav_full, _, n_frames = synthesize(
            g_vars, plm_p, adm_p, voc_p, G, PLM, ADM, TINY_VOCOS,
            jnp.asarray(phones), jnp.asarray(lens), jnp.asarray(mels),
            max_frames=max_frames, dtype=jnp.float32,
        )
        total = int(np.asarray(n_frames)[0]) * 256
        assert streamed.shape[0] == total
        np.testing.assert_allclose(
            streamed, np.asarray(wav_full)[0, :total], rtol=1e-4, atol=1e-4
        )

    def test_continuous_engine_with_vocos(self):
        from megatts2_tpu.continuous import ContinuousEngine
        from megatts2_tpu.models.megatts import synthesize

        g_vars, plm_p, adm_p, voc_p, G, PLM, ADM = self._tiny()
        rng = np.random.RandomState(2)
        tp = 24
        req = {
            "id": "r0",
            "phone": rng.randint(1, 40, (1, tp)).astype(np.int32),
            "lens": np.full((1,), tp, np.int32),
            "mels_prompt": rng.randn(1, 64, 80).astype(np.float32),
        }
        eng = ContinuousEngine(
            g_vars, plm_p, adm_p, voc_p, G, PLM, ADM, TINY_VOCOS,
            slots=1, max_frames=96, chunk_frames=32, dtype=jnp.float32,
        )
        got = dict(eng.run([req]))
        Tp = -(-tp // 16) * 16
        phone = np.zeros((1, Tp), np.int32)
        phone[0, :tp] = req["phone"][0]
        wav_full, _, n_frames = synthesize(
            g_vars, plm_p, adm_p, voc_p, G, PLM, ADM, TINY_VOCOS,
            jnp.asarray(phone), jnp.asarray(req["lens"]),
            jnp.asarray(req["mels_prompt"]),
            max_frames=eng.Tmax, dtype=jnp.float32,
        )
        total = int(np.asarray(n_frames)[0]) * 256
        assert got["r0"].shape[0] == total
        np.testing.assert_allclose(
            got["r0"], np.asarray(wav_full)[0, :total], rtol=1e-4, atol=1e-4
        )


class TestISTFTWinShorterThanFFT:
    def test_win_pad_branch_matches_torch(self):
        """win_length < n_fft pads the window symmetrically (same as
        torch.istft)."""
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(3)
        T = 9
        re = rng.standard_normal((1, T, 257)).astype(np.float32)
        im = rng.standard_normal((1, T, 257)).astype(np.float32)
        ours = np.asarray(istft(jnp.asarray(re), jnp.asarray(im),
                                n_fft=512, hop=128, win_length=384))
        spec = torch.complex(torch.tensor(re), torch.tensor(im)).transpose(1, 2)
        ref = torch.istft(
            spec, n_fft=512, hop_length=128, win_length=384,
            window=torch.hann_window(384, periodic=True), center=True,
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestVocoderCkptRoundTrip:
    def test_orbax_vocoder_ckpt_loads_into_vocos(self, tmp_path):
        """The serving path: a vocoder-stage orbax checkpoint restores and
        runs through the Vocos generator (load_vocoder_from_orbax)."""
        from megatts2_tpu.training.checkpoints import (
            load_vocoder_from_orbax,
            save_checkpoint,
        )

        params = jax.jit(Vocos(TINY_VOCOS).init)(
            jax.random.PRNGKey(7), jnp.zeros((1, 8, 80))
        )["params"]
        ck = str(tmp_path / "ck")
        save_checkpoint(ck, {"g_params": params, "d_params": {}, "step": 5}, 5)
        loaded = load_vocoder_from_orbax(ck)
        mel = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 80)),
                          jnp.float32)
        a = np.asarray(Vocos(TINY_VOCOS).apply({"params": params}, mel))
        b = np.asarray(Vocos(TINY_VOCOS).apply({"params": loaded}, mel))
        np.testing.assert_array_equal(a, b)
