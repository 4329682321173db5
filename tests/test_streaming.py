"""Streaming synthesis (models/streaming.py): chunked PLM decode +
RF-padded windowed mel-decode/vocode must reproduce the one-shot
``synthesize`` output exactly (interior AND sequence edges), and the RF
helpers must upper-bound the real receptive fields.
"""
import jax
import jax.numpy as jnp
import numpy as np

from megatts2_tpu.config import (
    HiFiGANConfig,
    MegaADMConfig,
    MegaGConfig,
    MegaPLMConfig,
    MRTEConfig,
    VQPEConfig,
)
from megatts2_tpu.models import HiFiGAN, MegaADM, MegaG, MegaPLM
from megatts2_tpu.models.megatts import synthesize
from megatts2_tpu.models.streaming import (
    decoder_rf_frames,
    hifigan_rf_frames,
    stream_synthesize,
)

TINY_G = MegaGConfig(
    mrte=MRTEConfig(
        mel_bins=80, mel_stride=4, mel_n_layer=1, mel_n_stack=1, mel_n_block=1,
        content_ff_dim=32, content_n_heads=2, content_n_layers=1, hidden_size=16,
        phone_vocab_size=40, dropout=0.0,
    ),
    vqpe=VQPEConfig(
        mel_bins=20, stride=8, hidden_size=16, kernel_size=3, n_layers=1,
        n_stacks=1, n_blocks=1, vq_bins=32, vq_dim=8,
    ),
    kernel_size=3, hidden_size=16, decoder_n_stack=1, decoder_n_block=1,
)
TINY_PLM = MegaPLMConfig(
    n_layers=1, n_heads=2, vq_dim=8, tc_latent_dim=16, vq_bins=32,
    dropout=0.0, use_flash=False,
)
TINY_ADM = MegaADMConfig(
    n_layers=1, n_heads=2, emb_dim=8, tc_latent_dim=16, tc_emb_dim=8, dropout=0.0
)
TINY_HIFI = HiFiGANConfig(
    upsample_initial_channel=32,
    upsample_rates=(8, 8, 2, 2),
    upsample_kernel_sizes=(16, 16, 4, 4),
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
    space_to_depth_ch=0,
)


def _cascade_vars():
    key = jax.random.PRNGKey(0)
    Tp = 6
    g_vars = jax.jit(MegaG(TINY_G).init)(
        {"params": key, "vq": key},
        jnp.ones((1, Tp), jnp.int32), jnp.zeros((1, Tp), jnp.int32),
        jnp.asarray([Tp]), jnp.zeros((1, 64, 80)), jnp.zeros((1, 64, 80)),
    )
    plm_params = jax.jit(MegaPLM(TINY_PLM).init)(
        key, jnp.zeros((1, 4, 16)), jnp.zeros((1, 5), jnp.int32), jnp.asarray([4])
    )["params"]
    adm_params = jax.jit(MegaADM(TINY_ADM).init)(
        key, jnp.zeros((1, 4, 16)), jnp.zeros((1, 5, 1)), jnp.asarray([4])
    )["params"]
    hifi_params = jax.jit(HiFiGAN(TINY_HIFI).init)(key, jnp.zeros((1, 16, 80)))[
        "params"
    ]
    return g_vars, plm_params, adm_params, hifi_params


class TestRFHelpers:
    def test_decoder_rf(self):
        # k=3 → 1/conv; 1 stack × 1 block + first + last = 3 convs
        assert decoder_rf_frames(TINY_G) == 3
        assert decoder_rf_frames(MegaGConfig()) == 20  # k=5, 4×2+2 convs

    def test_hifigan_rf_positive_and_small(self):
        r = hifigan_rf_frames(HiFiGANConfig())
        assert 4 <= r <= 64, r  # sane one-sided bound in mel frames


class TestStreamEqualsFull:
    def test_stream_matches_synthesize(self):
        g_vars, plm_params, adm_params, hifi_params = _cascade_vars()
        rng = np.random.RandomState(0)
        # random-weight ADM predicts ≈1 frame/phone (clamp floor), so many
        # phones guarantee the stream spans several chunks and seams
        Tp = 48
        phones = rng.randint(1, 40, (1, Tp)).astype(np.int32)
        lens = np.full((1,), Tp, np.int32)
        mels = rng.randn(1, 64, 80).astype(np.float32)

        F = 32
        from megatts2_tpu.models.streaming import _roundup

        rv = _roundup(hifigan_rf_frames(TINY_HIFI), 8)
        rd = _roundup(decoder_rf_frames(TINY_G), 8)
        # the generator rounds max_frames up to a multiple of F and to the
        # minimum window — mirror that here so the full pass matches
        max_frames = max(_roundup(96, F), F + 2 * (rv + rd))

        chunks = list(
            stream_synthesize(
                g_vars, plm_params, adm_params, hifi_params,
                TINY_G, TINY_PLM, TINY_ADM, TINY_HIFI,
                phones, lens, mels, max_frames=max_frames, chunk_frames=F,
                dtype=jnp.float32,
            )
        )
        assert len(chunks) >= 2  # actually streamed
        streamed = np.concatenate(chunks)

        wav_full, _, n_frames = synthesize(
            g_vars, plm_params, adm_params, hifi_params,
            TINY_G, TINY_PLM, TINY_ADM, TINY_HIFI,
            jnp.asarray(phones), jnp.asarray(lens), jnp.asarray(mels),
            max_frames=max_frames, dtype=jnp.float32,
        )
        total = int(np.asarray(n_frames)[0]) * 256
        assert streamed.shape[0] == total
        np.testing.assert_allclose(
            streamed, np.asarray(wav_full)[0, :total], rtol=1e-4, atol=1e-4
        )

    def test_stream_quant_runs(self):
        g_vars, plm_params, adm_params, hifi_params = _cascade_vars()
        from megatts2_tpu.quantization.weight_only import quantize_tree

        rng = np.random.RandomState(1)
        phones = rng.randint(1, 40, (1, 4)).astype(np.int32)
        chunks = list(
            stream_synthesize(
                g_vars, quantize_tree(plm_params), adm_params, hifi_params,
                TINY_G, TINY_PLM, TINY_ADM, TINY_HIFI,
                phones, np.full((1,), 4, np.int32),
                rng.randn(1, 64, 80).astype(np.float32),
                max_frames=64, chunk_frames=32, dtype=jnp.float32, quant=True,
            )
        )
        assert chunks and all(np.isfinite(c).all() for c in chunks)
