"""megatts2_tpu — a TPU-native (JAX/Flax/Pallas/pjit) Mega-TTS 2 framework.

A from-scratch re-design of the capabilities of LSimon95/megatts2
(zero-shot TTS with arbitrary-length speech prompts, arXiv:2307.07218):

* ``models.MegaG``    — VQ-GAN mel autoencoder (MRTE + VQPE + ConvNet decoder)
* ``models.MegaPLM``  — prosody-code language model with KV-cached scan decode
* ``models.MegaADM``  — autoregressive duration model with KV-cached scan decode
* ``models.HiFiGAN``  — vocoder generator (flax)
* ``models.Megatts``  — end-to-end zero-shot synthesis pipeline
* ``ops``             — fused Pallas/XLA kernels (STFT+mel, length regulator, VQ)
* ``training``        — GAN / PLM / ADM train steps, optax schedules, orbax ckpts
* ``parallel``        — device-mesh / sharding helpers (dp x model over ICI)
* ``data`` / ``text`` — lhotse-free data pipeline and CN/EN text front-end

The architecture is TPU-first: static shapes, lax.scan decoding, GSPMD
sharding, bf16 matmuls on the MXU; it is not a port of the reference's
PyTorch code.
"""

import os

__version__ = "0.1.0"

HIFIGAN_SR = 16000
HIFIGAN_HOP_LENGTH = 256
HIFIGAN_WIN_LENGTH = 1024
HIFIGAN_MEL_CHANNELS = 80
HIFIGAN_NFFT = 1024
HIFIGAN_MAX_FREQ = 8000


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (big win on this target:
    full-size synthesis graphs take minutes to compile remotely)."""
    import jax

    # CPU AOT cache entries are machine-feature-sensitive (observed
    # cross-run feature-detection flakiness → SIGILL risk); only cache for
    # accelerator backends, where compiles cost minutes.
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    if backend == "cpu":
        return
    cache_dir = path or os.environ.get(
        "MEGATTS2_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/megatts2_tpu_xla")
    )
    cache_dir = os.path.join(cache_dir, backend)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
