"""End-to-end zero-shot synthesis test with tiny random-weight models on
CPU: exercises orbax checkpoint round-trip via from_pretrained loaders, the
tokenizer→symbol-table path, the full jitted cascade, and wav output
(reference ``infer.py`` flow, SURVEY.md §3.2)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GAN_YAML = """
trainer: {{max_steps: 10, val_check_interval: 5}}
model:
  G:
    mrte:
      mel_bins: 80
      mel_stride: 16
      mel_n_layer: 1
      mel_n_stack: 1
      mel_n_block: 1
      content_ff_dim: 32
      content_n_heads: 2
      content_n_layers: 1
      hidden_size: 16
      phone_vocab_size: 40
      dropout: 0.0
    vqpe:
      {{mel_bins: 20, stride: 8, hidden_size: 16, kernel_size: 3, n_layers: 1,
       n_stacks: 1, n_blocks: 1, vq_bins: 32, vq_dim: 8}}
    kernel_size: 3
    hidden_size: 16
    decoder_n_stack: 1
    decoder_n_block: 1
  D: {{time_lengths: [8, 16], freq_length: 80, hidden_size: 8}}
  initial_learning_rate: 1.0e-4
  warmup_steps: 1
  train_dtype: float32
data: {{ds_path: {ds}/}}
"""

PLM_YAML = """
trainer: {max_steps: 10}
model:
  plm: {n_layers: 1, n_heads: 2, vq_dim: 8, tc_latent_dim: 16, vq_bins: 32, dropout: 0.0}
  initial_learning_rate: 1.0e-4
  warmup_steps: 1
  train_dtype: float32
"""

ADM_YAML = """
trainer: {max_steps: 10}
model:
  adm: {n_layers: 1, n_heads: 2, emb_dim: 8, tc_latent_dim: 16, tc_emb_dim: 8, dropout: 0.0}
  initial_learning_rate: 1.0e-4
  warmup_steps: 1
  train_dtype: float32
"""


@pytest.fixture(scope="module")
def e2e_setup(tmp_path_factory):
    from megatts2_tpu.config import (
        DiscriminatorConfig,
        load_adm_config,
        load_gan_config,
        load_plm_config,
    )
    from megatts2_tpu.training import (
        create_adm_state,
        create_gan_state,
        create_plm_state,
    )
    from megatts2_tpu.training.checkpoints import save_checkpoint
    from megatts2_tpu.utils.audio import save_wav

    root = tmp_path_factory.mktemp("e2e")
    # configs
    paths = {}
    for name, text in (
        ("gan", GAN_YAML.format(ds=root)),
        ("plm", PLM_YAML),
        ("adm", ADM_YAML),
    ):
        p = str(root / f"{name}.yaml")
        open(p, "w").write(text)
        paths[name] = p

    g_cfg, d_cfg, g_tcfg = load_gan_config(paths["gan"])
    plm_cfg, plm_tcfg = load_plm_config(paths["plm"])
    adm_cfg, adm_tcfg = load_adm_config(paths["adm"])

    rng = np.random.RandomState(0)
    gan_batch = {
        "duration_tokens": rng.randint(1, 8, (2, 6)).astype(np.int32),
        "phone_tokens": rng.randint(0, 40, (2, 6)).astype(np.int32),
        "tokens_lens": np.full((2,), 6, np.int32),
        "mel_timbres": rng.randn(2, 48, 80).astype(np.float32),
        "mel_targets": rng.randn(2, 64, 80).astype(np.float32),
    }
    g_state, _, _ = create_gan_state(jax.random.PRNGKey(0), g_cfg, d_cfg, g_tcfg, gan_batch)
    save_checkpoint(str(root / "ck_gan"), g_state, 1)

    plm_batch = {
        "tc_latents": rng.randn(1, 4, 16).astype(np.float32),
        "p_codes": rng.randint(0, 32, (1, 5)).astype(np.int32),
        "lens": np.full((1,), 4, np.int32),
    }
    plm_state, _ = create_plm_state(jax.random.PRNGKey(1), plm_cfg, plm_tcfg, plm_batch)
    save_checkpoint(str(root / "ck_plm"), plm_state, 1)

    adm_batch = {
        "tc_latents": rng.randn(1, 4, 16).astype(np.float32),
        "duration_tokens": rng.rand(1, 5, 1).astype(np.float32),
        "lens": np.full((1,), 4, np.int32),
    }
    adm_state, _ = create_adm_state(jax.random.PRNGKey(2), adm_cfg, adm_tcfg, adm_batch)
    save_checkpoint(str(root / "ck_adm"), adm_state, 1)

    # symbol table + prompt wavs
    sym = str(root / "symbols")
    with open(sym, "w") as f:
        for i, s in enumerate(["<eps>", "_", "-", "hello", "world"]):
            f.write(f"{s} {i}\n")
    wavs = root / "wavs"
    wavs.mkdir()
    t = np.arange(8000) / 16000.0
    save_wav(str(wavs / "p.wav"), (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32))

    return dict(root=root, paths=paths, sym=sym, wavs=str(wavs))


class TestMegattsE2E:
    def test_from_pretrained_and_synthesize(self, e2e_setup):
        from megatts2_tpu.models import megatts_from_pretrained

        s = e2e_setup
        tts = megatts_from_pretrained(
            g_ckpt=str(s["root"] / "ck_gan"),
            g_config=s["paths"]["gan"],
            plm_ckpt=str(s["root"] / "ck_plm"),
            plm_config=s["paths"]["plm"],
            adm_ckpt=str(s["root"] / "ck_adm"),
            adm_config=s["paths"]["adm"],
            symbol_table=s["sym"],
            max_frames=128,
            dtype=jnp.float32,
        )
        # checkpoint-loaded trees must be COMMITTED jax arrays, not numpy:
        # numpy leaves as jit args re-transfer the full tree every call
        # (and leak the axon plugin's staging buffers — OOM at 10k-utt
        # scale before this was enforced in Megatts.__init__)
        for tree in (tts.g_vars, tts.plm_params, tts.adm_params, tts.hifi_params):
            for leaf in jax.tree_util.tree_leaves(tree):
                assert isinstance(leaf, jax.Array), type(leaf)
        out_path = str(s["root"] / "out.wav")
        wav = tts(s["wavs"], "hello world", out_path=out_path)
        assert os.path.exists(out_path)
        assert wav.ndim == 1 and wav.shape[0] > 8000  # prompt + generated
        assert np.isfinite(wav).all()
        gen = wav[8000:]
        assert gen.shape[0] % 256 == 0 and gen.shape[0] > 0

    def test_quant_int8_synthesize(self, e2e_setup):
        """quant_int8=True runs the full cascade on int8 PLM/ADM weights
        and produces audio close to the full-precision path (tiny models,
        identical greedy decisions expected at this scale)."""
        from megatts2_tpu.models import megatts_from_pretrained

        s = e2e_setup
        kw = dict(
            g_ckpt=str(s["root"] / "ck_gan"),
            g_config=s["paths"]["gan"],
            plm_ckpt=str(s["root"] / "ck_plm"),
            plm_config=s["paths"]["plm"],
            adm_ckpt=str(s["root"] / "ck_adm"),
            adm_config=s["paths"]["adm"],
            symbol_table=s["sym"],
            max_frames=128,
            dtype=jnp.float32,
        )
        out_q = str(s["root"] / "out_q.wav")
        wav_q = megatts_from_pretrained(quant_int8=True, **kw)(
            s["wavs"], "hello world", out_path=out_q
        )
        assert os.path.exists(out_q)
        assert np.isfinite(wav_q).all() and wav_q.shape[0] > 8000

    def test_serve_bucketed_and_continuous(self, e2e_setup):
        """serve.py end-to-end in both modes: bucketed batches and the
        continuous-batching engine produce a wav per request."""
        from megatts2_tpu.serve import main as serve_main

        s = e2e_setup
        reqs = str(s["root"] / "reqs.jsonl")
        with open(reqs, "w") as f:
            for i, text in enumerate(["hello world", "world hello", "hello"]):
                f.write(
                    '{"id": "u%d", "text": "%s", "wavs_dir": "%s"}\n'
                    % (i, text, s["wavs"])
                )
        common = [
            "--requests", reqs,
            "--g_ckpt", str(s["root"] / "ck_gan"), "--g_config", s["paths"]["gan"],
            "--plm_ckpt", str(s["root"] / "ck_plm"), "--plm_config", s["paths"]["plm"],
            "--adm_ckpt", str(s["root"] / "ck_adm"), "--adm_config", s["paths"]["adm"],
            "--symbol_table", s["sym"], "--max_frames", "128",
            "--buckets", "64,128", "--batch_size", "8",  # divisible by the
            # 8-device virtual mesh's data axis
        ]
        out_b = str(s["root"] / "served_bucketed")
        serve_main(common + ["--out_dir", out_b])
        out_c = str(s["root"] / "served_continuous")
        serve_main(common + [
            "--out_dir", out_c, "--continuous", "--slots", "2",
            "--chunk_frames", "32",
        ])
        for out in (out_b, out_c):
            for i in range(3):
                assert os.path.exists(os.path.join(out, f"u{i}.wav")), (out, i)

    def test_unknown_token_raises_keyerror(self, e2e_setup):
        from megatts2_tpu.models import megatts_from_pretrained

        s = e2e_setup
        tts = megatts_from_pretrained(
            g_ckpt=str(s["root"] / "ck_gan"),
            g_config=s["paths"]["gan"],
            plm_ckpt=str(s["root"] / "ck_plm"),
            plm_config=s["paths"]["plm"],
            adm_ckpt=str(s["root"] / "ck_adm"),
            adm_config=s["paths"]["adm"],
            symbol_table=s["sym"],
            max_frames=64,
            dtype=jnp.float32,
        )
        with pytest.raises(KeyError):
            tts.phone_ids("completely unknown words")
